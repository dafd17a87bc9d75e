"""Map profiled HLO instruction names to model source locations.

Compiles the fast_st train step, dumps optimized HLO, and for each
instruction name given on stdin/argv prints the fusion's root op and the
``op_name`` metadata (JAX source annotation) of its heaviest instructions.
Companion to benchmarks/train_profile.py.

Run: python -m benchmarks.hlo_annotate fusion.36 fusion.752 ...
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from styletransfer_tpu.engines import fast
    from styletransfer_tpu.models import transformer, vgg

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    cd = jnp.bfloat16 if precision == "bf16" else None
    rng = np.random.default_rng(0)

    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jnp.asarray(rng.standard_normal((1, 256, 256, 3)), dtype=jnp.float32)
    grams = vgg.style_gram_targets(vgg_params, style)
    opt, step = fast.make_train_step(vgg_params, grams, compute_dtype=cd)
    params = transformer.init_params(jax.random.PRNGKey(1))
    opt_state = opt.init(params)
    x = jnp.zeros((batch, 256, 256, 3), jnp.float32)

    lowered = jax.jit(step._fun if hasattr(step, "_fun") else step).lower(
        params, opt_state, x
    )
    hlo = lowered.compile().as_text()

    names = sys.argv[1:]
    # Parse computations: map "fused_computation.N" -> list of (op line).
    comps = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"\s*%?([\w.-]+)\s*\([^)]*\)\s*->", line)
        if line.strip().startswith(("ENTRY", "%fused_computation", "fused_computation")) or (
            m and "{" in line
        ):
            if m:
                cur = m.group(1)
                comps[cur] = []
            continue
        if cur is not None and line.strip().startswith("}"):
            cur = None
            continue
        if cur is not None:
            comps[cur].append(line.rstrip())

    # Entry instructions: find "%fusion.36 = ... calls=%fused_computation.N ... metadata={...}"
    entry = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(.*)", line)
        if not m:
            continue
        entry[m.group(1)] = m.group(2)

    for name in names:
        line = entry.get(name)
        print(f"=== {name} ===")
        if line is None:
            print("  (not found in entry computation)")
            continue
        mcall = re.search(r"calls=%?([\w.-]+)", line)
        mmeta = re.search(r'op_name="([^"]+)"', line)
        shape = line.split(" ", 1)[0]
        print(f"  shape: {shape}")
        if mmeta:
            print(f"  op_name: {mmeta.group(1)}")
        if mcall and mcall.group(1) in comps:
            body = comps[mcall.group(1)]
            # Print ops with interesting opcodes + their op_name metadata.
            interesting = []
            for bl in body:
                mop = re.search(r"=\s*[\w\[\],{}<>:\s]*?\b(convolution|dot|reduce|transpose|copy|reduce-window|select-and-scatter|concatenate|pad|reverse|convert|broadcast|iota|dynamic-slice)\b", bl)
                mm = re.search(r'op_name="([^"]+)"', bl)
                if mop and (mop.group(1) not in ("convert", "broadcast", "iota") or mm):
                    interesting.append((mop.group(1), mm.group(1) if mm else ""))
            seen = set()
            for opc, meta in interesting:
                key = (opc, meta)
                if key in seen:
                    continue
                seen.add(key)
                print(f"    {opc:18s} {meta}")
        else:
            mmeta2 = re.search(r'op_name="([^"]+)"', line)
            if not mmeta and not mmeta2:
                print(f"  raw: {line[:200]}")


if __name__ == "__main__":
    main()
