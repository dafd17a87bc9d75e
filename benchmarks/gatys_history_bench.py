"""L-BFGS history-size sweep: quality vs throughput for Gatys serving.

The torch contract pins ``history_size=100`` (torch LBFGS default; the
reference never overrides it, network.py:403-409). Per docs/performance.md
the per-lane [H, n] history HBM traffic is why batched contract-Gatys
throughput stays flat as lanes are added. Serving need not keep the
contract — ``gatys_st --history-size`` (clis/gatys_st.py) trades history
length for throughput. This bench measures, at 256px:

- closure-evals/s for H in {4, 8, 16, 100} at batch 1 and batch 8
  (the mixed-style serving lane, ``_run_serve_batched``),
- quality: final loss after the serving-scale 50 contract steps, and the
  mean |Δ| vs the H=100 output in 8-bit pixel units,
- FEATURE-SPACE deltas vs the H=100 output (round 5): relative Gram
  (style-space) and content-tap distances under the seeded VGG — valid
  perceptual coordinates today, unlike raw pixels — each scaled against
  two anchors: (a) the stylization scale (H=100 output vs the content
  image: how far features move when an image is genuinely restyled) and
  (b) the CHAOS FLOOR (H=100 vs H=100 restarted from a 1e-6-perturbed
  input: how far the optimizer's own trajectory sensitivity moves them),

so the daemon default can be a measured decision, not a guess.

Run: python benchmarks/gatys_history_bench.py  (env: HIST_STEPS, HIST_BATCHES)
"""

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from styletransfer_tpu.engines import gatys
from styletransfer_tpu.models import vgg
from styletransfer_tpu.utils import demo, images

STEPS = int(os.environ.get("HIST_STEPS", "50"))  # serving-scale request
HS = (4, 8, 16, 100)
EVALS_PER_STEP = 20  # torch contract: max_iter=20 inner iterations/step


def _force(x) -> float:
    return float(jnp.sum(x))  # axon ignores block_until_ready


def _single(vgg_params, content, grams, h):
    return gatys._run_optimizer(
        "lbfgs", vgg_params, content, grams, STEPS, 1e5, 1.0, 0.05,
        history_size=h,
    )


def _batched(vgg_params, contents, grams_b, h):
    return gatys._run_serve_batched(
        vgg_params, contents, grams_b, STEPS, 1e5, 1.0, 0.05, "lbfgs",
        history_size=h,
    )


def main():
    assets = demo.ensure_demo_assets()
    vgg_params = vgg.load_params()
    style = jnp.asarray(images.load_image(assets["style"]))
    content = jnp.asarray(images.load_image(assets["content"]))
    grams = jax.jit(vgg.style_gram_targets)(vgg_params, style)

    batches = [int(b) for b in os.environ.get("HIST_BATCHES", "1,8").split(",")]
    rows = []
    ref_px = {}
    for h in HS:
        row = {"H": h}
        out, losses = _single(vgg_params, content, grams, h)  # compile+warm
        _force(out)
        for b in batches:
            if b == 1:
                t0 = time.time()
                out, losses = _single(vgg_params, content, grams, h)
                _force(out)
                dt = time.time() - t0
                px = images.to_uint8(np.asarray(out)).astype(np.float32)
                ref_px.setdefault("single", {})[h] = px
                ref_px.setdefault("float", {})[h] = np.asarray(out)
                row["final_loss"] = round(float(np.asarray(losses)[-1]), 4)
            else:
                contents = jnp.concatenate([content] * b)
                grams_b = jax.tree.map(lambda g: jnp.stack([g] * b), grams)
                outb, lb = _batched(vgg_params, contents, grams_b, h)  # compile
                _force(outb)
                t0 = time.time()
                outb, lb = _batched(vgg_params, contents, grams_b, h)
                _force(outb)
                dt = time.time() - t0
            total_evals = STEPS * EVALS_PER_STEP * b
            row[f"evals_per_s_b{b}"] = round(total_evals / dt, 1)
            row[f"req_s_b{b}"] = round(dt / b, 2)
        rows.append(row)

    # Quality deltas vs the H=100 single-lane output.
    base = ref_px["single"][100]
    for row in rows:
        d = np.abs(ref_px["single"][row["H"]] - base).mean()
        row["px_delta_vs_H100"] = round(float(d), 3)

    # ---- Feature-space deltas (round 5): are the different-H minima
    # PERCEPTUALLY different, or only trajectory-noise apart? Pixels can't
    # answer that (L-BFGS is chaotic; see PARITY.md "Gatys full-run
    # divergence") — the VGG feature coordinates the loss actually
    # optimizes can. Two anchors calibrate the scale:
    #   stylize_scale: H=100 output vs the content image (what a REAL
    #     perceptual change measures);
    #   chaos_floor: H=100 vs H=100 restarted from a 1e-6-perturbed
    #     content (what pure trajectory sensitivity measures).
    def style_vec(x):
        g = vgg.style_gram_targets(vgg_params, jnp.asarray(x))
        return np.concatenate([np.asarray(v).ravel() for v in
                               (g[k] for k in sorted(g))])

    def content_vec(x):
        f = vgg.extract_features(vgg_params, jnp.asarray(x),
                                 vgg.CONTENT_LAYERS)
        return np.asarray(f[vgg.CONTENT_LAYERS[0]]).ravel()

    def rel(a, b):
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))

    outs = ref_px["float"]
    base_s, base_c = style_vec(outs[100]), content_vec(outs[100])
    content_np = np.asarray(content)
    out_pert, _ = _single(vgg_params, jnp.asarray(content_np + 1e-6),
                          grams, 100)
    anchors = {
        "stylize_scale_style": rel(style_vec(content_np), base_s),
        "stylize_scale_content": rel(content_vec(content_np), base_c),
        "chaos_floor_style": rel(style_vec(np.asarray(out_pert)), base_s),
        "chaos_floor_content": rel(content_vec(np.asarray(out_pert)), base_c),
        "chaos_floor_px": round(float(np.abs(
            images.to_uint8(np.asarray(out_pert)).astype(np.float32)
            - base).mean()), 3),
    }
    for row in rows:
        row["gram_rel_delta_vs_H100"] = round(
            rel(style_vec(outs[row["H"]]), base_s), 4)
        row["content_rel_delta_vs_H100"] = round(
            rel(content_vec(outs[row["H"]]), base_c), 4)

    print(json.dumps({"steps": STEPS, "rows": rows,
                      "feature_anchors": anchors}, indent=2))
    print("\n| H | evals/s b1 | evals/s b8 | s/request b8 | final loss "
          "| px |Δ| vs H=100 | gram relΔ | content relΔ |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['H']} | {r.get('evals_per_s_b1', '-')} "
              f"| {r.get('evals_per_s_b8', '-')} | {r.get('req_s_b8', '-')} "
              f"| {r.get('final_loss', '-')} | {r['px_delta_vs_H100']} "
              f"| {r['gram_rel_delta_vs_H100']} "
              f"| {r['content_rel_delta_vs_H100']} |")
    print(f"anchors: {json.dumps(anchors)}")


if __name__ == "__main__":
    main()
