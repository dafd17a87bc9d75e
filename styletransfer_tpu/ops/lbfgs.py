"""torch-contract L-BFGS as one jitted JAX program.

The reference's Gatys trainer runs ``torch.optim.LBFGS`` with every default
(network.py:403-409, 435): ``lr=1``, ``max_iter=20``, ``history_size=100``,
``tolerance_grad=1e-7``, ``tolerance_change=1e-9`` and **no line search** —
so each CLI "step" (one ``optimizer.step(closure)``) is up to 20 fixed-step
L-BFGS inner iterations whose memory/state persists across steps. The CLI
default ``-s 300`` therefore performs up to ~6,000 closure evaluations, not
300.

This module replicates those exact semantics (torch/optim/lbfgs.py's
``line_search_fn is None`` path) as a pure-JAX nested ``lax.scan``:

- outer scan = the reference's ``for step in range(steps)`` loop,
- inner scan = the ``while n_iter < max_iter`` loop, with every
  data-dependent ``break`` (directional-derivative / gradient-norm /
  step-size / loss-change tolerances) folded into a carried ``broke`` mask,
- the two-loop recursion over the history runs against fixed-size [H, N]
  ring buffers with an insert counter, scanned with validity masks, so the
  whole optimization is a single compiled program with static shapes —
  no data-dependent Python control flow ever reaches the host.

Exactness notes (vs torch, both sides float32):
- torch re-evaluates the closure at the top of every ``.step`` even though
  ``x`` is unchanged since the previous step's last evaluation; we carry
  ``(loss, grad)`` instead, which is bitwise-equivalent for a deterministic
  closure and saves one eval per outer step.
- when an inner iteration takes a step at ``n_iter == max_iter`` torch
  defers the re-evaluation to the next ``.step``'s initial closure call; we
  evaluate immediately — the same evaluation, one iteration earlier.
- ``max_eval`` (default ``max_iter * 5 / 4 = 25``) can never bind on the
  no-line-search path (at most ``1 + max_iter = 21`` evals per step), so it
  is validated but not simulated.
- torch compares ``abs(loss - prev_loss)`` in float64 on host-pulled floats;
  we compare in float32. Both operate on f32-valued losses, so they can
  disagree only when the change sits within one ulp of ``tolerance_change``.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # History dots are [N]-vector reductions; keep highest precision so the
    # two-loop recursion matches torch-CPU f32 accumulation closely.
    return jnp.vdot(a, b, precision=lax.Precision.HIGHEST)


def _mv(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Matrix-vector product at full f32 precision (compact-form math)."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def _two_loop_direction(c, grad, y, s, ys, insert, first, H_diag1, H):
    """torch's literal algorithm (lbfgs.py:396-435): ring buffers + the
    sequential two-loop recursion (200 small dependent dots at H=100)."""
    pos = c["k"] % H
    S = c["S"].at[pos].set(jnp.where(insert, s, c["S"][pos]))
    Y = c["Y"].at[pos].set(jnp.where(insert, y, c["Y"][pos]))
    rho = c["rho"].at[pos].set(
        jnp.where(insert, 1.0 / jnp.where(insert, ys, 1.0), c["rho"][pos])
    )
    k1 = c["k"] + insert.astype(jnp.int32)
    num_old = jnp.minimum(k1, H)

    # Buffer slot of list entry j (oldest-first, j in [0, num_old)):
    # (k1 - num_old + j) % H. Backward pass walks newest -> oldest.
    def bwd(q, tt):
        valid = tt < num_old
        idx = jnp.mod(k1 - 1 - tt, H)
        al_t = jnp.where(valid, rho[idx] * _dot(S[idx], q), 0.0)
        return q - al_t * Y[idx], al_t

    q, al_rev = lax.scan(bwd, -grad, jnp.arange(H))

    def fwd(r, jj):
        valid = jj < num_old
        idx = jnp.mod(k1 - num_old + jj, H)
        be = rho[idx] * _dot(Y[idx], r)
        al_j = al_rev[jnp.mod(num_old - 1 - jj, H)]
        return r + jnp.where(valid, al_j - be, 0.0) * S[idx], None

    d1, _ = lax.scan(fwd, q * H_diag1, jnp.arange(H))
    return d1, dict(S=S, Y=Y, rho=rho, k=k1)


def _compact_solve(S, Y, SY, YY, valid, grad, H_diag1, k1):
    """The shared Byrd–Nocedal compact-form solve: given the (masked)
    history matrices and the valid-slot mask, produce the search
    direction. One implementation for BOTH history placements
    (:func:`_compact_direction` dynamic-slot, :func:`_compact_shift_direction`
    rolled static-slot) so a numerics tweak to the triangular solves can
    never make the vmap and single-problem paths diverge."""
    from jax.scipy.linalg import solve_triangular

    vmask2 = valid[:, None] & valid[None, :]
    R = jnp.where(vmask2, jnp.triu(SY), 0.0) + jnp.diag(
        jnp.where(valid, 0.0, 1.0)
    )
    D = jnp.where(valid, jnp.diagonal(SY), 0.0)
    g = grad
    p = jnp.where(valid, _mv(S, g), 0.0)
    q = jnp.where(valid, _mv(Y, g), 0.0)
    u = solve_triangular(R, p, lower=False)
    v = D * u + H_diag1 * _mv(YY, u) - H_diag1 * q
    w = solve_triangular(R.T, v, lower=True)
    Hg = H_diag1 * g + _mv(S.T, w) - H_diag1 * _mv(Y.T, u)
    return -Hg, dict(S=S, Y=Y, SY=SY, YY=YY, k=k1)


def _compact_direction(c, grad, y, s, ys, insert, first, H_diag1, H):
    """Byrd-Nocedal compact inverse-Hessian (Nocedal & Wright, Thm 7.4):

        H = gI + [S' gY'] [[R^-T (D + g Y'Y) R^-1, -R^-T], [-R^-1, 0]] [S'; gY']

    with S'/Y' the [n, m] matrices of stored s/y columns (here kept as
    [H, n] rows, OLDEST FIRST via shift-on-insert), R = triu(S'ᵀY'),
    D = diag(R), g = H_diag. Algebraically identical to the two-loop but
    computed with two [H, n] matvecs + two [H, H] triangular solves + two
    [n, H] combines — MXU-shaped work instead of 2H sequential dots, which
    measures ~2x faster end-to-end on TPU (docs/performance.md). Numerics
    differ from torch only by f32 reassociation.

    Incrementally maintained across inserts: SY = SᵀY (only its upper
    triangle + diagonal are consumed) and YY = YᵀY, each updated by one
    matvec column write; a full insert shifts everything up by one
    (wrapped garbage lands only in masked/below-diagonal positions).
    """
    full = c["k"] >= H

    def shifted(args):
        S, Y, SY, YY = args
        return (
            jnp.roll(S, -1, axis=0), jnp.roll(Y, -1, axis=0),
            jnp.roll(jnp.roll(SY, -1, axis=0), -1, axis=1),
            jnp.roll(jnp.roll(YY, -1, axis=0), -1, axis=1),
        )

    S, Y, SY, YY = lax.cond(
        insert & full, shifted, lambda a: a,
        (c["S"], c["Y"], c["SY"], c["YY"]),
    )
    pos = jnp.minimum(c["k"], H - 1)
    S = S.at[pos].set(jnp.where(insert, s, S[pos]))
    Y = Y.at[pos].set(jnp.where(insert, y, Y[pos]))
    sy_col = _mv(S, y)  # s_i . y_new for all i (incl. the new diag = ys)
    yy_col = _mv(Y, y)
    SY = SY.at[:, pos].set(jnp.where(insert, sy_col, SY[:, pos]))
    YY = YY.at[:, pos].set(jnp.where(insert, yy_col, YY[:, pos]))
    YY = YY.at[pos, :].set(jnp.where(insert, yy_col, YY[pos, :]))
    k1 = c["k"] + insert.astype(jnp.int32)
    num_old = jnp.minimum(k1, H)

    idx = jnp.arange(H)
    valid = idx < num_old
    return _compact_solve(S, Y, SY, YY, valid, grad, H_diag1, k1)


def _compact_shift_direction(c, grad, y, s, ys, insert, first, H_diag1, H):
    """Identical math to :func:`_compact_direction`, with **static indices
    only**: the history lives newest-at-``H-1`` and every insert rolls the
    buffers by one (masked select, no ``cond``, no traced write position).

    Rationale: under ``vmap`` (batched Gatys runs one independent optimizer
    per image) the per-lane traced ``pos`` in the dynamic-slot form lowers
    ``.at[pos].set`` / row gathers on ``[N, H, n]`` to scatter/gather —
    measured 4.5x (compact) / 6.1x (two-loop) inner-iteration blowup at
    N=2 vs N=1. This form trades that for two [H, n] roll-copies per
    insert, which vectorize perfectly across lanes; the engine selects it
    automatically for batched runs (docs/performance.md). Valid slots are
    the LAST ``num_old`` (oldest first), so ``triu`` keeps the same
    older-pair structure and the solves are unchanged.
    """
    ins = insert  # scalar bool per lane (vmap) / per problem
    S = jnp.where(ins, jnp.roll(c["S"], -1, axis=0).at[H - 1].set(s), c["S"])
    Y = jnp.where(ins, jnp.roll(c["Y"], -1, axis=0).at[H - 1].set(y), c["Y"])
    sy_col = _mv(S, y)  # s_i . y_new for all i (incl. the new diag = ys)
    yy_col = _mv(Y, y)
    SY2 = jnp.roll(jnp.roll(c["SY"], -1, axis=0), -1, axis=1)
    YY2 = jnp.roll(jnp.roll(c["YY"], -1, axis=0), -1, axis=1)
    SY = jnp.where(ins, SY2.at[:, H - 1].set(sy_col), c["SY"])
    YY = jnp.where(
        ins, YY2.at[:, H - 1].set(yy_col).at[H - 1, :].set(yy_col), c["YY"]
    )
    k1 = c["k"] + ins.astype(jnp.int32)
    num_old = jnp.minimum(k1, H)

    idx = jnp.arange(H)
    valid = idx >= H - num_old
    return _compact_solve(S, Y, SY, YY, valid, grad, H_diag1, k1)


_DIRECTION = {
    "two_loop": _two_loop_direction,
    "compact": _compact_direction,
    "compact_shift": _compact_shift_direction,
}


@functools.partial(
    jax.jit,
    static_argnames=(
        "loss_and_grad_fn", "steps", "lr", "max_iter", "tolerance_grad",
        "tolerance_change", "history_size", "history_math", "branchless",
    ),
)
def lbfgs_torch(
    loss_and_grad_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    x0: jnp.ndarray,
    steps: int,
    lr: float = 1.0,
    max_iter: int = 20,
    tolerance_grad: float = 1e-7,
    tolerance_change: float = 1e-9,
    history_size: int = 100,
    history_math: str = "two_loop",
    branchless: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``steps`` torch-``LBFGS.step(closure)`` calls on a flat vector.

    ``loss_and_grad_fn(x) -> (loss, grad)`` is the closure;
    ``x0`` is the flat float32 parameter vector. Returns
    ``(x_final, losses)`` where ``losses[i]`` is the loss at entry to outer
    step ``i`` (torch's ``orig_loss`` return value per ``.step`` call).

    ``history_math`` selects how the L-BFGS direction is computed:
    ``"two_loop"`` is torch's literal sequential recursion;
    ``"compact"`` is the algebraically-identical Byrd-Nocedal compact form
    (MXU matvecs + tiny triangular solves — faster on TPU, f32-reassociation
    -level numeric differences only); ``"compact_shift"`` is the same
    compact math with static-index history updates, the right form under
    ``vmap`` (see :func:`_compact_shift_direction`).
    """
    H = history_size
    n = x0.size
    f32 = jnp.float32

    loss0, grad0 = loss_and_grad_fn(x0)

    hist0 = dict(
        S=jnp.zeros((H, n), f32),  # torch old_stps (s = d * t)
        Y=jnp.zeros((H, n), f32),  # torch old_dirs (y = g - g_prev)
        k=jnp.array(0, jnp.int32),  # total history inserts
    )
    if history_math == "two_loop":
        hist0["rho"] = jnp.zeros((H,), f32)
    elif history_math in ("compact", "compact_shift"):
        hist0["SY"] = jnp.zeros((H, H), f32)
        hist0["YY"] = jnp.zeros((H, H), f32)
    else:
        raise ValueError(f"unknown history_math {history_math!r}")
    direction = _DIRECTION[history_math]

    carry0 = dict(
        x=x0.astype(f32),
        loss=loss0.astype(f32),
        grad=grad0.astype(f32),
        prev_grad=jnp.zeros((n,), f32),
        prev_loss=jnp.array(0.0, f32),
        t=jnp.array(0.0, f32),
        d=jnp.zeros((n,), f32),
        H_diag=jnp.array(1.0, f32),
        n_glob=jnp.array(0, jnp.int32),  # torch state["n_iter"]
        **hist0,
    )
    hist_keys = tuple(hist0)

    def inner(c, _i_unused):
        active = jnp.logical_not(c["broke"])
        n_glob1 = jnp.where(active, c["n_glob"] + 1, c["n_glob"])
        first = n_glob1 == 1  # torch: d = -g, empty history, H_diag = 1

        # --- history update (lbfgs.py:396-414) ---
        y = c["grad"] - c["prev_grad"]
        s = c["d"] * c["t"]
        ys = _dot(y, s)
        insert = active & jnp.logical_not(first) & (ys > 1e-10)
        yy = _dot(y, y)
        H_diag1 = jnp.where(
            first,
            1.0,
            jnp.where(insert, ys / jnp.where(insert, yy, 1.0), c["H_diag"]),
        )

        d1, hist1 = direction(c, c["grad"], y, s, ys, insert, first, H_diag1, H)

        prev_grad1 = c["grad"]
        prev_loss1 = c["loss"]

        # --- step length (lbfgs.py:447-450) ---
        t1 = jnp.where(
            first,
            jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(c["grad"]))) * lr,
            jnp.asarray(lr, f32),
        )

        gtd = _dot(c["grad"], d1)
        break_gtd = gtd > -tolerance_change  # lbfgs.py:456-457 (no step taken)
        step_taken = active & jnp.logical_not(break_gtd)

        x1 = c["x"] + jnp.where(step_taken, t1, 0.0) * d1

        # Re-evaluate at the new point. torch skips this at
        # n_iter == max_iter and lets the next .step's initial closure do
        # it — identical values either way (see module docstring).
        # ``branchless`` evaluates unconditionally and selects — identical
        # values, but the right form under vmap, where a batched-predicate
        # cond degrades the whole scan body (measured 2.2x on the closure
        # eval at N=2; docs/performance.md). The cond form is kept for the
        # single-problem case, where a real branch skips post-break evals.
        if branchless:
            el, eg = loss_and_grad_fn(x1)
            loss1 = jnp.where(step_taken, el, c["loss"])
            grad1 = jnp.where(step_taken, eg, c["grad"])
        else:
            loss1, grad1 = lax.cond(
                step_taken,
                lambda xx: loss_and_grad_fn(xx),
                lambda xx: (c["loss"], c["grad"]),
                x1,
            )
        loss1 = loss1.astype(f32)

        # --- remaining break conditions (lbfgs.py:510-519) ---
        opt_cond = jnp.max(jnp.abs(grad1)) <= tolerance_grad
        small_step = jnp.max(jnp.abs(d1 * t1)) <= tolerance_change
        small_change = jnp.abs(loss1 - prev_loss1) < tolerance_change
        broke1 = c["broke"] | break_gtd | (
            step_taken & (opt_cond | small_step | small_change)
        )

        new = dict(
            x=jnp.where(step_taken, x1, c["x"]),
            loss=jnp.where(step_taken, loss1, c["loss"]),
            grad=jnp.where(step_taken, grad1, c["grad"]),
            prev_grad=jnp.where(active, prev_grad1, c["prev_grad"]),
            prev_loss=jnp.where(active, prev_loss1, c["prev_loss"]),
            t=jnp.where(active, t1, c["t"]),
            d=jnp.where(active, d1, c["d"]),
            H_diag=jnp.where(active, H_diag1, c["H_diag"]),
            n_glob=n_glob1,
            broke=broke1,
            **{k: hist1[k] for k in hist_keys},
        )
        return new, None

    def outer(c, _):
        orig_loss = c["loss"]
        # Entry optimality check (lbfgs.py:363-367): return immediately.
        c = dict(c, broke=jnp.max(jnp.abs(c["grad"])) <= tolerance_grad)
        c, _ = lax.scan(inner, c, None, length=max_iter)
        c.pop("broke")
        return c, orig_loss

    carry, losses = lax.scan(outer, carry0, None, length=steps)
    return carry["x"], losses
