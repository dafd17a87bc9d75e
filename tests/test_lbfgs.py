"""torch-contract L-BFGS (ops/lbfgs.py) against torch.optim.LBFGS itself.

The reference-network trajectory parity lives in test_reference_parity.py;
these tests pin the optimizer semantics in isolation on cheap synthetic
objectives — including the tolerance-break behaviors that only trigger on
converged or degenerate problems.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from styletransfer_tpu.ops.lbfgs import lbfgs_torch

N = 50


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((N, N)).astype(np.float32) * 0.3
    b = rng.standard_normal(N).astype(np.float32)
    x0 = rng.standard_normal(N).astype(np.float32)

    def torch_loss(x):
        z = torch.from_numpy(A) @ x - torch.from_numpy(b)
        return (z**2).sum() + 0.1 * (x**4).sum() + torch.sin(x).sum()

    def jax_loss(x):
        z = jnp.asarray(A) @ x - jnp.asarray(b)
        return (z**2).sum() + 0.1 * (x**4).sum() + jnp.sin(x).sum()

    return torch_loss, jax_loss, x0


def _run_torch(torch_loss, x0, steps, **kwargs):
    xt = torch.tensor(x0.copy(), requires_grad=True)
    opt = torch.optim.LBFGS([xt], **kwargs)
    losses = []
    for _ in range(steps):
        def closure():
            opt.zero_grad()
            loss = torch_loss(xt)
            loss.backward()
            return loss

        losses.append(float(opt.step(closure).detach()))
    return xt.detach().numpy(), losses, opt


@pytest.mark.parametrize("mode", ["two_loop", "compact", "compact_shift"])
def test_trajectory_matches_torch_nonconvex(mode):
    """5 .step(closure) calls on a nonconvex quartic: per-step losses and
    the final point agree with torch's LBFGS (all defaults) — for BOTH
    history-math forms (the compact Byrd-Nocedal form is algebraically
    the same operator as torch's two-loop recursion)."""
    torch_loss, jax_loss, x0 = _problem(0)
    xt, tlosses, _ = _run_torch(torch_loss, x0, steps=5)
    xj, jlosses = lbfgs_torch(
        jax.value_and_grad(jax_loss), jnp.asarray(x0), steps=5,
        history_math=mode,
    )
    np.testing.assert_allclose(np.asarray(jlosses), tlosses, rtol=1e-4)
    # Both converge to the same stationary point; compare achieved loss.
    np.testing.assert_allclose(
        float(jax_loss(xj)), float(torch_loss(torch.from_numpy(xt))), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(xj), xt, atol=1e-3)


def test_inner_iteration_count_matches_torch():
    """One outer step runs exactly torch's n_iter inner iterations: after a
    single .step() on a fresh quadratic, both trajectories agree — which
    can only happen if the inner loop ran the same 20 fixed-step updates."""
    torch_loss, jax_loss, x0 = _problem(1)
    xt, tlosses, opt = _run_torch(torch_loss, x0, steps=1)
    n_iter = int(opt.state[opt._params[0]]["n_iter"])
    xj, jlosses = lbfgs_torch(jax.value_and_grad(jax_loss), jnp.asarray(x0), steps=1)
    assert n_iter > 1  # torch really did multiple inner iterations
    np.testing.assert_allclose(float(jlosses[0]), tlosses[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xj), xt, atol=5e-3)


def test_converged_problem_stops_moving():
    """At a (near-)stationary point the tolerance breaks fire and x stops
    changing — additional outer steps are no-ops, exactly like torch."""
    def jax_loss(x):
        return jnp.sum((x - 3.0) ** 2)

    x0 = jnp.full((8,), 3.0) + 1e-9  # gradient ~2e-9 < tolerance_grad path
    xj, losses = lbfgs_torch(jax.value_and_grad(jax_loss), x0, steps=3)
    np.testing.assert_allclose(np.asarray(xj), np.asarray(x0), atol=1e-7)
    assert float(losses[-1]) == pytest.approx(float(losses[0]))


def test_quadratic_converges_in_one_outer_step():
    """On a well-conditioned quadratic, one outer step (<=20 inner) reaches
    the optimum to f32 precision — matching torch."""
    rng = np.random.default_rng(3)
    Q = rng.standard_normal((N, N)).astype(np.float32)
    Q = Q @ Q.T / N + np.eye(N, dtype=np.float32)
    c = rng.standard_normal(N).astype(np.float32)
    x0 = rng.standard_normal(N).astype(np.float32)

    def jax_loss(x):
        return 0.5 * x @ jnp.asarray(Q) @ x - jnp.asarray(c) @ x

    def torch_loss(x):
        return 0.5 * x @ torch.from_numpy(Q) @ x - torch.from_numpy(c) @ x

    xt, _, _ = _run_torch(torch_loss, x0, steps=1)
    xj, _ = lbfgs_torch(jax.value_and_grad(jax_loss), jnp.asarray(x0), steps=1)
    x_star = np.linalg.solve(Q, c)
    np.testing.assert_allclose(np.asarray(xj), x_star, atol=1e-3)
    np.testing.assert_allclose(np.asarray(xj), xt, atol=1e-3)


def test_branchless_matches_torch_trajectory():
    """``branchless=True`` (unconditional closure eval + select — the vmap
    form) holds the same torch-trajectory parity as the lax.cond form: the
    selection keeps mathematically identical values (removing the cond only
    changes XLA fusion boundaries, i.e. f32 reassociation)."""
    torch_loss, jax_loss, x0 = _problem(5)
    xt, tlosses, _ = _run_torch(torch_loss, x0, steps=5)
    for mode in ("compact", "compact_shift"):
        xb, lb = lbfgs_torch(
            jax.value_and_grad(jax_loss), jnp.asarray(x0), steps=5,
            history_math=mode, branchless=True,
        )
        np.testing.assert_allclose(np.asarray(lb), tlosses, rtol=1e-3)
        np.testing.assert_allclose(
            float(jax_loss(xb)), float(torch_loss(torch.from_numpy(xt))),
            rtol=1e-4,
        )


def test_branchless_converged_problem_stops_moving():
    """The tolerance breaks still freeze x in branchless mode (the evals
    keep running — their results are discarded by the selects)."""
    def jax_loss(x):
        return jnp.sum((x - 3.0) ** 2)

    x0 = jnp.full((8,), 3.0) + 1e-9
    xj, losses = lbfgs_torch(
        jax.value_and_grad(jax_loss), x0, steps=3, branchless=True
    )
    np.testing.assert_allclose(np.asarray(xj), np.asarray(x0), atol=1e-7)
    assert float(losses[-1]) == pytest.approx(float(losses[0]))


@pytest.mark.parametrize("mode", ["two_loop", "compact", "compact_shift"])
def test_history_wraps_past_history_size(mode):
    """More inner iterations than history_size: the ring buffer (two-loop)
    / shift-on-insert matrices (compact) must wrap without corrupting the
    direction (torch pops the oldest pair)."""
    torch_loss, jax_loss, x0 = _problem(4)
    xt, tlosses, _ = _run_torch(torch_loss, x0, steps=4, history_size=5)
    xj, jlosses = lbfgs_torch(
        jax.value_and_grad(jax_loss), jnp.asarray(x0), steps=4,
        history_size=5, history_math=mode,
    )
    np.testing.assert_allclose(np.asarray(jlosses), tlosses, rtol=1e-3)
    np.testing.assert_allclose(
        float(jax_loss(xj)), float(torch_loss(torch.from_numpy(xt))), rtol=1e-4
    )
