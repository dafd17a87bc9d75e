"""Golden numeric regression tests.

Pins the exact numerics of the seeded model forward passes and losses
against stored reference values (``tests/golden/golden.npz``, generated on
the CPU backend). Catches silent numeric drift from refactors — torch-parity
tests verify semantics, these verify *stability*.

Regenerate (only when an intentional numeric change lands):
see the generation snippet in this file's git history / docs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from styletransfer_tpu.models import transformer, vgg
from styletransfer_tpu.ops import losses

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")


def _data():
    return np.load(GOLDEN)


def test_transformer_forward_golden():
    d = _data()
    params = transformer.init_params(jax.random.PRNGKey(0))
    out = np.asarray(transformer.apply(params, jnp.asarray(d["input"])))
    np.testing.assert_allclose(out, d["transformer_out"], rtol=1e-4, atol=1e-5)


def test_gram_golden():
    d = _data()
    g = np.asarray(losses.gram_matrix(jnp.asarray(d["input"])))
    np.testing.assert_allclose(g, d["gram"], rtol=1e-5, atol=1e-7)


def test_vgg_tap_means_golden():
    d = _data()
    params = vgg.init_params(jax.random.PRNGKey(0))
    feats = vgg.extract_features(params, jnp.asarray(d["input"]))
    for name, f in feats.items():
        np.testing.assert_allclose(
            float(np.mean(np.asarray(f))), float(d[f"tapmean_{name}"]),
            rtol=1e-4, atol=1e-6,
        )


def test_perceptual_loss_golden():
    d = _data()
    params = vgg.init_params(jax.random.PRNGKey(0))
    # The golden style image is the second draw of the seed-42 generator
    # (the first draw produced the stored input); replay the sequence.
    rng = np.random.default_rng(42)
    _ = rng.standard_normal((1, 16, 16, 3))  # input draw
    style = rng.standard_normal((1, 16, 16, 3)).astype(np.float32) * 0.5
    grams = vgg.style_gram_targets(params, jnp.asarray(style))
    total, comps = vgg.perceptual_loss(
        params, jnp.asarray(d["input"]), jnp.asarray(style), grams
    )
    np.testing.assert_allclose(float(total), float(d["perceptual_total"]), rtol=1e-4)
    np.testing.assert_allclose(float(comps["style"]), float(d["perceptual_style"]), rtol=1e-4)
    np.testing.assert_allclose(float(comps["content"]), float(d["perceptual_content"]), rtol=1e-4)


def test_train_step_golden():
    """Pin the full train-step numerics (forward + custom-VJP backward +
    Adam update) over 3 steps on fixed seeds. Catches silent gradient
    regressions from future VJP/kernel work — the per-op parity tests
    check each piece; this checks their composition end to end."""
    from styletransfer_tpu.engines import fast

    rng = np.random.default_rng(42)
    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), dtype=jnp.float32)
    grams = vgg.style_gram_targets(vgg_params, style)
    opt, step = fast.make_train_step(vgg_params, grams)
    params = transformer.init_params(jax.random.PRNGKey(1))
    opt_state = opt.init(params)
    batch = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), dtype=jnp.float32)
    totals = []
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, batch)
        totals.append(float(m["total"]))
    np.testing.assert_allclose(
        totals, [296.224274, 1236.626465, 224.133560], rtol=1e-3
    )
    param_l1 = float(
        sum(jnp.sum(jnp.abs(v)) for v in jax.tree_util.tree_leaves(params))
    )
    np.testing.assert_allclose(param_l1, 27308.205078, rtol=1e-3)


def test_video_scan_step_golden():
    """Pin the video scan-step numerics (temporal loss, stop-gradient carry,
    validity-masked padded frame) on fixed seeds. The third frame is padded
    (valid=False): its metrics must be exactly zero and it must not update
    the params."""
    from styletransfer_tpu.engines import video

    rng = np.random.default_rng(7)
    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), dtype=jnp.float32)
    grams = vgg.style_gram_targets(vgg_params, style)
    opt, step = video.make_scan_train_step(vgg_params, grams)
    params = transformer.init_video_params(jax.random.PRNGKey(2))
    opt_state = opt.init(params)
    frames = jnp.asarray(rng.standard_normal((3, 2, 32, 32, 3)), dtype=jnp.float32)
    valid = jnp.asarray([True, True, False])
    old = frames[0]
    mask = video.freeze_mask(params, False)
    params, opt_state, _, _, metrics = step(
        params, opt_state, frames, valid, old, old, mask
    )
    np.testing.assert_allclose(
        np.asarray(metrics["total"]),
        [328.488068, 831.681946, 0.0], rtol=1e-3, atol=1e-6,
    )
    param_l1 = float(
        sum(jnp.sum(jnp.abs(v)) for v in jax.tree_util.tree_leaves(params))
    )
    np.testing.assert_allclose(param_l1, 27398.423828, rtol=1e-3)


def test_multistyle_step_golden():
    """Pin the multi-style train-step numerics (conditional-IN affines
    through the custom VJPs, per-sample style gram targets) on fixed
    seeds."""
    from styletransfer_tpu.engines import multistyle as ms
    from styletransfer_tpu.models import multistyle

    rng = np.random.default_rng(11)
    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    styles = jnp.asarray(rng.standard_normal((2, 1, 32, 32, 3)), dtype=jnp.float32)
    grams = [vgg.style_gram_targets(vgg_params, s) for s in styles]
    stacked = {k: jnp.concatenate([g[k] for g in grams]) for k in grams[0]}
    opt, step = ms.make_train_step(vgg_params, stacked)
    params = multistyle.init_params(jax.random.PRNGKey(3), num_styles=2)
    opt_state = opt.init(params)
    batch = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), dtype=jnp.float32)
    idx = jnp.asarray([0, 1], dtype=jnp.int32)
    totals = []
    for _ in range(2):
        params, opt_state, m = step(params, opt_state, batch, idx)
        totals.append(float(m["total"]))
    np.testing.assert_allclose(totals, [297.535645, 1666.657959], rtol=1e-3)
    param_l1 = float(
        sum(jnp.sum(jnp.abs(v)) for v in jax.tree_util.tree_leaves(params))
    )
    np.testing.assert_allclose(param_l1, 28878.744141, rtol=1e-3)
