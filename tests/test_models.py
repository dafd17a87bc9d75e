"""Tests for the VGG feature extractor and the transform networks.

Covers tap placement (pre-/post-ReLU per reference network.py:257-314),
full-network forward parity against a torch transcription of the reference
architecture, the torch state-dict import/export round trip, and the video
warm-start surgery (network.py:860-881).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from styletransfer_tpu.models import transformer, vgg


# ---------------------------------------------------------------------------
# VGG
# ---------------------------------------------------------------------------


def test_vgg_plan_stops_at_last_tap():
    # Default taps end at Conv2d_5 (conv3_1): 5 convs, 2 pools executed.
    assert vgg.num_convs() == 5
    steps = vgg._plan(vgg.DEFAULT_TAPS)
    names = [s[1] for s in steps]
    assert names[-1] == "Conv2d_5"
    assert names.count("MaxPool2d_2") == 1 and names.count("MaxPool2d_4") == 1


def test_vgg_tap_shapes():
    params = vgg.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    feats = vgg.extract_features(params, x)
    assert feats["Conv2d_1"].shape == (2, 64, 64, 64)
    assert feats["Conv2d_2"].shape == (2, 64, 64, 64)
    assert feats["Conv2d_3"].shape == (2, 32, 32, 128)
    assert feats["Conv2d_4"].shape == (2, 32, 32, 128)
    assert feats["ReLU_4"].shape == (2, 32, 32, 128)
    assert feats["Conv2d_5"].shape == (2, 16, 16, 256)


def test_vgg_conv_taps_are_pre_relu():
    params = vgg.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    feats = vgg.extract_features(params, x, taps=("Conv2d_4", "ReLU_4"))
    conv4 = np.asarray(feats["Conv2d_4"])
    relu4 = np.asarray(feats["ReLU_4"])
    assert (conv4 < 0).any(), "Conv2d_4 tap should be pre-ReLU"
    np.testing.assert_allclose(relu4, np.maximum(conv4, 0.0), rtol=1e-6)


def _torch_vgg_prefix(params):
    """Build the first 5 VGG convs in torch from our params for parity."""
    seq = nn.Sequential(
        nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(2, 2),
        nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(2, 2),
        nn.Conv2d(128, 256, 3, padding=1),
    )
    conv_idx = [0, 2, 5, 7, 10]
    with torch.no_grad():
        for i, idx in enumerate(conv_idx):
            p = params[f"Conv2d_{i + 1}"]
            w = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
            seq[idx].weight.copy_(torch.from_numpy(w))
            seq[idx].bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    return seq


def test_vgg_forward_matches_torch(rng):
    params = vgg.init_params(jax.random.PRNGKey(0))
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    feats = vgg.extract_features(params, jnp.asarray(x), taps=("Conv2d_5",))

    seq = _torch_vgg_prefix(params)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    theirs = seq(tx).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(feats["Conv2d_5"]), theirs, rtol=1e-3, atol=1e-4)


def test_vgg_torch_state_dict_import_roundtrip(rng):
    # Build a fake torchvision-style state dict and import it.
    sd = {}
    cfg = [(3, 64, 0), (64, 64, 2), (64, 128, 5), (128, 128, 7), (128, 256, 10)]
    for cin, cout, idx in cfg:
        sd[f"features.{idx}.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(
            np.float32
        )
        sd[f"features.{idx}.bias"] = rng.standard_normal(cout).astype(np.float32)
    params = vgg.import_torch_state_dict(sd)
    w = np.asarray(params["Conv2d_3"]["kernel"])
    assert w.shape == (3, 3, 64, 128)
    np.testing.assert_allclose(
        w, np.transpose(sd["features.5.weight"], (2, 3, 1, 0))
    )


def test_perceptual_loss_grad_flows():
    params = vgg.init_params(jax.random.PRNGKey(0))
    style = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    content = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    grams = vgg.style_gram_targets(params, style)

    def loss_fn(img):
        total, _ = vgg.perceptual_loss(params, img, content, grams)
        return total

    g = jax.grad(loss_fn)(content + 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


# ---------------------------------------------------------------------------
# Transform nets
# ---------------------------------------------------------------------------


def _torch_reference_net(in_channels=3):
    """Torch transcription of the reference ImageTransformNet
    (network.py:509-611) for forward parity testing."""

    class ResidualBlock(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = nn.Conv2d(c, c, 3, padding=1, padding_mode="reflect")
            self.insn1 = nn.InstanceNorm2d(c, affine=True)
            self.relu = nn.ReLU()
            self.conv2 = nn.Conv2d(c, c, 3, padding=1, padding_mode="reflect")
            self.insn2 = nn.InstanceNorm2d(c, affine=True)

        def forward(self, x):
            out = self.relu(self.insn1(self.conv1(x)))
            out = self.conv2(out)
            out = out + x
            return self.insn2(out)

    return nn.Sequential(
        nn.Conv2d(in_channels, 32, 9, padding=4, padding_mode="reflect"),
        nn.InstanceNorm2d(32, affine=True), nn.ReLU(),
        nn.Conv2d(32, 64, 3, stride=2, padding=1, padding_mode="reflect"),
        nn.InstanceNorm2d(64, affine=True), nn.ReLU(),
        nn.Conv2d(64, 128, 3, stride=2, padding=1, padding_mode="reflect"),
        nn.InstanceNorm2d(128, affine=True), nn.ReLU(),
        ResidualBlock(128), ResidualBlock(128), ResidualBlock(128),
        ResidualBlock(128), ResidualBlock(128),
        nn.Upsample(mode="nearest", scale_factor=2),
        nn.Conv2d(128, 64, 3, padding=1, padding_mode="reflect"),
        nn.InstanceNorm2d(64, affine=True), nn.ReLU(),
        nn.Upsample(mode="nearest", scale_factor=2),
        nn.Conv2d(64, 32, 3, padding=1, padding_mode="reflect"),
        nn.InstanceNorm2d(32, affine=True), nn.ReLU(),
        nn.Conv2d(32, 3, 9, padding=4, padding_mode="reflect"),
    )


def test_transformer_output_shape():
    params = transformer.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    y = transformer.apply(params, x)
    assert y.shape == (2, 64, 64, 3)


def test_transformer_matches_torch_reference(rng):
    """Forward parity: torch net with the reference architecture, weights
    copied from a seeded init of our net via the state-dict export."""
    params = transformer.init_params(jax.random.PRNGKey(0))
    sd = transformer.export_torch_state_dict(params)

    tnet = _torch_reference_net()
    tsd = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    tnet.load_state_dict(tsd)
    tnet.eval()

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32) * 0.5
    ours = np.asarray(transformer.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_padearly_phase_decoder_matches_stacked(rng):
    """The default pad-early/phase-form apply equals the naive stacked form
    (which mirrors the reference layer-by-layer) — including at odd-ish
    sizes and for the 6-channel video net."""
    for in_ch, hw in ((3, 32), (3, 48), (6, 32)):
        params = transformer.init_params(jax.random.PRNGKey(in_ch), in_channels=in_ch)
        x = jnp.asarray(
            rng.standard_normal((2, hw, hw, in_ch)).astype(np.float32) * 0.5
        )
        fast = transformer._apply_padearly(params, x)
        naive = transformer._apply_stacked(params, x)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(naive), rtol=1e-4, atol=1e-5
        )


def test_padearly_phase_decoder_conditional_affines(rng):
    """Multi-style [B, C] affines ride the phase decoder correctly."""
    from styletransfer_tpu.models import multistyle

    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=3)
    # give each style a distinct affine so a mix-up would show
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * jnp.arange(p.shape[0])[:, None] if p.ndim == 2 else p,
        params,
    )
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32) * 0.5)
    idx = jnp.asarray([2, 1])
    got = multistyle.apply(params, x, idx)
    # per-sample single-style equivalents through the stacked path
    sel = multistyle.select_styles(params, idx)
    for b in range(2):
        single = jax.tree_util.tree_map(
            lambda p: p[b] if p.ndim == 2 else p, sel
        )
        want = transformer._apply_stacked(single, x[b : b + 1])
        np.testing.assert_allclose(
            np.asarray(got[b : b + 1]), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_padearly_phase_decoder_grad_flows():
    """Gradients flow through the phase-form decoder to every parameter."""
    params = transformer.init_params(jax.random.PRNGKey(0))
    x = jnp.ones((1, 16, 16, 3)) * 0.3

    def loss(p):
        return jnp.sum(jnp.square(transformer._apply_padearly(p, x)))

    grads = jax.grad(loss)(params)
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert np.isfinite(np.asarray(g)).all(), path
        assert float(jnp.max(jnp.abs(g))) > 0.0, path


def test_torch_state_dict_roundtrip():
    params = transformer.init_params(jax.random.PRNGKey(3))
    sd = transformer.export_torch_state_dict(params)
    back = transformer.import_torch_state_dict(sd)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_video_net_six_channels_and_warm_start():
    fast = transformer.init_params(jax.random.PRNGKey(0))
    video = transformer.init_video_params(jax.random.PRNGKey(1), fast_params=fast)
    # First conv takes 6 channels (frame ⊕ previous stylized, network.py:850-855)
    assert video["conv1"]["kernel"].shape == (9, 9, 6, 32)
    # All other layers warm-started from the fast net (network.py:860-881)
    np.testing.assert_allclose(
        np.asarray(video["res3"]["conv1"]["kernel"]),
        np.asarray(fast["res3"]["conv1"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(video["conv_out"]["kernel"]), np.asarray(fast["conv_out"]["kernel"])
    )
    # The surgery deletes only 0.weight/0.bias (the conv), so the first
    # instance norm IS warm-started (network.py:868-877).
    np.testing.assert_allclose(
        np.asarray(video["in1"]["scale"]), np.asarray(fast["in1"]["scale"])
    )
    # conv1 must NOT equal the fast net's conv1 (different shape anyway)
    y = transformer.apply(video, jnp.zeros((1, 32, 32, 6)))
    assert y.shape == (1, 32, 32, 3)


def test_num_params_close_to_reference():
    # Reference ImageTransformNet ≈ 1.68 M params (BASELINE.md).
    params = transformer.init_params(jax.random.PRNGKey(0))
    n = transformer.num_params(params)
    assert 1_600_000 < n < 1_800_000


def test_vgg_import_full_torchvision_dict(rng):
    """A full 16-conv torchvision VGG19 state dict imports correctly — only
    the first 5 convs (up to the deepest tap) are read, at the right module
    indices (0,2,5,7,10)."""
    cfgs = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
            (512, 512), (512, 512), (512, 512), (512, 512), (512, 512)]
    sd = {}
    for (cin, cout), idx in zip(cfgs, vgg._TORCHVISION_CONV_IDX):
        sd[f"features.{idx}.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)
        ).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.standard_normal(cout).astype(np.float32)
    params = vgg.import_torch_state_dict(sd)
    assert set(params) == {f"Conv2d_{i}" for i in range(1, 6)}
    np.testing.assert_allclose(
        np.asarray(params["Conv2d_5"]["kernel"]),
        np.transpose(sd["features.10.weight"], (2, 3, 1, 0)),
    )
    # And the imported tower runs.
    feats = vgg.extract_features(params, jnp.zeros((1, 32, 32, 3)))
    assert feats["Conv2d_5"].shape == (1, 8, 8, 256)


def test_apply_non_multiple_of_four_sizes(rng):
    """The phase decoder must handle inputs whose dims are not multiples of
    4: the encoder's stride-2 convs floor odd dims, the phase upsamples
    double them back, and conv_out's 4x4 space-to-depth form always sees
    padded dims divisible by 4 (4h+8). Output dims follow torch's rule
    (4 * floor(floor((H+1)/2 + 0.5)...) — same as the reference net)."""
    params = transformer.init_params(jax.random.PRNGKey(0))
    for size in (250, 252, 260):
        x = jnp.asarray(rng.standard_normal((1, size, size, 3)).astype(np.float32))
        out = transformer.apply(params, x)
        # Encoder: H -> H (conv1) -> floor((H-1)/2)+1 twice; decoder doubles twice.
        h1 = (size - 1) // 2 + 1
        h2 = (h1 - 1) // 2 + 1
        assert out.shape == (1, 4 * h2, 4 * h2, 3)
        assert bool(jnp.isfinite(out).all())


def test_vgg_unknown_tap_and_missing_explicit_weights_raise(tmp_path):
    """Misspelled tap names fail at plan time (not as a distant empty
    feature dict), and an EXPLICIT weights path that doesn't exist raises
    instead of silently falling through to other weights."""
    import pytest

    from styletransfer_tpu.models import vgg

    with pytest.raises(ValueError, match="unknown VGG tap"):
        vgg.extract_features(
            vgg.init_params(jax.random.PRNGKey(0)),
            jnp.zeros((1, 8, 8, 3)), taps=("Conv2d_99",),
        )
    with pytest.raises(FileNotFoundError):
        vgg.load_params(weights_path=str(tmp_path / "nope.pth"))
