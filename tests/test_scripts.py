"""Tests for the turnkey scripts (VGG19 weights install, CLI docs gen)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FETCH = os.path.join(REPO_ROOT, "scripts", "fetch_vgg19.py")

_REAL_WEIGHTS = os.path.join(REPO_ROOT, "data", "models", "vgg19.npz")


def _synthetic_vgg19_pth(path):
    torch = pytest.importorskip("torch")
    layout = (
        (0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
        (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256),
        (19, 256, 512), (21, 512, 512), (23, 512, 512), (25, 512, 512),
        (28, 512, 512), (30, 512, 512), (32, 512, 512), (34, 512, 512),
    )
    torch.manual_seed(3)
    sd = {}
    for idx, cin, cout in layout:
        sd[f"features.{idx}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn(cout) * 0.05
    torch.save(sd, path)
    return sd


def test_fetch_vgg19_converts_local_pth(tmp_path):
    """Air-gapped path: --source .pth -> validated .npz that load_params reads."""
    src = tmp_path / "vgg19_custom.pth"
    sd = _synthetic_vgg19_pth(str(src))
    out = tmp_path / "vgg19.npz"

    result = subprocess.run(
        [sys.executable, FETCH, "--source", str(src), "--out", str(out),
         "--no-verify"],
        capture_output=True, text=True, cwd=REPO_ROOT, timeout=300,
    )
    assert result.returncode == 0, result.stdout + result.stderr
    assert out.exists()

    from styletransfer_tpu.models import vgg

    params = vgg.load_params(str(out))
    w = np.asarray(sd["features.0.weight"])
    np.testing.assert_allclose(
        np.asarray(params["Conv2d_1"]["kernel"]),
        np.transpose(w, (2, 3, 1, 0)),
        rtol=1e-6,
    )


def test_fetch_vgg19_rejects_wrong_structure(tmp_path):
    torch = pytest.importorskip("torch")
    src = tmp_path / "not_vgg.pth"
    torch.save({"features.0.weight": torch.zeros(8, 3, 3, 3)}, str(src))
    result = subprocess.run(
        [sys.executable, FETCH, "--source", str(src),
         "--out", str(tmp_path / "o.npz"), "--no-verify"],
        capture_output=True, text=True, cwd=REPO_ROOT, timeout=300,
    )
    assert result.returncode != 0
    assert "expected" in result.stderr or "missing conv" in result.stderr


@pytest.mark.skipif(
    not os.path.isfile(_REAL_WEIGHTS),
    reason="real VGG19 weights not installed (zero-egress env); "
           "run scripts/fetch_vgg19.py to enable",
)
def test_perceptual_quality_with_real_weights():
    """Gated smoke test: with REAL VGG19 weights, a short fast_st training
    run must cut the style loss by >=50% — the perceptual-quality contract
    that seeded-random VGG features cannot certify."""
    import jax
    import jax.numpy as jnp

    from styletransfer_tpu.data import coco
    from styletransfer_tpu.engines import fast
    from styletransfer_tpu.models import transformer, vgg

    vgg_params = vgg.load_params(_REAL_WEIGHTS)
    size = 64
    style = jnp.asarray(coco.SyntheticDataset(2, size).load(0))[None]
    grams = vgg.style_gram_targets(vgg_params, style)
    params = transformer.init_params(jax.random.PRNGKey(0))
    opt, step = fast.make_train_step(vgg_params, grams)
    opt_state = opt.init(params)
    loader = coco.DataLoader(coco.SyntheticDataset(64, size), batch_size=4)

    first = last = None
    for i, batch in enumerate(loader):
        params, opt_state, metrics = step(params, opt_state, jnp.asarray(batch))
        s = float(metrics["style"])
        first = s if first is None else first
        last = s
        if i >= 15:
            break
    assert last < 0.5 * first, (first, last)
