"""Tests for the packed mmap dataset and device-side normalization."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from styletransfer_tpu.data import coco, packed
from styletransfer_tpu.utils import images as img_utils


def test_pack_and_load_roundtrip(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(5):
        arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    out = str(tmp_path / "pack.bin")
    n = packed.pack_images(str(d), out, size=16)
    assert n == 5

    ds = packed.PackedDataset(out)
    assert len(ds) == 5
    img = ds.load(2)
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.uint8


def test_pack_skips_non_rgb(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(d / "a.png")
    Image.fromarray(np.zeros((16, 16), dtype=np.uint8)).save(d / "gray.png")
    (d / "junk.png").write_bytes(b"nope")
    n = packed.pack_images(str(d), str(tmp_path / "p.bin"), size=16)
    assert n == 1


def test_pack_synthetic_deterministic(tmp_path):
    p1, p2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    packed.pack_synthetic(p1, num_images=4, size=16)
    packed.pack_synthetic(p2, num_images=4, size=16)
    a, b = packed.PackedDataset(p1), packed.PackedDataset(p2)
    np.testing.assert_array_equal(a.load(3), b.load(3))


def test_packed_with_dataloader_uint8_batches(tmp_path):
    out = str(tmp_path / "p.bin")
    packed.pack_synthetic(out, num_images=8, size=16)
    loader = coco.DataLoader(packed.PackedDataset(out), batch_size=4)
    batch = next(iter(loader))
    assert batch.shape == (4, 16, 16, 3)
    assert batch.dtype == np.uint8


def test_device_normalize_matches_host_path(tmp_path):
    out = str(tmp_path / "p.bin")
    packed.pack_synthetic(out, num_images=2, size=16)
    raw = packed.PackedDataset(out).load(0)

    on_device = np.asarray(
        img_utils.maybe_normalize_on_device(jnp.asarray(raw[None]))
    )
    host = np.asarray(
        img_utils.normalize(raw.astype(np.float32) / 255.0)
    )[None]
    np.testing.assert_allclose(on_device, host, rtol=1e-5, atol=1e-6)
    # float input passes through untouched
    f = jnp.ones((1, 4, 4, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(img_utils.maybe_normalize_on_device(f)), np.asarray(f)
    )


def test_fast_train_step_accepts_uint8_batch(tmp_path):
    from styletransfer_tpu.engines import fast
    from styletransfer_tpu.models import transformer, vgg

    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    grams = vgg.style_gram_targets(vgg_params, style)
    params = transformer.init_params(jax.random.PRNGKey(2))
    opt, step = fast.make_train_step(vgg_params, grams, style_weight=1000.0)
    opt_state = opt.init(params)

    out = str(tmp_path / "p.bin")
    packed.pack_synthetic(out, num_images=8, size=16)
    batch = next(iter(coco.DataLoader(packed.PackedDataset(out), batch_size=8)))
    params, opt_state, metrics = step(params, opt_state, jnp.asarray(batch))
    assert np.isfinite(float(metrics["total"]))


def test_get_packed_loader_split(tmp_path):
    out = str(tmp_path / "p.bin")
    packed.pack_synthetic(out, num_images=40, size=16)
    test_loader, train_loader = packed.get_packed_loader(out, batch_size=4)
    # 10% test = 4 images -> 1 batch; 36 train -> 9 batches
    assert len(test_loader) == 1
    assert len(train_loader) == 9
    b = next(iter(train_loader))
    assert b.dtype == np.uint8 and b.shape == (4, 16, 16, 3)
