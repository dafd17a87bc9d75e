"""Tests for image IO: crop/resize/normalize semantics (img_utils.py:13-44)."""

import numpy as np
from PIL import Image

from styletransfer_tpu import constants
from styletransfer_tpu.utils import images


def test_load_image_shape_and_normalization(tmp_image):
    arr = images.load_image(tmp_image, size=32)
    assert arr.shape == (1, 32, 32, 3)
    assert arr.dtype == np.float32
    # ImageNet-normalized data is roughly centered; raw [0,1] would be >= 0
    assert arr.min() < 0


def test_center_crop_is_square_center(tmp_path):
    # 8x4 image: white left half, black right half; crop keeps middle 4x4
    arr = np.zeros((4, 8, 3), dtype=np.uint8)
    arr[:, :4] = 255
    p = tmp_path / "wide.png"
    Image.fromarray(arr).save(p)
    out = images.load_image(str(p), size=4, normalized=False)[0]
    # middle 4 columns = cols 2..5 -> half white, half black
    assert out[:, 0, :].mean() > 0.9
    assert out[:, -1, :].mean() < 0.1


def test_normalize_denormalize_roundtrip(rng):
    img = rng.random((1, 8, 8, 3)).astype(np.float32)
    norm = images.normalize(img)
    back = np.asarray(images.denormalize(norm))
    np.testing.assert_allclose(back, img, rtol=1e-5, atol=1e-6)


def test_save_and_reload_roundtrip(tmp_path, rng):
    img01 = rng.random((1, 16, 16, 3)).astype(np.float32)
    norm = images.normalize(img01)
    out = tmp_path / "out.png"
    images.save_image(norm, str(out))
    reloaded = np.asarray(Image.open(out), dtype=np.float32) / 255.0
    np.testing.assert_allclose(reloaded, img01[0], atol=2 / 255.0)


def test_save_uint8_atomic(tmp_path, rng):
    """save_uint8 writes via temp-then-rename: a successful save leaves no
    temp file, and a failed save leaves neither a temp NOR a partial file
    at the target path (the daemons save on the request path; a supervisor
    kill or polling reader must never see a half-written image)."""
    arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    out = tmp_path / "a.png"
    images.save_uint8(arr, str(out))
    assert out.is_file()
    assert list(tmp_path.glob("*.tmp-*")) == []

    import pytest

    with pytest.raises(Exception):
        # Wrong dtype/shape for an image -> PIL raises before the rename.
        images.save_uint8(
            np.zeros((2, 2, 7), np.uint8), str(tmp_path / "bad.png")
        )
    assert not (tmp_path / "bad.png").exists()
    assert list(tmp_path.glob("*.tmp-*")) == []


def test_save_uint8_concurrent_same_path(tmp_path, rng):
    """Concurrent saves to the SAME output path must not corrupt each
    other: batched daemons encode a group's outputs on a thread pool, and
    a group may contain several requests with identical default naming.
    The temp name is pid+thread-unique, so every save is atomic and the
    last completed rename wins (regression: a pid-only temp name let one
    thread rename another's half-written file, observed as a
    FileNotFoundError under the TCP bench's identical-request burst)."""
    from concurrent.futures import ThreadPoolExecutor

    out = tmp_path / "same.png"
    arrs = [np.full((16, 16, 3), v, np.uint8) for v in range(8)]

    def save(a):
        for _ in range(20):
            images.save_uint8(a, str(out))

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(save, arrs))  # raises if any save failed

    loaded = np.asarray(Image.open(out).convert("RGB"))
    # the file is one of the written images, intact (no interleaving)
    assert any(np.array_equal(loaded, a) for a in arrs)
    assert list(tmp_path.glob("*.tmp-*")) == []


def test_save_with_ground_truth_concat(tmp_path, rng):
    a = images.normalize(rng.random((1, 8, 8, 3)).astype(np.float32))
    b = images.normalize(rng.random((1, 8, 8, 3)).astype(np.float32))
    out = tmp_path / "pair.png"
    images.save_image(a, str(out), ground_truth=b)
    im = Image.open(out)
    assert im.size == (16, 8)  # concat along width (img_utils.py:47-61)


def test_from_array_matches_load(tmp_path, rng):
    frame = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    p = tmp_path / "f.png"
    Image.fromarray(frame).save(p)
    a = images.load_image(str(p), size=constants.IMSIZE)
    b = images.from_array(frame)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_uint8_serving_path_bit_exact(tmp_path, rng):
    """load_image_uint8 + in-graph normalize == load_image's host-normalized
    f32 path, bit for bit; to_uint8_on_device == host to_uint8."""
    from PIL import Image

    arr = rng.integers(0, 256, size=(70, 50, 3), dtype=np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)

    import jax.numpy as jnp

    f32 = images.load_image(p, size=32)
    u8 = images.load_image_uint8(p, size=32)
    dev = np.asarray(images.maybe_normalize_on_device(jnp.asarray(u8)))
    np.testing.assert_array_equal(dev, f32)

    model_space = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(images.to_uint8_on_device(model_space))[0],
        images.to_uint8(np.asarray(model_space)),
    )


def test_from_array_uint8_bit_exact(rng):
    """Video-serving input path: from_array_uint8 + in-graph normalize ==
    from_array's host-normalized f32 output, bit for bit."""
    import jax.numpy as jnp

    frame = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    f32 = images.from_array(frame, size=16)
    u8 = images.from_array_uint8(frame, size=16)
    dev = np.asarray(images.maybe_normalize_on_device(jnp.asarray(u8)))
    np.testing.assert_array_equal(dev, f32)
