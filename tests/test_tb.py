"""Tests for the dependency-free TensorBoard event writer.

Validates the TFRecord framing (length/CRC32C) and protobuf encoding by
parsing the written file back by hand.
"""

import struct

import numpy as np

from styletransfer_tpu.utils import tb


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == tb._masked_crc(header), "header CRC mismatch"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == tb._masked_crc(data), "data CRC mismatch"
            records.append(data)
    return records


def test_crc32c_known_vectors():
    # Standard CRC32C test vectors.
    assert tb._crc32c(b"") == 0x0
    assert tb._crc32c(b"123456789") == 0xE3069283
    assert tb._crc32c(b"a") == 0xC1D04330


def test_varint_encoding():
    assert tb._varint(0) == b"\x00"
    assert tb._varint(1) == b"\x01"
    assert tb._varint(300) == b"\xac\x02"


def test_writer_produces_valid_records(tmp_path):
    d = str(tmp_path / "run")
    with tb.SummaryWriter(d) as w:
        w.add_scalar("data/fst_train_loss", 1.5, 0)
        w.add_scalar("data/fst_train_loss", 0.5, 20)
        w.add_image("data/fst_images", np.zeros((4, 8, 3), np.uint8), 0)
    records = _read_records(w._path)
    # file_version event + 2 scalars + 1 image
    assert len(records) == 4
    assert b"brain.Event:2" in records[0]
    assert b"data/fst_train_loss" in records[1]
    # scalar value 1.5 as little-endian float32 must appear
    assert struct.pack("<f", 1.5) in records[1]
    assert b"data/fst_images" in records[3]
    assert b"\x89PNG" in records[3]  # embedded PNG


def test_get_tensorboard_writer_wipes_dir(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    stale = d / "stale.txt"
    stale.write_text("old")
    w = tb.get_tensorboard_writer(str(d))
    w.close()
    # Reference semantics: rm -rf then recreate (network.py:25-35)
    assert not stale.exists()


def test_loads_in_tensorboard_if_available(tmp_path):
    try:
        from tensorboard.backend.event_processing import event_accumulator
    except ImportError:
        import pytest

        pytest.skip("tensorboard not installed")
    d = str(tmp_path / "run")
    with tb.SummaryWriter(d) as w:
        for i in range(5):
            w.add_scalar("loss", float(i), i)
    acc = event_accumulator.EventAccumulator(d)
    acc.Reload()
    scalars = acc.Scalars("loss")
    assert [s.step for s in scalars] == list(range(5))
    assert [s.value for s in scalars] == [float(i) for i in range(5)]


def test_native_crc32c_matches_python():
    import time

    from styletransfer_tpu import native

    data = bytes(range(256)) * 64
    assert native.crc32c(data) == tb._crc32c_py(data)
    assert native.crc32c(b"123456789") == 0xE3069283
    assert native.crc32c(b"") == 0
    # spot-check a few random payloads
    import numpy as np

    rng = np.random.default_rng(0)
    for n in (1, 7, 8, 9, 1023):
        payload = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc32c(payload) == tb._crc32c_py(payload)


def test_add_image_grayscale_hw1(tmp_path):
    """(H, W, 1) grayscale arrays — what center_crop_resize returns for
    grayscale inputs — must encode, not crash PIL's fromarray."""
    import numpy as np

    from styletransfer_tpu.utils import tb

    w = tb.get_tensorboard_writer(str(tmp_path / "run"))
    w.add_image("gray", np.zeros((8, 8, 1), np.uint8), 0)
    w.add_image("gray_f", np.full((8, 8, 1), 0.5, np.float32), 1)
    w.close()
