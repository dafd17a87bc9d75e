"""Checkpoint save/load/discovery tests, incl. the epoch-sort fix and .pth import."""

import jax
import numpy as np
import pytest
import torch

from styletransfer_tpu import ckpt
from styletransfer_tpu.models import transformer


@pytest.fixture
def params():
    return transformer.init_params(jax.random.PRNGKey(0))


def test_save_load_roundtrip(tmp_path, params):
    path = str(tmp_path / "m" / "p.msgpack")
    ckpt.save(params, path)
    loaded = ckpt.load(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_latest_is_numeric_not_lexicographic(tmp_path, params):
    # Reference quirk: lexicographic sort puts epoch10 < epoch2
    # (network.py:65-67). We must pick epoch10.
    mp = str(tmp_path)
    for e in (1, 2, 10):
        ckpt.save_epoch(params, "fast_st", "sty", e, mp)
    path, epoch = ckpt.find_latest("fast_st", "sty", mp)
    assert epoch == 10


def test_find_latest_filters_model_and_style(tmp_path, params):
    mp = str(tmp_path)
    ckpt.save_epoch(params, "fast_st", "a", 3, mp)
    ckpt.save_epoch(params, "video_st", "a", 9, mp)
    ckpt.save_epoch(params, "fast_st", "b", 7, mp)
    path, epoch = ckpt.find_latest("fast_st", "a", mp)
    assert "fast_st_a_epoch3" in path


def test_find_latest_raises_when_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        ckpt.find_latest("fast_st", "nope", str(tmp_path))


def test_epoch_resume_contract(tmp_path, params):
    mp = str(tmp_path)
    assert not ckpt.epoch_checkpoint_exists("fast_st", "s", 0, mp)
    ckpt.save_epoch(params, "fast_st", "s", 0, mp)
    assert ckpt.epoch_checkpoint_exists("fast_st", "s", 0, mp)


def test_load_reference_pth_checkpoint(tmp_path, params):
    # A reference-style .pth state dict (torch OIHW Sequential naming,
    # network.py:767-770) must load transparently.
    sd = transformer.export_torch_state_dict(params)
    tsd = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    pth = tmp_path / "fast_st_sty_epoch5.pth"
    torch.save(tsd, str(pth))

    loaded, epoch = ckpt.load_latest_transformer("fast_st", "sty", params, str(tmp_path))
    assert epoch == 5
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_msgpack_preferred_over_pth_same_epoch(tmp_path, params):
    sd = transformer.export_torch_state_dict(params)
    tsd = {k: torch.from_numpy(v.copy() * 2) for k, v in sd.items()}
    torch.save(tsd, str(tmp_path / "fast_st_s_epoch1.pth"))
    ckpt.save_epoch(params, "fast_st", "s", 1, str(tmp_path))
    path, _ = ckpt.find_latest("fast_st", "s", str(tmp_path))
    assert path.endswith(".msgpack")


def test_orbax_backend_roundtrip_and_discovery(tmp_path, params, monkeypatch):
    """STX_CKPT_BACKEND=orbax: epoch checkpoints become Orbax OCDBT
    directories with the SAME naming/discovery/resume contract, and both
    formats stay readable whichever backend is active."""
    import os

    mp = str(tmp_path)
    monkeypatch.setenv("STX_CKPT_BACKEND", "orbax")
    path = ckpt.save_epoch(params, "fast_st", "sty", 3, mp)
    assert path.endswith("_epoch3.orbax") and os.path.isdir(path)
    assert ckpt.epoch_checkpoint_exists("fast_st", "sty", 3, mp)

    found, epoch = ckpt.find_latest("fast_st", "sty", mp)
    assert (found, epoch) == (path, 3)
    loaded, epoch = ckpt.load_latest_transformer("fast_st", "sty", params, mp)
    assert epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # Higher-epoch msgpack written by the default backend wins discovery;
    # the orbax epoch still counts as existing (no retraining on switch).
    monkeypatch.delenv("STX_CKPT_BACKEND")
    ckpt.save_epoch(params, "fast_st", "sty", 4, mp)
    found, epoch = ckpt.find_latest("fast_st", "sty", mp)
    assert epoch == 4 and found.endswith(".msgpack")
    assert ckpt.epoch_checkpoint_exists("fast_st", "sty", 3, mp)
    # Cross-backend RESUME LOAD: with the default backend active, the
    # orbax epoch must load through existing_checkpoint_path (what the
    # trainers' resume-skip uses) — checkpoint_path alone would name a
    # .msgpack that was never written and crash the resume.
    p3 = ckpt.existing_checkpoint_path("fast_st", "sty", 3, mp)
    assert p3.endswith(".orbax")
    re3 = ckpt.load(p3, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(re3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert ckpt.existing_checkpoint_path("fast_st", "sty", 4, mp).endswith(
        ".msgpack"
    )
    assert ckpt.existing_checkpoint_path("fast_st", "sty", 9, mp) is None

    # Overwriting an existing orbax epoch must not fail (force semantics,
    # like a plain file rewrite).
    monkeypatch.setenv("STX_CKPT_BACKEND", "orbax")
    ckpt.save_epoch(params, "fast_st", "sty", 3, mp)


def test_orbax_backend_bad_value(monkeypatch):
    monkeypatch.setenv("STX_CKPT_BACKEND", "zip")
    with pytest.raises(ValueError):
        ckpt.checkpoint_path("fast_st", "sty", 0)


def test_find_latest_skips_step_and_carry_sidecars(tmp_path):
    """Step states AND per-process carry sidecars match the name filter
    but are not weights files — discovery must skip both (selecting a
    carry sidecar crashed load() with a structure error instead of the
    clean no-weights FileNotFoundError)."""
    import pytest

    d = tmp_path / "models"
    d.mkdir()
    (d / "video_st_sty_step_state.msgpack").write_bytes(b"x")
    (d / "video_st_sty_step_carry_p0of2.msgpack").write_bytes(b"x")
    with pytest.raises(FileNotFoundError):
        ckpt.find_latest("video_st", "sty", str(d))
    # A real checkpoint alongside them is found.
    import jax

    from styletransfer_tpu.models import transformer

    params = transformer.init_params(jax.random.PRNGKey(0))
    ckpt.save_epoch(params, "video_st", "sty", 2, str(d))
    path, epoch = ckpt.find_latest("video_st", "sty", str(d))
    assert epoch == 2 and path.endswith("epoch2.msgpack")


def test_save_is_atomic_no_tmp_residue(tmp_path):
    """save() goes through tmp+rename (a crash mid-write must never leave
    a truncated file at the final name) and cleans its tmp file."""
    import jax

    from styletransfer_tpu.models import transformer

    params = transformer.init_params(jax.random.PRNGKey(0))
    path = tmp_path / "m.msgpack"
    ckpt.save(params, str(path))
    assert path.is_file()
    assert [p.name for p in tmp_path.iterdir()] == ["m.msgpack"]
