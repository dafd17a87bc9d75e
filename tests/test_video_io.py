"""End-to-end process_video test on tiny frames (CPU): read a clip, stylize
recurrently in chunks, write the output animation (GIF backend)."""

import os

import imageio
import jax
import numpy as np
import pytest

from styletransfer_tpu import ckpt
from styletransfer_tpu.data.coco import synthetic_image
from styletransfer_tpu.engines import video
from styletransfer_tpu.models import transformer

SIZE = 16


@pytest.fixture
def clip(tmp_path):
    path = str(tmp_path / "clip.gif")
    w = imageio.get_writer(path, duration=41.7, loop=0)
    for i in range(7):
        frame = (np.roll(synthetic_image(5, SIZE), i, axis=1) * 255).astype(np.uint8)
        w.append_data(frame)
    w.close()
    return path


def test_process_video_end_to_end(tmp_path, clip, monkeypatch):
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    # Pretend a trained checkpoint exists.
    params = transformer.init_video_params(jax.random.PRNGKey(0))
    models = str(tmp_path / "models")
    ckpt.save_epoch(params, "video_st", "sty", 0, models)

    out = video.process_video(
        clip, style_name="sty", out_dir=str(tmp_path / "results"),
        models_path=models, chunk_size=4,
    )
    assert os.path.isfile(out)
    frames = list(imageio.get_reader(out))
    # 7 input frames -> 7 output frames (tail padding not written).
    assert len(frames) == 7


def test_process_video_save_frames_workdir(tmp_path, clip, monkeypatch):
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    params = transformer.init_video_params(jax.random.PRNGKey(0))
    models = str(tmp_path / "models")
    ckpt.save_epoch(params, "video_st", "sty", 0, models)

    video.process_video(
        clip, style_name="sty", out_dir=str(tmp_path / "results"),
        working_dir=str(tmp_path / "workdir") + "/", models_path=models,
        chunk_size=4, save_frames=True,
    )
    # Reference contract: per-frame PNGs named {i}.png (network.py:1133-1134).
    names = sorted(os.listdir(tmp_path / "workdir"), key=lambda x: int(x.split(".")[0]))
    assert names == [f"{i}.png" for i in range(7)]


def test_process_video_respects_max_frames(tmp_path, clip, monkeypatch):
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    params = transformer.init_video_params(jax.random.PRNGKey(0))
    models = str(tmp_path / "models")
    ckpt.save_epoch(params, "video_st", "sty", 0, models)

    out = video.process_video(
        clip, style_name="sty", out_dir=str(tmp_path / "results"),
        models_path=models, chunk_size=4, max_frames=3,
    )
    assert len(list(imageio.get_reader(out))) == 3


def test_process_video_dir_batched(tmp_path, monkeypatch):
    """convert-dir for video: different-length clips in one lockstep group
    (plus a ragged group), per-clip frame counts preserved, and each clip's
    output identical to converting it alone."""
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    in_dir = tmp_path / "clips"
    in_dir.mkdir()
    lengths = {"a": 5, "b": 7, "c": 3}  # batch of 2 -> group (a,b) + ragged (c)
    for name, n in lengths.items():
        w = imageio.get_writer(str(in_dir / f"{name}.gif"), duration=41.7, loop=0)
        for i in range(n):
            frame = (np.roll(synthetic_image(3, SIZE), i, axis=1) * 255).astype(
                np.uint8
            )
            w.append_data(frame)
        w.close()

    params = transformer.init_video_params(jax.random.PRNGKey(0))
    models = str(tmp_path / "models")
    ckpt.save_epoch(params, "video_st", "sty", 0, models)

    outs = video.process_video_dir(
        str(in_dir), style_name="sty", out_dir=str(tmp_path / "results"),
        models_path=models, batch_size=2, chunk_size=4,
    )
    assert sorted(os.path.basename(p) for p in outs) == [
        "video_st_sty_a.gif", "video_st_sty_b.gif", "video_st_sty_c.gif",
    ]
    got_lengths = {
        os.path.basename(p): len(list(imageio.get_reader(p))) for p in outs
    }
    assert got_lengths == {
        "video_st_sty_a.gif": 5, "video_st_sty_b.gif": 7, "video_st_sty_c.gif": 3,
    }
    # Per-clip parity with the single-clip path (lanes never mix).
    single = video.process_video(
        str(in_dir / "b.gif"), style_name="sty",
        out_dir=str(tmp_path / "single"), models_path=models, chunk_size=4,
    )
    ref = np.stack(list(imageio.get_reader(single)))
    got = np.stack(
        list(imageio.get_reader(str(tmp_path / "results" / "video_st_sty_b.gif")))
    )
    np.testing.assert_array_equal(got, ref)


def test_process_video_dir_skips_unreadable(tmp_path, monkeypatch):
    """An unreadable video file is skipped with a warning (same contract as
    the image convert-dir); readable clips still convert."""
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    in_dir = tmp_path / "clips"
    in_dir.mkdir()
    w = imageio.get_writer(str(in_dir / "good.gif"), duration=41.7, loop=0)
    for i in range(4):
        w.append_data(
            (np.roll(synthetic_image(1, SIZE), i, axis=1) * 255).astype(np.uint8)
        )
    w.close()
    (in_dir / "broken.gif").write_bytes(b"not a gif at all")

    params = transformer.init_video_params(jax.random.PRNGKey(0))
    models = str(tmp_path / "models")
    ckpt.save_epoch(params, "video_st", "sty", 0, models)

    outs = video.process_video_dir(
        str(in_dir), style_name="sty", out_dir=str(tmp_path / "results"),
        models_path=models, batch_size=2, chunk_size=4,
    )
    assert [os.path.basename(p) for p in outs] == ["video_st_sty_good.gif"]
    assert len(list(imageio.get_reader(outs[0]))) == 4


class _FakeMp4Writer:
    """Records the mp4 writer lifecycle a real imageio-ffmpeg writer has."""

    def __init__(self, path, **kwargs):
        self.path, self.kwargs = path, kwargs
        self.frames = []
        self.closed = False

    def append_data(self, frame):
        assert not self.closed
        self.frames.append(np.asarray(frame))

    def close(self):
        self.closed = True


def test_process_video_mp4_branch(tmp_path, clip, monkeypatch):
    """Pin the mp4 mux branch (reference contract network.py:1139-1158)
    without a codec: a fake mp4-capable ``imageio.get_writer`` must receive
    the ``video_st_{style}.mp4`` path, the fps pass-through, exactly the
    real frame count (no tail padding), and a close().

    In this zero-egress image the real branch never runs (no ffmpeg/pyav);
    installing ``imageio-ffmpeg`` is the one-liner that lights it up.
    """
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    params = transformer.init_video_params(jax.random.PRNGKey(0))
    models = str(tmp_path / "models")
    ckpt.save_epoch(params, "video_st", "sty", 0, models)

    made = []

    def fake_get_writer(path, **kwargs):
        if not path.endswith(".mp4"):
            raise AssertionError(f"mp4 branch must be tried first, got {path}")
        w = _FakeMp4Writer(path, **kwargs)
        made.append(w)
        return w

    monkeypatch.setattr(imageio, "get_writer", fake_get_writer)
    out = video.process_video(
        clip, style_name="sty", out_dir=str(tmp_path / "results"),
        models_path=models, chunk_size=4, fps=30.0,
    )
    (w,) = made
    assert out == w.path and out.endswith("video_st_sty.mp4")
    assert w.kwargs == {"fps": 30.0}
    assert len(w.frames) == 7  # tail padding of the 2nd chunk not written
    assert all(f.shape == w.frames[0].shape for f in w.frames)
    assert w.closed


def test_open_video_writer_mp4_first_gif_fallback(tmp_path, monkeypatch):
    """_open_video_writer (the convert-dir path) shares the same contract:
    mp4 first with fps=, GIF fallback with duration=1000/fps + loop."""
    from styletransfer_tpu.utils.logging import get_logger

    calls = []

    def mp4_ok(path, **kwargs):
        calls.append((path, kwargs))
        return _FakeMp4Writer(path, **kwargs)

    monkeypatch.setattr(imageio, "get_writer", mp4_ok)
    w, path = video._open_video_writer(str(tmp_path / "v"), 24.0, get_logger())
    assert path.endswith("v.mp4") and calls[0][1] == {"fps": 24.0}

    def mp4_unavailable(path, **kwargs):
        if path.endswith(".mp4"):
            raise ValueError("no ffmpeg")
        return _FakeMp4Writer(path, **kwargs)

    monkeypatch.setattr(imageio, "get_writer", mp4_unavailable)
    w, path = video._open_video_writer(str(tmp_path / "v"), 24.0, get_logger())
    assert path.endswith("v.gif")
    assert w.kwargs == {"duration": 1000.0 / 24.0, "loop": 0}
