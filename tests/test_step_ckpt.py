"""Step-level checkpoint tests: atomic save, restore, training resume."""

import jax
import numpy as np
import optax

from styletransfer_tpu import ckpt
from styletransfer_tpu.data import coco as coco_data
from styletransfer_tpu.engines import fast
from styletransfer_tpu.models import transformer, vgg

SIZE = 16


def test_step_state_roundtrip(tmp_path):
    params = transformer.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    mp = str(tmp_path)

    assert ckpt.load_step_state(params, opt_state, "fast_st", "s", mp) is None
    ckpt.save_step_state(params, opt_state, 3, 1234, "fast_st", "s", mp)
    state = ckpt.load_step_state(params, opt_state, "fast_st", "s", mp)
    assert int(state["epoch"]) == 3
    assert int(state["iteration"]) == 1234
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(state["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer moments survive too
    for a, b in zip(
        jax.tree_util.tree_leaves(opt_state),
        jax.tree_util.tree_leaves(state["opt_state"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_step_state_not_matched_by_epoch_discovery(tmp_path):
    params = transformer.init_params(jax.random.PRNGKey(0))
    opt_state = optax.adam(1e-3).init(params)
    import pytest

    mp = str(tmp_path)
    ckpt.save_step_state(params, opt_state, 0, 10, "fast_st", "s", mp)
    with pytest.raises(FileNotFoundError):
        ckpt.find_latest("fast_st", "s", mp)  # step state alone isn't "latest"
    ckpt.save_epoch(params, "fast_st", "s", 2, mp)
    path, epoch = ckpt.find_latest("fast_st", "s", mp)
    assert "epoch2" in path


def test_static_train_step_checkpoint_resume(tmp_path):
    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5
    mp = str(tmp_path / "models")
    loaders = dict(
        train_loader=coco_data.DataLoader(coco_data.SyntheticDataset(16, SIZE), 8),
        test_loader=coco_data.DataLoader(coco_data.SyntheticDataset(8, SIZE), 8),
    )
    fast.static_train(
        style, style_name="sc", epochs=1, batch_size=8,
        vgg_params=vgg_params, models_path=mp,
        runs_dir=str(tmp_path / "runs"), max_steps_per_epoch=2,
        step_checkpoint_every=1, **loaders,
    )
    # A step state exists and a second run restores from it without error.
    template = transformer.init_params(jax.random.PRNGKey(0))
    opt_state_t = fast.make_optimizer().init(template)
    state = ckpt.load_step_state(template, opt_state_t, "fast_st", "sc", mp)
    assert state is not None
    assert int(state["iteration"]) >= 2


def test_video_train_step_checkpoint(tmp_path):
    from styletransfer_tpu.data import video as video_data
    from styletransfer_tpu.engines import video

    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5
    mp = str(tmp_path / "models")
    loader = video_data.VideoDataset(videos=[0, 1], batch_size=2, size=SIZE)
    loader.synthetic = True
    video.video_train(
        style, style_name="vsc", epochs=1, batch_size=2,
        vgg_params=vgg_params, video_loader=loader,
        chunk_size=4, max_frames=6, models_path=mp,
        runs_dir=str(tmp_path / "runs"), step_checkpoint_every=4,
    )
    template = transformer.init_video_params(jax.random.PRNGKey(0))
    opt_t = fast.make_optimizer().init(template)
    state = ckpt.load_step_state(
        template, opt_t, "video_st", "vsc", mp,
        extra_keys=("has_external_weights",),
    )
    assert state is not None
    assert int(state["epoch"]) == 1  # post-epoch save puts resume at epoch+1
    assert int(state["extra"]["has_external_weights"]) == 0
