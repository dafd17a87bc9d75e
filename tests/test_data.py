"""Tests for the data pipeline: COCO loader, synthetic fallback, video
datasets, and the prefetchers (SURVEY.md §4 strategy — tiny synthetic
images, no network access)."""

import numpy as np
from PIL import Image

from styletransfer_tpu.data import coco, video
from styletransfer_tpu.parallel import mesh as mesh_lib
from styletransfer_tpu.parallel import prefetch


def _write_images(d, count, size=16, mode="RGB"):
    d.mkdir(parents=True, exist_ok=True)
    for i in range(count):
        arr = np.full((size, size, 3), i * 10 % 255, dtype=np.uint8)
        img = Image.fromarray(arr)
        if mode != "RGB":
            img = img.convert(mode)
        img.save(d / f"{i:04d}.png")


def test_coco_dataset_loads_normalized(tmp_path):
    _write_images(tmp_path / "imgs", 4)
    ds = coco.CocoDataset(image_dir=str(tmp_path / "imgs"), size=16)
    assert len(ds) == 4
    arr = ds.load(0)
    assert arr.shape == (16, 16, 3)
    assert arr.dtype == np.float32


def test_coco_dataset_discards_grayscale(tmp_path):
    d = tmp_path / "imgs"
    _write_images(d, 1)
    Image.fromarray(np.zeros((16, 16), dtype=np.uint8)).save(d / "gray.png")
    ds = coco.CocoDataset(image_dir=str(d), size=16)
    loaded = [ds.load(i) for i in range(len(ds))]
    # one good, one discarded (None) — reference dataset.py:176-186
    assert sum(x is None for x in loaded) == 1


def test_dataloader_batches_drop_last(tmp_path):
    _write_images(tmp_path / "imgs", 10, size=16)
    ds = coco.CocoDataset(image_dir=str(tmp_path / "imgs"), size=16)
    loader = coco.DataLoader(ds, batch_size=4, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2  # 10 // 4, last dropped (dataset.py:344-358)
    assert all(b.shape == (4, 16, 16, 3) for b in batches)


def test_dataloader_substitutes_bad_images(tmp_path):
    d = tmp_path / "imgs"
    _write_images(d, 3)
    (d / "bad.png").write_bytes(b"not an image")
    ds = coco.CocoDataset(image_dir=str(d), size=16)
    loader = coco.DataLoader(ds, batch_size=2, drop_last=True, shuffle=False)
    batches = list(loader)
    # 3 good + 1 substituted = 4 images -> 2 batches
    assert len(batches) == 2


def test_dataloader_substitutes_leading_bad_images(tmp_path):
    """Bad files at the FRONT of the (unshuffled) order must still be
    substituted once a good image exists — leading failures must not
    shrink the epoch (the reference substitutes a random image,
    dataset.py:188-197)."""
    d = tmp_path / "imgs"
    d.mkdir(parents=True)
    # '!' sorts before '0', so the bad files decode first.
    (d / "!bad0.png").write_bytes(b"not an image")
    (d / "!bad1.png").write_bytes(b"also not an image")
    _write_images(d, 2)
    names = sorted(p.name for p in d.iterdir())
    assert names[0] == "!bad0.png" and names[1] == "!bad1.png"
    ds = coco.CocoDataset(image_dir=str(d), size=16)
    loader = coco.DataLoader(ds, batch_size=2, drop_last=True, shuffle=False)
    batches = list(loader)
    # 2 good + 2 substituted = 4 images -> 2 full batches
    assert len(batches) == 2
    assert all(b.shape == (2, 16, 16, 3) for b in batches)


def test_synthetic_dataset_deterministic():
    a = coco.SyntheticDataset(4, 16).load(2)
    b = coco.SyntheticDataset(4, 16).load(2)
    np.testing.assert_allclose(a, b)


def test_get_coco_loader_synthetic_fallback(tmp_path):
    test_loader, train_loader = coco.get_coco_loader(
        batch_size=4, image_dir=str(tmp_path / "nonexistent"), test_limit=8,
        train_limit=16,
    )
    batch = next(iter(train_loader))
    assert batch.shape == (4, 256, 256, 3)
    assert len(test_loader) >= 1


def test_video_dataset_batches_and_drops_ragged():
    ds = video.VideoDataset(videos=[0, 1, 2], batch_size=2, size=16)
    ds.synthetic = True
    batches = list(ds)
    assert len(batches) == 1  # ragged last batch dropped (dataset.py:248-250)


def test_video_batch_size_clamped():
    ds = video.VideoDataset(videos=[0, 1], batch_size=5, size=16)
    assert ds.batch_size == 2  # clamped (dataset.py:229-234)


def test_iterate_on_video_batches_stops_at_shortest():
    readers = [
        video.SyntheticFrameReader(0, num_frames=3, size=16),
        video.SyntheticFrameReader(1, num_frames=5, size=16),
    ]
    frames = list(video.iterate_on_video_batches(readers))
    assert len(frames) == 3  # shortest video ends (dataset.py:308-311)
    assert frames[0].shape == (2, 16, 16, 3)


def test_iterate_respects_max_frames():
    readers = [video.SyntheticFrameReader(0, num_frames=10, size=16)]
    frames = list(video.iterate_on_video_batches(readers, max_frames=4))
    assert len(frames) == 4


def test_prefetch_to_device_shards_batches():
    mesh = mesh_lib.get_mesh()
    batches = [np.ones((8, 4, 4, 3), np.float32) * i for i in range(3)]
    out = list(prefetch.prefetch_to_device(iter(batches), mesh))
    assert len(out) == 3
    assert out[1].sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(out[2]), batches[2])


def test_prefetch_propagates_errors():
    def gen():
        yield np.ones((8, 2, 2, 3), np.float32)
        raise ValueError("boom")

    mesh = mesh_lib.get_mesh()
    it = prefetch.prefetch_to_device(gen(), mesh)
    next(it)
    try:
        next(it)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_dataloader_sharding_disjoint_and_complete():
    ds = coco.SyntheticDataset(16, 8)
    seen = []
    for i in range(4):
        loader = coco.DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                                 shard_index=i, shard_count=4)
        for batch in loader:
            seen.append(batch)
        assert len(loader) == 2
    # 4 shards x 4 images: every image seen exactly once across shards
    all_imgs = np.concatenate(seen)
    assert all_imgs.shape[0] == 16
    uniq = {a.tobytes() for a in all_imgs}
    assert len(uniq) == 16


def test_prefetch_cleans_up_on_early_abandonment():
    import threading

    mesh = mesh_lib.get_mesh()
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield np.ones((8, 2, 2, 3), np.float32) * i

    before = threading.active_count()
    it = prefetch.prefetch_to_device(gen(), mesh, size=2)
    next(it)
    it.close()  # consumer abandons the generator (break / exception path)
    # Producer must stop promptly instead of blocking on a full queue.
    deadline = 50
    while threading.active_count() > before and deadline:
        import time

        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before
    assert len(produced) < 100  # did not run the whole epoch


def test_imageio_reader_yields_all_frames(tmp_path):
    """Real GIF through ImageioFrameReader: frame 0 included, EOF -> None."""
    import imageio

    from styletransfer_tpu.data.coco import synthetic_image

    path = str(tmp_path / "c.gif")
    w = imageio.get_writer(path, duration=41.7, loop=0)
    for i in range(5):
        w.append_data((np.roll(synthetic_image(2, 16), i, 1) * 255).astype(np.uint8))
    w.close()

    reader = video.ImageioFrameReader(path, size=16)
    frames = []
    while True:
        f = reader.next_frame()
        if f is None:
            break
        frames.append(f)
    reader.close()
    assert len(frames) == 5
    assert frames[0].shape == (1, 16, 16, 3)
    # frames are distinct (no skipped/duplicated first frame)
    assert not np.allclose(frames[0], frames[1])


def test_video_dataset_with_real_gifs(tmp_path):
    """VideoDataset over actual video files (GIF backend), not synthetic."""
    import imageio

    from styletransfer_tpu.data.coco import synthetic_image

    paths = []
    for v in range(2):
        p = str(tmp_path / f"v{v}.gif")
        w = imageio.get_writer(p, duration=41.7, loop=0)
        for i in range(4):
            w.append_data(
                (np.roll(synthetic_image(v, 16), i, 1) * 255).astype(np.uint8)
            )
        w.close()
        paths.append(p)

    ds = video.VideoDataset(videos=paths, batch_size=2, size=16)
    batches = list(ds)
    assert len(batches) == 1
    frames = list(video.iterate_on_video_batches(batches[0]))
    assert len(frames) == 4
    assert frames[0].shape == (2, 16, 16, 3)


def test_video_dataset_sharded_keeps_batch_size(tmp_path):
    """Multi-host: the local batch size must be IDENTICAL on every host
    (local rows assemble one global batch), so a shard with fewer videos
    than the batch yields ZERO batches instead of clamping to a
    different batch shape — and an empty shard is clean, not a
    make_batches ValueError."""
    from styletransfer_tpu.data import video as video_data

    # Shard 1 of 2 over 3 synthetic "videos" with batch 4: 1 local video.
    ds = video_data.VideoDataset(
        videos=list(range(3)), batch_size=4, shard_index=1, shard_count=2,
        synthetic_fallback=False,
    )
    assert ds.batch_size == 4  # NOT clamped to the local count
    assert len(ds) == 0  # ragged-dropped; lockstep stops all hosts

    # Empty shard: clean empty dataset.
    ds = video_data.VideoDataset(
        videos=[], batch_size=4, shard_index=1, shard_count=2,
        synthetic_fallback=False,
    )
    assert len(ds) == 0

    # Single-process keeps the convenience clamp.
    ds = video_data.VideoDataset(
        videos=list(range(2)), batch_size=4, synthetic_fallback=False,
    )
    assert ds.batch_size == 2 and len(ds) == 1


def test_synthetic_test_split_disjoint_from_train():
    """The synthetic fallback's test images must not be a subset of the
    training images (eval on trained-on data silently inflates quality)."""
    import numpy as np

    from styletransfer_tpu.data import coco

    test_ds, train_loader = None, None
    test_loader, train_loader = coco.get_coco_loader(
        batch_size=2, image_dir="definitely_missing_dir_xyz",
        test_limit=8, train_limit=16,
    )
    train_imgs = [train_loader.dataset.load(i)
                  for i in range(len(train_loader.dataset))]
    for j in range(len(test_loader.dataset)):
        t = test_loader.dataset.load(j)
        assert not any(np.array_equal(t, tr) for tr in train_imgs)
