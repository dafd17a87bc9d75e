"""COCO image dataset with an overlapped host-decode -> device-feed pipeline.

Rebuild of the reference's ``CocoDataset``/``get_coco_loader``
(dataset.py:141-197, 314-360). The reference decodes JPEGs synchronously
inside the training loop (``num_workers=0`` — dataset.py:347,356), which is
the main throughput killer it has. Here decode runs on a background thread
pool and batches are handed to the training loop as ready fixed-shape
``[B, 256, 256, 3]`` float32 arrays; device transfer/sharding happens in
:mod:`styletransfer_tpu.parallel.prefetch`.

Contracts kept from the reference:
- 10% test / 90% train split by directory listing order, test capped at
  ``test_limit`` (dataset.py:329-340; network.py:671-673).
- Non-RGB (grayscale/CMYK) images are discarded, and unreadable files are
  replaced by another image rather than failing the epoch
  (dataset.py:176-197's pop-and-recurse, rebuilt without the recursion and
  the ``randint`` off-by-one).
- ``drop_last=True`` + shuffle per epoch (dataset.py:344-358).

When no images are on disk (zero-egress CI), a deterministic synthetic
dataset of procedural images keeps every train path runnable.
"""

from __future__ import annotations

import os
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from styletransfer_tpu import constants
from styletransfer_tpu.data.download import IMAGE_FOLDER_PATH, download_coco_images
from styletransfer_tpu.utils import images as img_utils
from styletransfer_tpu.utils.logging import get_logger


def _abspath(path: str) -> str:
    return path if os.path.isabs(path) else os.path.join(constants.PROJECT_ROOT_PATH, path)


# ---------------------------------------------------------------------------
# Synthetic fallback (deterministic, no network / no disk corpus needed).
# ---------------------------------------------------------------------------


def synthetic_image(index: int, size: int = constants.IMSIZE) -> np.ndarray:
    """Procedural RGB image: mixed gradients + sinusoidal texture. [0,1] HWC."""
    rng = np.random.default_rng(index)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    freqs = rng.uniform(2, 12, size=(3, 2))
    phases = rng.uniform(0, 2 * np.pi, size=(3,))
    base = rng.uniform(0.2, 0.8, size=(3,))
    chans = [
        base[c]
        + 0.3 * np.sin(2 * np.pi * (freqs[c, 0] * xx + freqs[c, 1] * yy) + phases[c])
        + 0.2 * (xx * rng.uniform(-1, 1) + yy * rng.uniform(-1, 1))
        for c in range(3)
    ]
    arr = np.stack(chans, axis=-1)
    return np.clip(arr, 0.0, 1.0).astype(np.float32)


class SyntheticDataset:
    """Deterministic stand-in corpus exposing the CocoDataset interface."""

    def __init__(self, num_images: int = 256, size: int = constants.IMSIZE,
                 seed_offset: int = 0):
        """``seed_offset`` shifts the procedural image indices — the
        synthetic test split uses it so its images are DISJOINT from the
        train set's (a test set that is a subset of training data would
        silently inflate eval quality in offline runs)."""
        self.num_images = num_images
        self.size = size
        self.seed_offset = seed_offset

    def __len__(self) -> int:
        return self.num_images

    def load(self, idx: int) -> Optional[np.ndarray]:
        arr = synthetic_image(self.seed_offset + idx, self.size)
        return np.asarray(img_utils.normalize(arr), dtype=np.float32)


class CocoDataset:
    """Image-directory dataset yielding normalized [size, size, 3] arrays.

    ``load`` returns None for images that should be discarded (non-RGB or
    unreadable) — the loader substitutes a neighbor, preserving the
    reference's keep-training-anyway behavior (dataset.py:176-197).
    """

    def __init__(
        self,
        image_names: Optional[Sequence[str]] = None,
        image_limit: Optional[int] = None,
        image_dir: str = IMAGE_FOLDER_PATH,
        size: int = constants.IMSIZE,
    ):
        self.image_dir = _abspath(image_dir)
        if image_names is None:
            image_names = sorted(os.listdir(self.image_dir))
        self.images: List[str] = list(image_names)
        if image_limit:
            self.images = self.images[:image_limit]
        self.size = size

    def __len__(self) -> int:
        return len(self.images)

    def load(self, idx: int) -> Optional[np.ndarray]:
        path = os.path.join(self.image_dir, self.images[idx])
        try:
            with Image.open(path) as img:
                if img.mode != "RGB":
                    # Reference discards non-3-channel images (dataset.py:176-186).
                    return None
                arr = img_utils.center_crop_resize(img, self.size)
        except Exception:  # noqa: BLE001 - unreadable/corrupt file
            return None
        if arr.shape[-1] != 3:
            return None
        return np.asarray(img_utils.normalize(arr), dtype=np.float32)


class DataLoader:
    """Batched loader with shuffling, drop_last, and threaded decode.

    Yields float32 ``[batch, size, size, 3]`` numpy arrays. A small thread
    pool decodes ahead of the consumer so host JPEG decode overlaps device
    compute (replacing the reference's synchronous in-loop decode).
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 4,
        shuffle: bool = True,
        drop_last: bool = True,
        num_threads: int = 4,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """``shard_index``/``shard_count`` give each host of a multi-host
        mesh a disjoint slice of the corpus (strided split; all hosts use
        the same seed so epoch boundaries align)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.seed = seed
        self._epoch = 0
        self._skip_batches = 0

    def __len__(self) -> int:
        n = len(range(self.shard_index, len(self.dataset), self.shard_count))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self, epoch: Optional[int] = None) -> List[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            # Per-epoch deterministic shuffle: the order for epoch e depends
            # only on (seed, e), so a crash-resume can reconstruct exactly
            # where an epoch left off (see set_position).
            e = self._epoch if epoch is None else epoch
            random.Random((self.seed << 32) ^ e).shuffle(idx)
        if self.shard_count > 1:
            idx = idx[self.shard_index :: self.shard_count]
        return idx

    def set_position(self, epoch: int, batches_consumed: int) -> None:
        """Resume mid-epoch: the NEXT ``__iter__`` yields epoch ``epoch``'s
        order with its first ``batches_consumed`` batches skipped (without
        decoding them). Step-level crash recovery uses this so resumed
        training does not replay data (ckpt step states store the position).
        """
        self._epoch = epoch
        self._skip_batches = batches_consumed

    def __iter__(self) -> Iterator[np.ndarray]:
        indices = self._indices()
        if self._skip_batches:
            # Skipping index slots, not decoded batches: bad-image
            # substitution can shift batch contents slightly vs the original
            # pass, but no successfully-trained batch is ever replayed.
            indices = indices[self._skip_batches * self.batch_size :]
            self._skip_batches = 0
        self._epoch += 1
        bs = self.batch_size

        from collections import deque

        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            # Bounded decode lookahead: keep a window of in-flight decodes
            # rather than submitting the whole epoch (100k-image corpora
            # would queue 100k futures).
            lookahead = max(4 * bs, 2 * self.num_threads)
            it = iter(indices)
            window: deque = deque()
            for i in it:
                window.append(pool.submit(self.dataset.load, i))
                if len(window) >= lookahead:
                    break
            batch: List[np.ndarray] = []
            fallback: Optional[np.ndarray] = None
            # Bad images decoded before the FIRST good one can't substitute
            # backwards yet; count them and fill the slots once a good image
            # exists, so leading failures never shrink the epoch (the
            # reference substitutes a random image, dataset.py:188-197).
            pending = 0
            while window:
                fut = window.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    window.append(pool.submit(self.dataset.load, nxt))
                arr = fut.result()
                if arr is None:
                    # Substitute the most recent good image (reference keeps
                    # training through bad files, dataset.py:188-197).
                    if fallback is None:
                        pending += 1
                        continue
                    arr = fallback
                fallback = arr
                for a in [arr] * (pending + 1):
                    batch.append(a)
                    if len(batch) == bs:
                        yield np.stack(batch)
                        batch = []
                pending = 0
            if batch and not self.drop_last:
                yield np.stack(batch)


def get_coco_loader(
    batch_size: int = 4,
    test_split: float = 0.10,
    test_limit: Optional[int] = None,
    train_limit: Optional[int] = None,
    image_dir: str = IMAGE_FOLDER_PATH,
    synthetic_fallback: bool = True,
    seed: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
) -> Tuple[DataLoader, DataLoader]:
    """Build (test_loader, train_loader) — same signature and split semantics
    as the reference ``get_coco_loader`` (dataset.py:314-360).
    """
    logger = get_logger()
    download_coco_images()

    abs_dir = _abspath(image_dir)
    all_images = sorted(os.listdir(abs_dir)) if os.path.isdir(abs_dir) else []

    if not all_images and synthetic_fallback:
        logger.warning(
            "No COCO images found in %s; using the deterministic synthetic "
            "dataset (256 images).", abs_dir,
        )
        # Test indices start past the train range so the splits are
        # disjoint, like the real directory split below.
        n_train = train_limit or 256
        test_ds = SyntheticDataset(num_images=max(test_limit or 20, 8),
                                   seed_offset=n_train)
        train_ds = SyntheticDataset(num_images=n_train)
    else:
        split_idx = int(len(all_images) * test_split)
        test_ds = CocoDataset(all_images[:split_idx], test_limit, image_dir)
        train_ds = CocoDataset(all_images[split_idx:], train_limit, image_dir)
        logger.info("Train set has %d entries", len(train_ds))
        logger.info("Test set has %d entries", len(test_ds))

    # Both loaders are host-sharded: in a multi-host run every process
    # decodes a disjoint slice and contributes its rows of the global batch
    # (parallel/mesh.py assembles with make_array_from_process_local_data).
    test_loader = DataLoader(
        test_ds, batch_size, shuffle=True, drop_last=True, seed=seed,
        shard_index=shard_index, shard_count=shard_count,
    )
    train_loader = DataLoader(
        train_ds, batch_size, shuffle=True, drop_last=True, seed=seed + 1,
        shard_index=shard_index, shard_count=shard_count,
    )
    return test_loader, train_loader
