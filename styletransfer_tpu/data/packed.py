"""Packed dataset: pre-cropped images in one memory-mapped file.

The production-rate input path. Decoding JPEGs on the host caps throughput
(the reference decodes synchronously per item, dataset.py:344-358; our
thread-pool loader helps but single-digit-core hosts still bottleneck).
Packing crops once into a flat uint8 file makes training reads a pure mmap
slice — no decode, no resize — and batches ship to the device as uint8
(4x less host->HBM traffic than float32), with normalization fused into the
first conv on device (``engines.fast`` normalizes uint8 batches in-graph).

Format: ``<path>.json`` header {"num_images", "size", "channels", "dtype"}
next to a raw C-order uint8 array file of shape [N, size, size, 3].
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from styletransfer_tpu import constants
from styletransfer_tpu.utils.logging import get_logger


def _header_path(data_path: str) -> str:
    return data_path + ".json"


def pack_images(
    image_dir: str,
    out_path: str,
    size: int = constants.IMSIZE,
    image_names: Optional[Sequence[str]] = None,
    limit: Optional[int] = None,
) -> int:
    """Pack a directory of images into ``out_path`` (uint8 crops).

    Skips non-RGB/unreadable files (same discard policy as the loaders).
    Returns the number of images packed.
    """
    from PIL import Image

    from styletransfer_tpu.utils import images as img_utils

    names = image_names or sorted(os.listdir(image_dir))
    if limit:
        names = names[:limit]

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    count = 0
    with open(out_path, "wb") as f:
        for name in names:
            try:
                with Image.open(os.path.join(image_dir, name)) as img:
                    if img.mode != "RGB":
                        continue
                    arr = img_utils.center_crop_resize(img, size)
            except Exception:  # noqa: BLE001 - unreadable file
                continue
            if arr.shape[-1] != 3:
                continue
            f.write((arr * 255.0).round().astype(np.uint8).tobytes())
            count += 1

    with open(_header_path(out_path), "w") as f:
        json.dump(
            {"num_images": count, "size": size, "channels": 3, "dtype": "uint8"}, f
        )
    get_logger().info("Packed %d images (%dpx) into %s", count, size, out_path)
    return count


def pack_synthetic(out_path: str, num_images: int = 256,
                   size: int = constants.IMSIZE) -> int:
    """Pack the deterministic synthetic corpus (offline testing/benching)."""
    from styletransfer_tpu.data.coco import synthetic_image

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        for i in range(num_images):
            arr = synthetic_image(i, size)
            f.write((arr * 255.0).round().astype(np.uint8).tobytes())
    with open(_header_path(out_path), "w") as f:
        json.dump(
            {"num_images": num_images, "size": size, "channels": 3, "dtype": "uint8"}, f
        )
    return num_images


class _PackedView:
    """Index-remapped view over a PackedDataset (for test/train splits)."""

    def __init__(self, base: "PackedDataset", indices):
        self._base = base
        self._indices = list(indices)

    def __len__(self) -> int:
        return len(self._indices)

    def load(self, idx: int):
        return self._base.load(self._indices[idx])


def get_packed_loader(
    data_path: str,
    batch_size: int = 4,
    test_split: float = 0.10,
    test_limit: Optional[int] = None,
    train_limit: Optional[int] = None,
    seed: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
):
    """(test_loader, train_loader) over a packed file — same split semantics
    as ``coco.get_coco_loader`` (first 10% test), zero-decode reads, uint8
    batches normalized on device by the train steps."""
    from styletransfer_tpu.data.coco import DataLoader

    ds = PackedDataset(data_path)
    split_idx = int(len(ds) * test_split)
    test_ds = _PackedView(ds, range(0, min(split_idx, test_limit or split_idx)))
    train_idx = range(split_idx, len(ds))
    if train_limit:
        train_idx = range(split_idx, min(split_idx + train_limit, len(ds)))
    train_ds = _PackedView(ds, train_idx)
    # The test loader shards like coco.get_coco_loader's: each host must
    # hold a DISJOINT eval slice (its rows assemble into the global eval
    # batch) — an unsharded copy per host would eval the same images
    # duplicated shard_count times AND iterate shard_count-fold more
    # batches than its peers.
    test_loader = DataLoader(test_ds, batch_size, shuffle=True, drop_last=True,
                             seed=seed, shard_index=shard_index,
                             shard_count=shard_count)
    train_loader = DataLoader(train_ds, batch_size, shuffle=True, drop_last=True,
                              seed=seed + 1, shard_index=shard_index,
                              shard_count=shard_count)
    return test_loader, train_loader


class PackedDataset:
    """mmap-backed dataset; ``load(i)`` returns a raw uint8 [size,size,3] view.

    Works directly with :class:`styletransfer_tpu.data.coco.DataLoader`;
    batches stay uint8 end-to-end and are normalized on device inside the
    train step.
    """

    def __init__(self, data_path: str):
        with open(_header_path(data_path)) as f:
            hdr = json.load(f)
        self.size = hdr["size"]
        self.num_images = hdr["num_images"]
        shape = (self.num_images, self.size, self.size, hdr["channels"])
        self._data = np.memmap(data_path, dtype=np.uint8, mode="r", shape=shape)

    def __len__(self) -> int:
        return self.num_images

    def load(self, idx: int) -> np.ndarray:
        return self._data[idx]
