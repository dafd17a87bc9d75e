"""Image loading / saving with the reference's transform semantics.

TPU-native rebuild of ``stransfer/img_utils.py``. Host-side work (PIL decode,
center crop, bilinear resize) produces fixed-shape float32 arrays; the
normalize step is a pure jnp function so it can run device-side and fuse into
the first convolution under jit.

Layout: the framework is **NHWC** end to end (channels-last maps the channel
axis onto TPU vector lanes; XLA's TPU conv emitters prefer NHWC). The
reference is NCHW (torch); conversion happens only at import/export
boundaries.

Reference behavior being matched:
- ``image_loader_transform`` (img_utils.py:13-44): center-crop to the min
  dimension, resize to ``IMSIZE``, scale to [0,1], normalize with ImageNet
  mean/std, add a leading batch dim.
- ``image_loader`` (img_utils.py:64-74): PIL open + the transform above.
- ``imshow`` (img_utils.py:77-117): optional side-by-side concat, denormalize,
  clamp to the legal range, save.
- ``concat_images`` (img_utils.py:47-61): concat along width.
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from styletransfer_tpu import constants

_MEAN = np.asarray(constants.IMAGENET_MEAN, dtype=np.float32)
_STD = np.asarray(constants.IMAGENET_STD, dtype=np.float32)


# ---------------------------------------------------------------------------
# Host-side decode path (fixed output shapes so jit never recompiles).
# ---------------------------------------------------------------------------


def _center_crop_resize_pil(image: "Image.Image", size: int) -> "Image.Image":
    """The ONE crop recipe every load path shares: center-crop to the min
    dimension's square — torchvision CenterCrop offsets are
    ``int(round(delta / 2.))`` (banker's rounding, NOT floor; they differ
    by one pixel when delta % 4 == 3) — then bilinear-resize to
    ``size``x``size``. The uint8 serving paths' bit-exactness argument
    depends on all callers using exactly this sequence."""
    w, h = image.size
    side = min(w, h)
    left = int(round((w - side) / 2.0))
    top = int(round((h - side) / 2.0))
    image = image.crop((left, top, left + side, top + side))
    return image.resize((size, size), Image.BILINEAR)


def center_crop_resize(image: Image.Image, size: int = constants.IMSIZE) -> np.ndarray:
    """Center-crop to a square of the min dimension, then bilinear-resize.

    Matches torchvision ``CenterCrop(min_dim) -> Resize(size)`` on a PIL image
    (reference img_utils.py:20-27). Returns float32 HWC in [0, 1].
    """
    image = _center_crop_resize_pil(image, size)
    arr = np.asarray(image, dtype=np.float32) / 255.0
    if arr.ndim == 2:  # grayscale: keep a channel axis so callers can detect it
        arr = arr[:, :, None]
    return arr


def normalize(image: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalize a [0,1]-scaled NHWC (or HWC) image. Pure / jittable."""
    return (image - _MEAN) / _STD


def denormalize(image: jnp.ndarray) -> jnp.ndarray:
    """Invert :func:`normalize`. Pure / jittable."""
    return image * _STD + _MEAN


def maybe_normalize_on_device(batch: jnp.ndarray) -> jnp.ndarray:
    """Normalize a raw uint8 batch in-graph; pass float batches through.

    Lets the input pipeline ship uint8 (4x less host->HBM traffic — the
    packed-dataset path); XLA fuses the scale/shift into the first conv.
    The dtype check happens at trace time, so this is jit-free overhead.
    """
    if batch.dtype == jnp.uint8:
        return (batch.astype(jnp.float32) / 255.0 - _MEAN) / _STD
    return batch


def load_image(
    image_path: str, size: int = constants.IMSIZE, normalized: bool = True
) -> np.ndarray:
    """Load an image as a ``[1, size, size, 3]`` float32 array.

    Equivalent of the reference ``image_loader`` (img_utils.py:64-74):
    decode, center-crop square, resize, scale to [0,1], ImageNet-normalize,
    add batch dim. Non-RGB inputs are converted to RGB (the reference's data
    path discards them instead — our data pipeline keeps that contract in
    :mod:`styletransfer_tpu.data.coco`, but single-image CLI loads convert).
    """
    with Image.open(image_path) as img:
        img = img.convert("RGB")
        arr = center_crop_resize(img, size)
    if normalized:
        arr = (arr - _MEAN) / _STD
    return arr[None, ...]


def from_array(frame: np.ndarray, size: int = constants.IMSIZE) -> np.ndarray:
    """Decode an HWC uint8 frame (e.g. a video frame) like :func:`load_image`."""
    img = Image.fromarray(frame)
    if img.mode != "RGB":
        img = img.convert("RGB")
    arr = center_crop_resize(img, size)
    return ((arr - _MEAN) / _STD)[None, ...]


# ---------------------------------------------------------------------------
# Save path.
# ---------------------------------------------------------------------------


def concat_images(im1: np.ndarray, im2: np.ndarray, axis: int = -2) -> np.ndarray:
    """Concatenate two images along width (reference img_utils.py:47-61).

    Works on HWC or NHWC arrays; default axis is width in both.
    """
    return np.concatenate([np.asarray(im1), np.asarray(im2)], axis=axis)


def to_uint8(image: np.ndarray, denormalized: bool = False) -> np.ndarray:
    """Convert a model-space image to displayable HWC uint8.

    Denormalizes (unless already done), clips to [0, 1] — the reference's
    clamp to the legal RGB range (img_utils.py:103-109) — and scales to uint8.
    """
    arr = np.asarray(image, dtype=np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if not denormalized:
        arr = arr * _STD + _MEAN
    arr = np.clip(arr, 0.0, 1.0)
    return np.round(arr * 255.0).astype(np.uint8)


def save_image(
    image: np.ndarray,
    path: str,
    ground_truth: Optional[np.ndarray] = None,
    denormalize_first: bool = True,
) -> None:
    """Save a model-space image to disk (reference ``imshow``, img_utils.py:77-117).

    If ``ground_truth`` is given the two images are concatenated along width
    before saving — the TensorBoard side-by-side convention of the reference
    training loops (network.py:757-761).
    """
    arr = to_uint8(image, denormalized=not denormalize_first)
    if ground_truth is not None:
        gt = to_uint8(ground_truth, denormalized=not denormalize_first)
        arr = concat_images(arr, gt, axis=1)
    out_dir = os.path.dirname(path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    save_uint8(arr, path)


def save_uint8(arr: np.ndarray, path: str) -> None:
    """Atomically save a uint8 [H,W,3] array as an image.

    Write-then-rename in the target directory, so a reader polling for
    outputs (or a daemon killed mid-request by its supervisor) never
    observes a partially-written file at the final path. Every serving
    save path uses this.
    """
    if arr.ndim == 4:
        arr = arr[0]
    base, ext = os.path.splitext(path)
    # pid AND thread id: batched daemons encode a group's outputs on a
    # thread pool, and two requests naming the SAME output path must not
    # share a temp file (interleaved writes + a stolen rename corrupt
    # both; last completed rename wins instead, like the serial case).
    tmp = f"{base}.tmp-{os.getpid()}-{threading.get_ident()}{ext or '.png'}"
    try:
        Image.fromarray(arr).save(tmp)
        os.replace(tmp, path)
    except BaseException:
        # Never leave the temp file behind (failed save OR an interrupt
        # between write and rename).
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


def load_image_uint8(image_path: str, size: int = constants.IMSIZE) -> np.ndarray:
    """Load an image as ``[1, size, size, 3]`` uint8 (crop/resize as
    :func:`load_image`, no normalization).

    The serving input path: shipping uint8 to the device and normalizing
    in-graph (:func:`maybe_normalize_on_device`) is bit-identical to the
    host-normalized f32 path (``center_crop_resize`` is ``uint8/255``) at
    4x less host->device traffic.
    """
    with Image.open(image_path) as img:
        img = img.convert("RGB")
        img = _center_crop_resize_pil(img, size)
        return np.asarray(img, dtype=np.uint8)[None, ...]


def to_uint8_on_device(image: jnp.ndarray) -> jnp.ndarray:
    """In-graph equivalent of :func:`to_uint8`: denormalize, clamp to the
    legal RGB range, scale to uint8. The serving output path — shipping
    uint8 back from the device is 4x less device->host traffic."""
    arr = denormalize(image.astype(jnp.float32))
    arr = jnp.clip(arr, 0.0, 1.0)
    return jnp.round(arr * 255.0).astype(jnp.uint8)


def from_array_uint8(frame: np.ndarray, size: int = constants.IMSIZE) -> np.ndarray:
    """Decode an HWC frame to ``[1, size, size, 3]`` uint8 (crop/resize as
    :func:`from_array`, no normalization) — the video serving input path
    (see :func:`load_image_uint8` for the bit-exactness argument)."""
    img = Image.fromarray(frame)
    if img.mode != "RGB":
        img = img.convert("RGB")
    img = _center_crop_resize_pil(img, size)
    return np.asarray(img, dtype=np.uint8)[None, ...]
