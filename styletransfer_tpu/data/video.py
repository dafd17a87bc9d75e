"""Video dataset: batched frame streams for recurrent training.

Rebuild of the reference ``VideoDataset`` + ``iterate_on_video_batches``
(dataset.py:125-138, 200-311). Contracts kept:

- Batches are batches of *videos*; each step yields one frame per video,
  stacked to ``[B, size, size, 3]`` (dataset.py:280-311).
- Iteration stops when the shortest video in the batch ends
  (the reference catches the reader's IndexError, dataset.py:308-311).
- The ragged last batch of videos is dropped (dataset.py:248-250), and the
  batch size is clamped to the video count (dataset.py:229-234).
- ``max_frames`` caps each clip at 90s @ 24fps (dataset.py:281).

When no videos are on disk a deterministic synthetic clip source (moving
procedural patterns) keeps the video train/convert paths runnable offline.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from styletransfer_tpu import constants
from styletransfer_tpu.data.coco import synthetic_image
from styletransfer_tpu.data.download import VIDEO_DATA_PATH, download_videos_dataset
from styletransfer_tpu.utils import images as img_utils
from styletransfer_tpu.utils.logging import get_logger

MAX_FRAMES_DEFAULT = 90 * 24


def _abspath(path: str) -> str:
    return path if os.path.isabs(path) else os.path.join(constants.PROJECT_ROOT_PATH, path)


class FrameReader:
    """Iterator protocol over decoded, normalized frames of one video."""

    def next_frame(self) -> Optional[np.ndarray]:  # [1, size, size, 3] or None at EOF
        raise NotImplementedError

    def close(self) -> None:
        pass


class ImageioFrameReader(FrameReader):
    """Wraps an imageio reader; frames go through the standard image
    transform (crop-square, resize, normalize — dataset.py:294-306).

    ``normalized=False`` emits uint8 frames instead (crop/resize only) for
    the serving paths, which normalize in-graph — bit-identical and 4x
    less host->device traffic (utils.images.load_image_uint8)."""

    def __init__(
        self, path: str, size: int = constants.IMSIZE, normalized: bool = True
    ):
        import imageio

        self._reader = imageio.get_reader(path)
        self._size = size
        self._index = 0
        self._normalized = normalized

    def next_frame(self) -> Optional[np.ndarray]:
        try:
            # Explicit indexed reads: imageio v2's get_next_data initializes
            # last_index to 0 on some backends (Pillow/GIF), silently
            # skipping frame 0.
            frame = self._reader.get_data(self._index)
        except (IndexError, EOFError, StopIteration):
            # ffmpeg readers raise IndexError at end-of-stream
            # (dataset.py:308-311); the Pillow GIF backend raises EOFError.
            return None
        except Exception as exc:  # noqa: BLE001 - corrupt mid-stream frame
            # A truncated/corrupt video raises backend-specific errors
            # (e.g. imageio's CannotReadFrameError, a RuntimeError) mid-
            # stream. The pipeline's keep-training-through-bad-files
            # contract (the image side survives unreadable files —
            # data/coco.py) treats it as this clip ending early, with a
            # warning so the corpus problem is visible.
            from styletransfer_tpu.utils.logging import get_logger

            get_logger().warning(
                "Video frame %d unreadable (%s: %s); treating clip as "
                "ended.", self._index, type(exc).__name__, exc,
            )
            return None
        self._index += 1
        if not self._normalized:
            return img_utils.from_array_uint8(frame, self._size)
        return img_utils.from_array(frame, self._size)

    def close(self) -> None:
        self._reader.close()


class SyntheticFrameReader(FrameReader):
    """Deterministic clip: a procedural image translating over time."""

    def __init__(self, seed: int, num_frames: int = 48, size: int = constants.IMSIZE):
        self._base = synthetic_image(seed, size)
        self._num_frames = num_frames
        self._i = 0

    def next_frame(self) -> Optional[np.ndarray]:
        if self._i >= self._num_frames:
            return None
        shifted = np.roll(self._base, shift=2 * self._i, axis=1)
        self._i += 1
        return np.asarray(img_utils.normalize(shifted), dtype=np.float32)[None]


def make_batches(items: Sequence, n: int) -> List[List]:
    """Successive n-sized chunks (reference dataset.py:125-138)."""
    return [list(items[i : i + n]) for i in range(0, len(items), n)]


class VideoDataset:
    """Iterable over batches of frame readers (reference dataset.py:200-277)."""

    def __init__(
        self,
        videos: Optional[Sequence[str]] = None,
        data_limit: Optional[int] = None,
        batch_size: int = 3,
        video_dir: str = VIDEO_DATA_PATH,
        size: int = constants.IMSIZE,
        synthetic_fallback: bool = True,
        synthetic_count: int = 4,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """``shard_index``/``shard_count`` give each host of a multi-host
        run a disjoint strided slice of the video corpus (same contract as
        the COCO ``DataLoader`` sharding — data/coco.py)."""
        logger = get_logger()
        self.size = size
        self.synthetic = False

        if videos is None:
            download_videos_dataset()
            abs_dir = _abspath(video_dir)
            listing = sorted(os.listdir(abs_dir)) if os.path.isdir(abs_dir) else []
            videos = [os.path.join(abs_dir, v) for v in listing]
        videos = list(videos)

        if not videos and synthetic_fallback:
            logger.warning(
                "No videos found; using %d deterministic synthetic clips.",
                synthetic_count,
            )
            self.synthetic = True
            videos = list(range(synthetic_count))

        if data_limit:
            videos = videos[:data_limit]
        if shard_count > 1:
            videos = videos[shard_index::shard_count]

        if shard_count > 1:
            # Multi-host: the batch size must be IDENTICAL on every host
            # (the local rows assemble into one global batch), so never
            # clamp to the LOCAL shard's count — shards differ by up to
            # one video, and clamping would give hosts different local
            # batch shapes. A shard with fewer videos than the batch
            # simply yields zero (ragged-dropped) batches; the trainers'
            # lockstep iteration then stops every host together.
            if batch_size > len(videos):
                logger.warning(
                    "Shard %d/%d has %d video(s) < batch %d; it will "
                    "yield no batches (all hosts stop together via "
                    "lockstep).", shard_index, shard_count, len(videos),
                    batch_size,
                )
        elif batch_size > len(videos):
            logger.warning(
                "Batch size larger than video count; using batch of %d", len(videos)
            )
            batch_size = len(videos)
        self.batch_size = batch_size

        # batch_size can be 0 here only when the corpus itself is empty
        # (no videos, synthetic_fallback=False): no batches, cleanly —
        # make_batches would raise on a zero range step.
        self.video_batches = (
            make_batches(videos, batch_size) if batch_size > 0 else []
        )
        if self.video_batches and len(self.video_batches[-1]) != batch_size:
            self.video_batches = self.video_batches[:-1]

    def __len__(self) -> int:
        return len(self.video_batches)

    def __iter__(self) -> Iterator[List[FrameReader]]:
        for batch in self.video_batches:
            if self.synthetic:
                yield [SyntheticFrameReader(seed, size=self.size) for seed in batch]
            else:
                yield [ImageioFrameReader(path, self.size) for path in batch]


def iterate_on_video_batches(
    batch: List[FrameReader], max_frames: int = MAX_FRAMES_DEFAULT
) -> Iterator[np.ndarray]:
    """Yield ``[B, size, size, 3]`` frame stacks until the shortest video ends
    or ``max_frames`` is reached (reference dataset.py:280-311)."""
    try:
        for _ in range(max_frames):
            frames = []
            for reader in batch:
                f = reader.next_frame()
                if f is None:
                    return
                frames.append(f)
            yield np.concatenate(frames, axis=0)
    finally:
        for reader in batch:
            reader.close()
