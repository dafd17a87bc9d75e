"""Dataset downloaders with byte-range resume.

Rebuild of the reference download stack (dataset.py:35-122): a resumable
HTTP downloader with a tqdm progress bar, a URL-list helper, the 4-video
sample dataset (Google sample videos), and the COCO per-image downloader
driven by ``image_info_test2017.json``.

Failure semantics kept from the reference: interrupted downloads resume from
the current file size via a Range header (dataset.py:42-48); already-complete
files are skipped.
"""

from __future__ import annotations

import json
import os
from typing import List

from styletransfer_tpu import constants
from styletransfer_tpu.utils.logging import get_logger

# Dataset locations (reference dataset.py:27-32).
BASE_COCO_PATH = "data/coco_dataset/"
IMAGE_FOLDER_PATH = os.path.join(BASE_COCO_PATH, "images")
VIDEO_DATA_PATH = "data/video/"

SAMPLE_VIDEO_URLS = [
    "http://commondatastorage.googleapis.com/gtv-videos-bucket/sample/BigBuckBunny.mp4",
    "http://commondatastorage.googleapis.com/gtv-videos-bucket/sample/ElephantsDream.mp4",
    "http://commondatastorage.googleapis.com/gtv-videos-bucket/sample/Sintel.mp4",
    "http://commondatastorage.googleapis.com/gtv-videos-bucket/sample/TearsOfSteel.mp4",
]


def _abspath(path: str) -> str:
    return path if os.path.isabs(path) else os.path.join(constants.PROJECT_ROOT_PATH, path)


# (connect, read) timeouts so a dead network fails fast instead of hanging
# training startup (VideoDataset.__init__ calls download_videos_dataset).
_TIMEOUT = (10, 30)
_MAX_ATTEMPTS = 3


def download_from_url(url: str, dst: str) -> int:
    """Resumable single-file download (reference dataset.py:35-59).

    HEADs for Content-Length, resumes from the local size with an
    open-ended Range header (the reference's ``bytes=N-size`` end offset is
    one past the last byte; strict servers reject it with 416), streams in
    chunks with a progress bar, and retries transient failures up to
    :data:`_MAX_ATTEMPTS` times — each retry resumes from the bytes already
    on disk. Returns total size.
    """
    import requests
    from tqdm import tqdm

    # allow_redirects: HEAD does NOT follow redirects by default, so a
    # 301/302 would yield the redirect's headers — a missing
    # Content-Length (KeyError) or a bogus 0 that instantly reports an
    # empty file "complete".
    head = requests.head(url, timeout=_TIMEOUT, allow_redirects=True)
    head.raise_for_status()
    file_size = int(head.headers["Content-Length"])
    last_exc: Exception = OSError(f"download of {url} incomplete after retries")
    for attempt in range(_MAX_ATTEMPTS):
        first_byte = os.path.getsize(dst) if os.path.exists(dst) else 0
        if first_byte >= file_size:
            return file_size
        pbar = None
        try:
            header = {"Range": f"bytes={first_byte}-"}
            pbar = tqdm(total=file_size, initial=first_byte, unit="B",
                        unit_scale=True, desc=url.split("/")[-1])
            req = requests.get(url, headers=header, stream=True, timeout=_TIMEOUT)
            # An error status (503/404) would stream an HTML body into the
            # file; and a 200 means the server ignored our Range — its
            # full-content body must overwrite, not append after, the
            # partial bytes (appending would duplicate the prefix and
            # still satisfy the size check).
            req.raise_for_status()
            resumed = first_byte > 0 and req.status_code == 206
            if first_byte > 0 and not resumed:
                get_logger().warning(
                    "Server ignored Range for %s (status %d); restarting "
                    "from byte 0.", url, req.status_code,
                )
                pbar.reset(total=file_size)
            with open(dst, "ab" if resumed or first_byte == 0 else "wb") as f:
                for chunk in req.iter_content(chunk_size=64 * 1024):
                    if chunk:
                        f.write(chunk)
                        pbar.update(len(chunk))
        except (requests.RequestException, OSError) as exc:
            last_exc = exc
            get_logger().warning(
                "Download of %s interrupted (attempt %d/%d): %s",
                url, attempt + 1, _MAX_ATTEMPTS, exc,
            )
            continue
        finally:
            if pbar is not None:
                pbar.close()  # a failed attempt must not leak its bar
        if os.path.getsize(dst) >= file_size:
            return file_size
    raise last_exc


def download_list_of_urls(urls: List[str], destination_folder: str = VIDEO_DATA_PATH) -> None:
    """Download a list of URLs (reference dataset.py:62-83)."""
    destination_folder = _abspath(destination_folder)
    os.makedirs(destination_folder, exist_ok=True)
    name_counter = 0
    for url in urls:
        filename = url.split("/")[-1]
        if not filename or len(filename) > 64:
            filename = f"{name_counter}.mp4"
            name_counter += 1
        download_from_url(url, os.path.join(destination_folder, filename))


def download_videos_dataset() -> None:
    """Ensure the 4 sample videos are present (reference dataset.py:86-103)."""
    path = _abspath(VIDEO_DATA_PATH)
    os.makedirs(path, exist_ok=True)
    # Always run the per-file check (4 cheap HEADs): a bare directory
    # COUNT gate would skip the byte-range resume that repairs a file
    # truncated by a killed earlier download. Offline environments fail
    # the first HEAD and fall through to the warning as before.
    try:
        download_list_of_urls(SAMPLE_VIDEO_URLS, VIDEO_DATA_PATH)
    except Exception as exc:  # noqa: BLE001 - offline environments
        get_logger().warning(
            "Could not download sample videos (%s); the video dataset "
            "falls back to synthetic clips if none are present.", exc,
        )


def download_coco_images() -> None:
    """Ensure COCO images are present (reference dataset.py:106-122).

    Reads ``image_info_test2017.json`` for per-image URLs. If the manifest is
    missing (it is not shipped — reference ``.MISSING_LARGE_BLOBS``) or the
    network is unreachable, logs and returns; the loader then uses whatever
    images exist or the synthetic fallback.
    """
    json_file_path = _abspath(os.path.join(BASE_COCO_PATH, "image_info_test2017.json"))
    image_dir = _abspath(IMAGE_FOLDER_PATH)
    os.makedirs(image_dir, exist_ok=True)
    if not os.path.isfile(json_file_path):
        get_logger().info(
            "COCO manifest %s not found; skipping download.", json_file_path
        )
        return
    with open(json_file_path) as f:
        images_urls = [x["coco_url"] for x in json.load(f)["images"]]
    # The directory-count gate is a deliberate tradeoff at COCO scale:
    # per-file verification would HEAD tens of thousands of URLs on every
    # training start. A file truncated by a killed download slips through
    # — and is then handled downstream, where the loader substitutes
    # unreadable images (data/coco.py). The 4-video dataset above, where
    # verification is cheap, always verifies.
    if len(images_urls) != len(os.listdir(image_dir)):
        try:
            download_list_of_urls(images_urls, IMAGE_FOLDER_PATH)
        except Exception as exc:  # noqa: BLE001
            get_logger().warning("COCO download interrupted/unavailable: %s", exc)
