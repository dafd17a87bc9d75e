#!/usr/bin/env python
"""Turnkey pretrained-VGG19 weights: download or convert, validate, install.

The perceptual losses use torchvision's pretrained VGG19 ``features``
(reference network.py:246-252, downloaded implicitly by torchvision). In a
zero-egress environment the framework falls back to seeded random VGG
weights (models/vgg.py:load_params) — numerically identical compute, but
perceptual *quality* needs the real weights. This script makes installing
them one command:

    # with network access — downloads from the torchvision URL + verifies:
    python scripts/fetch_vgg19.py

    # air-gapped — convert a .pth you copied in by hand:
    python scripts/fetch_vgg19.py --source /path/to/vgg19-dcbb9e9d.pth

Output: ``data/models/vgg19.npz`` (found automatically by
``vgg.load_params``; no env var needed). The torch checkpoint's SHA-256 is
validated against the known torchvision digest prefix (the ``dcbb9e9d`` in
the canonical filename) unless ``--no-verify`` is passed; structure is
always validated (16 convs, exact shapes).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

VGG19_URL = "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth"
# torchvision encodes the SHA-256 prefix in the filename.
SHA256_PREFIX = "dcbb9e9d"

# (module index, out_channels) of every conv in torchvision vgg19().features.
_CONV_LAYOUT = (
    (0, 64), (2, 64), (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256), (16, 256),
    (19, 512), (21, 512), (23, 512), (25, 512),
    (28, 512), (30, 512), (32, 512), (34, 512),
)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _download(url: str, dst: str) -> str:
    from styletransfer_tpu.data.download import download_from_url

    os.makedirs(os.path.dirname(dst), exist_ok=True)
    download_from_url(url, dst)
    return dst


def _validate_structure(sd) -> None:
    cin = 3
    for idx, cout in _CONV_LAYOUT:
        for key in (f"features.{idx}.weight", f"{idx}.weight"):
            if key in sd:
                w = sd[key]
                break
        else:
            raise SystemExit(f"not a torchvision VGG19 state dict: missing conv {idx}")
        shape = tuple(w.shape)
        if shape != (cout, cin, 3, 3):
            raise SystemExit(
                f"conv {idx} has shape {shape}, expected {(cout, cin, 3, 3)}"
            )
        cin = cout


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", default=None,
                    help="existing vgg19 .pth (skips the download)")
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "data", "models", "vgg19.npz"))
    ap.add_argument("--url", default=VGG19_URL)
    ap.add_argument("--no-verify", action="store_true",
                    help="skip the SHA-256 digest check (structure is still validated)")
    args = ap.parse_args()

    src = args.source
    if src is None:
        src = os.path.join(REPO_ROOT, "data", "models", "vgg19-dcbb9e9d.pth")
        if not os.path.isfile(src):
            print(f"downloading {args.url} ...")
            try:
                _download(args.url, src)
            except Exception as exc:  # noqa: BLE001
                raise SystemExit(
                    f"download failed ({exc}). In an air-gapped environment, "
                    f"copy the file in by hand and run:\n"
                    f"  python scripts/fetch_vgg19.py --source /path/to/vgg19-dcbb9e9d.pth"
                )

    if not args.no_verify:
        digest = _sha256(src)
        if not digest.startswith(SHA256_PREFIX):
            raise SystemExit(
                f"SHA-256 mismatch for {src}: got {digest[:16]}..., expected "
                f"prefix {SHA256_PREFIX} (torchvision vgg19). Pass --no-verify "
                f"to convert anyway (e.g. for custom fine-tuned weights)."
            )
        print(f"SHA-256 verified ({digest[:16]}...)")

    import torch

    sd = torch.load(src, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v.numpy()) for k, v in sd.items()}
    _validate_structure(sd)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **sd)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")

    # Smoke-load through the framework's importer. Force the CPU backend
    # first: the load only checks structure/shapes, and on a host with a
    # tunneled TPU attached, initializing that backend here costs minutes
    # of tunnel round-trips for zero benefit (JAX_PLATFORMS=cpu is not
    # honored by such backends; the config update is).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from styletransfer_tpu.models import vgg

    params = vgg.load_params(args.out)
    n = sum(int(np.prod(p.shape)) for layer in params.values() for p in layer.values())
    print(f"vgg.load_params OK — {len(params)} tapped convs, {n:,} params")
    print("Pretrained weights installed; every CLI run now picks them up "
          "automatically (vgg.load_params search path).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
