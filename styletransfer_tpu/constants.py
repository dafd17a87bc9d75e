"""Global constants for the TPU-native style transfer framework.

Mirrors the contract of the reference ``stransfer/constants.py`` (reference
``constants.py:1-32``): run/log paths, ImageNet normalization statistics, the
working resolution, and the project root. Unlike the reference there is no
global device side effect at import time — device/mesh selection is explicit
and functional (see :mod:`styletransfer_tpu.parallel.mesh`).
"""

from __future__ import annotations

import os

# Where information about runs is saved (runtime log + TensorBoard events).
# Reference: constants.py:10-12.
RUNS_PATH = "runs/"
LOG_PATH = os.path.join(RUNS_PATH, "runtime.log")

# ImageNet statistics used to normalize inputs / denormalize outputs.
# Reference: constants.py:16-17.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Working resolution: inputs are center-cropped square then resized to
# IMSIZE x IMSIZE. Reference: constants.py:30.
IMSIZE = 256

# Repository root (directory containing this package).
# Reference: constants.py:32.
# STX_PROJECT_ROOT relocates every derived path (data/, results/, runs/) —
# for deployments that install the package site-wide, and for end-to-end
# tests that sandbox a real `python -m styletransfer_tpu` subprocess.
PROJECT_ROOT_PATH = os.environ.get("STX_PROJECT_ROOT") or os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)

# Default location for model checkpoints (reference uses data/models/ —
# network.py:677, 957).
MODELS_PATH = "data/models/"

# Default dtypes. Convolution FLOPs run on the MXU; bfloat16 inputs with
# float32 accumulation is the TPU-native fast path. Losses and optimizer
# state stay in float32.
DEFAULT_COMPUTE_DTYPE = "float32"
DEFAULT_PARAM_DTYPE = "float32"
