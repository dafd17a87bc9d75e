"""Low-level compute: layers, losses, and Pallas TPU kernels."""

from styletransfer_tpu.ops import layers, losses  # noqa: F401
