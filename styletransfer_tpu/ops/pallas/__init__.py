"""Pallas TPU kernels for the hot fused ops.

These replace multi-pass XLA lowerings with single-VMEM-pass kernels:
instance-norm(+ReLU)(+residual-add) — the bandwidth hot spot of the
transform nets. Every kernel has a pure-XLA fallback and is validated
against it in tests (interpret mode on CPU).
"""

from styletransfer_tpu.ops.pallas.instance_norm import (  # noqa: F401
    fused_instance_norm,
)
