"""styletransfer_tpu — a TPU-native (JAX / XLA / Pallas) style transfer framework.

A ground-up rebuild of the capabilities of the reference PyTorch project
tupini07/StyleTransfer (Gatys optimization-based transfer, fast feed-forward
transfer, and video transfer with temporal consistency) designed for TPU:
pure-functional models, single jitted train/optimize steps with no host
round-trips, data parallelism over a ``jax.sharding.Mesh``, Pallas kernels
for the hot fused ops, and a host-decode -> device-prefetch input pipeline.

Top-level layout:
- ``ops``       low-level layers, losses, Pallas kernels
- ``models``    VGG19 feature taps, image/video transform nets
- ``engines``   gatys / fast / video train + inference drivers
- ``data``      COCO and video datasets, downloaders, prefetch
- ``parallel``  mesh + sharding helpers
- ``utils``     logging, image/video IO, TensorBoard writer, config
- ``clis``      ``python -m styletransfer_tpu <group> <task>`` (same CLI
  contract as the reference ``python -m stransfer``)
"""

__version__ = "0.1.0"

# Cache compiled XLA programs across processes (minutes per compile through
# a tunneled backend; config-only side effect, opt out via STX_NO_COMPILE_CACHE).
from styletransfer_tpu.utils.cache import enable_persistent_cache as _epc

_epc()
del _epc

__all__ = [
    "constants",
    "ops",
    "models",
    "engines",
    "data",
    "parallel",
    "utils",
    "clis",
]
