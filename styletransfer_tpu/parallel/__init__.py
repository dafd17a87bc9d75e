"""Device mesh, sharding helpers, and host->device prefetch."""

from styletransfer_tpu.parallel import mesh, prefetch  # noqa: F401
