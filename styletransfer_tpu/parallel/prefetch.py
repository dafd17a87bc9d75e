"""Host -> device prefetch: keep the TPU fed while the host decodes.

The reference's input pipeline decodes synchronously inside the training
loop (dataset.py:344-358, ``num_workers=0``), serializing host decode with
device compute. Here a background thread pulls batches from the (already
thread-decoded) loader and issues asynchronous sharded ``device_put``s a few
batches ahead, so HBM always holds the next batch when the jitted step
finishes the current one.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

from jax.sharding import Mesh

from styletransfer_tpu.parallel import mesh as mesh_lib

_SENTINEL = object()


def prefetch_to_device(
    iterable: Iterable,
    mesh: Mesh,
    size: int = 2,
    axis_name: str = mesh_lib.DATA_AXIS,
) -> Iterator:
    """Wrap a host batch iterator with a device-prefetch queue of ``size``.

    Each yielded element is already device-resident and sharded across the
    mesh's data axis. Errors in the producer propagate to the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []

    def producer() -> None:
        try:
            for batch in iterable:
                q.put(mesh_lib.shard_batch(batch, mesh, axis_name))
        except Exception as exc:  # noqa: BLE001 - re-raised on consumer side
            err.append(exc)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item


def prefetch_iter(iterable: Iterable, size: int = 2) -> Iterator:
    """Plain lookahead prefetch (no device transfer) for host-side stages."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []

    def producer() -> None:
        try:
            for item in iterable:
                q.put(item)
        except Exception as exc:  # noqa: BLE001
            err.append(exc)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
