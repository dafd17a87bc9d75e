"""Host -> device prefetch: keep the TPU fed while the host decodes.

The reference's input pipeline decodes synchronously inside the training
loop (dataset.py:344-358, ``num_workers=0``), serializing host decode with
device compute. Here a background thread pulls batches from the (already
thread-decoded) loader and issues asynchronous sharded ``device_put``s a few
batches ahead, so HBM always holds the next batch when the jitted step
finishes the current one.

The generator cleans up after itself: if the consumer abandons it early
(``break``, exception, ``max_steps_per_epoch``), the producer thread is
signalled to stop and the queued device batches are released — no leaked
threads or pinned HBM across epochs.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

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
    stop = threading.Event()
    err: list = []

    def _put(item) -> bool:
        """Blocking put that gives up when the consumer has stopped."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer() -> None:
        try:
            for batch in iterable:
                if not _put(mesh_lib.shard_batch(batch, mesh, axis_name)):
                    return
        except Exception as exc:  # noqa: BLE001 - re-raised on consumer side
            err.append(exc)
        finally:
            _put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # Consumer is done (normally or abandoned): unblock + stop producer
        # and drop any queued device batches so HBM is released.
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        thread.join(timeout=5)
