"""Host→device input prefetching.

The reference overlaps input work with compute via DataLoader worker
processes + MpDeviceLoader on the TorchAcc path (reference core/trainer.py
:215-218). Here: a background thread featurises and `device_put`s the next
`depth` batches while the current step runs, so the chip never waits on the
host (SURVEY.md §7.3 host-throughput note)."""

import queue
import threading

import jax

_SENTINEL = object()


def device_prefetch(iterator, sharding=None, depth=2, transform=None):
    """Wrap a host batch iterator: yields device-resident batches, keeping up
    to `depth` batches in flight. Exceptions in the producer propagate."""

    q = queue.Queue(maxsize=depth)

    def producer():
        try:
            for batch in iterator:
                if transform is not None:
                    batch = transform(batch)
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                q.put(batch)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            q.put(e)
            return
        q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
