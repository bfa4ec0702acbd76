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
    to `depth` batches in flight. Exceptions in the producer propagate.

    Cancellation-safe: when the consumer abandons the generator (break out
    of the epoch loop, an exception in the train step, GC), the producer is
    signalled to stop — otherwise it would block on the full queue forever,
    pinning `depth` device-resident batches in HBM per abandoned epoch."""

    q = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                if transform is not None:
                    batch = transform(batch)
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                if not _put(batch):
                    return
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            _put(e)
            return
        _put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer done or abandoned: release the producer and drop any
        # staged batches so their device buffers free immediately
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5)
