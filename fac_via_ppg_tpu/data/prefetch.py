"""Host->device prefetching.

The north-star design calls for "host-side protobuf utterance loading
overlapped via device prefetch": while the TPU executes step N, the host
collates and transfers batch N+1.  JAX's async dispatch gives compute
overlap for free; this adds the missing piece — collation and H2D transfer
running in a background thread ahead of consumption.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class PrefetchIterator:
    """Wrap a batch iterable; materialize up to `depth` batches ahead.

    `place` (e.g. `lambda b: shard_batch(mesh, b)`) runs inside the worker
    thread so device_put overlaps with the consumer's step execution.
    """

    _SENTINEL = object()

    def __init__(self, iterable: Iterable, place: Optional[Callable] = None,
                 depth: int = 2):
        self._iterable = iterable
        self._place = place or (lambda x: x)
        self._depth = depth

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        error = []
        abandoned = threading.Event()

        def put(item) -> bool:
            # bounded put so an abandoned consumer (exception mid-epoch)
            # cannot leave the worker blocked forever holding device batches
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self._iterable:
                    if not put(self._place(item)):
                        return
            except BaseException as e:  # surface worker errors to consumer
                error.append(e)
            finally:
                put(self._SENTINEL)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            abandoned.set()


def prefetch(iterable: Iterable, place: Optional[Callable] = None,
             depth: int = 2) -> PrefetchIterator:
    return PrefetchIterator(iterable, place, depth)
