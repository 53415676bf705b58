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

        def worker():
            try:
                for item in self._iterable:
                    q.put(self._place(item))
            except BaseException as e:  # surface worker errors to consumer
                error.append(e)
            finally:
                q.put(self._SENTINEL)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if error:
                    raise error[0]
                return
            yield item


def prefetch(iterable: Iterable, place: Optional[Callable] = None,
             depth: int = 2) -> PrefetchIterator:
    return PrefetchIterator(iterable, place, depth)
