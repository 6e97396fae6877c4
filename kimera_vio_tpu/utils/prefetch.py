"""Host-side prefetch queue: the dataprovider thread of the TPU pipeline.

The reference overlaps dataset IO with compute by running the data provider
on its own thread, pushing into bounded ThreadsafeQueues
(utils/ThreadsafeQueue.h, Pipeline.cpp:318 pushBlockingIfFull(5)). Here the
same role is one background thread that decodes images ahead of the device
and hands packets through a bounded queue — backpressure included (put()
blocks when the device falls behind).
"""

from __future__ import annotations

import queue
import threading


class PrefetchIterator:
    """Wraps a packet iterator; `transform` runs on the worker thread
    (image decode + any host preprocessing)."""

    _DONE = object()

    def __init__(self, iterator, transform, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._exc = None

        def work():
            try:
                for item in iterator:
                    self._q.put(transform(item))
            except Exception as e:  # surface on the consumer side
                self._exc = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item
