"""Background-thread batch prefetcher.

The reference imports tensorpack's `PrefetchDataZMQ` but never uses it
(`core/datasets.py:25`, SURVEY.md §2.3) — loading is serial with the train
step.  Here a daemon thread keeps a small queue of ready host batches so
IO/augmentation overlaps device compute; with on-device pair generation
(`data/pairgen.py`) the host work per step drops to load+normalize and
hides entirely behind the device step.
"""

from __future__ import annotations

import queue
import threading


class _Sentinel:
    pass


_END = _Sentinel()


class ThreadedPrefetcher:
    """Wraps an iterator; a daemon thread pre-computes up to `depth` items.

    Exceptions raised by the source iterator propagate to the consumer at
    the point of `next()`.  Iteration order is preserved.
    """

    def __init__(self, iterator, depth=2):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._iterator = iter(iterator)
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        try:
            for item in self._iterator:
                self._queue.put(item)
        except BaseException as e:  # propagate to the consumer
            self._queue.put(e)
            return
        self._queue.put(_END)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _END:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item
