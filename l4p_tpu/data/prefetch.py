"""Background-thread batch prefetcher.

The reference relies on torch DataLoader workers; here a small thread pool
decodes/preprocesses ahead of the accelerator so host work overlaps device
steps (the C++ preprocessing in l4p_tpu.native does the heavy per-frame
work inside these threads without holding the GIL).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional


class PrefetchIterator:
    """Wrap `make_item(i)` in `num_threads` workers with a bounded queue,
    preserving order."""

    def __init__(self, make_item: Callable[[int], Dict], length: int,
                 num_threads: int = 2, buffer: int = 4):
        self.make_item = make_item
        self.length = length
        self.buffer = buffer
        self.num_threads = max(1, num_threads)
        self._results: Dict[int, Dict] = {}
        self._cv = threading.Condition()
        self._next_submit = 0
        self._stop = False
        self._threads = [
            threading.Thread(target=self._worker, daemon=True) for _ in range(self.num_threads)
        ]
        for t in self._threads:
            t.start()

    def _worker(self):
        while True:
            with self._cv:
                while not self._stop and (
                    self._next_submit >= self.length or len(self._results) >= self.buffer + self.num_threads
                ):
                    self._cv.wait(timeout=0.1)
                    if self._stop:
                        return
                if self._stop or self._next_submit >= self.length:
                    if self._next_submit >= self.length:
                        return
                    continue
                idx = self._next_submit
                self._next_submit += 1
            item = self.make_item(idx)
            with self._cv:
                self._results[idx] = item
                self._cv.notify_all()

    def __iter__(self) -> Iterator[Dict]:
        for i in range(self.length):
            with self._cv:
                while i not in self._results:
                    self._cv.wait(timeout=0.1)
                item = self._results.pop(i)
                self._cv.notify_all()
            yield item
        self.close()

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()


def prefetch_dataset(dataset, num_threads: int = 2, buffer: int = 4, collate_fn=None):
    """Iterate a dataset with background preprocessing."""
    from l4p_tpu.data.dataset import collate

    cf = collate_fn or collate
    return PrefetchIterator(lambda i: cf(dataset[i]), len(dataset), num_threads, buffer)
