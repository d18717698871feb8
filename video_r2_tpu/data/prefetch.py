"""Host-side prefetching input pipeline.

The reference leans on torch DataLoader worker processes for video decode
(SURVEY §3.1 'dataloader video decode is the host-side bottleneck'). Here:
a thread-pool prefetcher — cv2/PIL release the GIL during decode/draw, so
threads give process-worker throughput without pickling tensors across
process boundaries, and batches land as numpy ready for one host->HBM copy.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Sequence


class PrefetchLoader:
    """Runs `make_batch(indices)` on worker threads for each element of
    `batch_indices`, yielding results in order, up to `prefetch` ahead."""

    def __init__(self, batch_indices: Iterable[Sequence[int]],
                 make_batch: Callable[[Sequence[int]], object],
                 num_workers: int = 2, prefetch: int = 2):
        self._make_batch = make_batch
        # `prefetch` bounds COMPLETED batches ahead of the consumer, not just
        # queued jobs — without it a fast host fills _pending with the whole
        # dataset's prepared arrays while the device lags
        self._max_ahead = max(prefetch, 1)
        self._jobs: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
        self._stop = threading.Event()
        self._total: int | None = None
        self._next_emit = 0
        self._pending: dict[int, object] = {}
        self._cv = threading.Condition()
        self._indices = batch_indices
        self._feeder = threading.Thread(target=self._feed, daemon=True)
        self._workers = [threading.Thread(target=self._work, daemon=True)
                         for _ in range(num_workers)]
        self._feeder.start()
        for w in self._workers:
            w.start()

    def _feed(self):
        n = 0
        for idx in self._indices:
            if self._stop.is_set():
                return
            self._jobs.put((n, idx))
            n += 1
        with self._cv:
            self._total = n
            self._cv.notify_all()
        for _ in self._workers:
            self._jobs.put(None)

    def _work(self):
        while not self._stop.is_set():
            job = self._jobs.get()
            if job is None:
                return
            seq, idx = job
            with self._cv:  # backpressure: stay <= prefetch ahead
                while (seq >= self._next_emit + self._max_ahead
                       and not self._stop.is_set()):
                    self._cv.wait(timeout=0.1)
            if self._stop.is_set():
                return
            try:
                batch = self._make_batch(idx)
            except Exception as e:  # surface errors to the consumer
                batch = e
            with self._cv:
                self._pending[seq] = batch
                self._cv.notify_all()

    def __iter__(self):
        return self

    def __next__(self):
        with self._cv:
            while True:
                if self._total is not None and self._next_emit >= self._total:
                    raise StopIteration
                if self._next_emit in self._pending:
                    batch = self._pending.pop(self._next_emit)
                    self._next_emit += 1
                    self._cv.notify_all()  # wake backpressured workers
                    break
                self._cv.wait(timeout=0.1)
        if isinstance(batch, Exception):
            raise batch
        return batch

    def poll(self):
        """Non-blocking __next__: the next in-order batch if it is already
        prepared, else None (StopIteration when exhausted). Lets a consumer
        that has other work (e.g. a decode step) admit input only when ready
        instead of stalling on host preprocessing."""
        with self._cv:
            if self._total is not None and self._next_emit >= self._total:
                raise StopIteration
            if self._next_emit not in self._pending:
                return None
            batch = self._pending.pop(self._next_emit)
            self._next_emit += 1
            self._cv.notify_all()  # wake backpressured workers
        if isinstance(batch, Exception):
            raise batch
        return batch

    def close(self):
        self._stop.set()
