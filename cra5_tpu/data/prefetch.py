"""Host-side async data feed: thread-pool prefetch + device transfer.

TPU-first replacement for the reference's multiprocessing shared-memory
pipeline (/root/reference/cra5/dataset/cra5_base.py:218-263: index queue
-> per-channel loader procs -> compound queue, fixed 20-slot PID table).
A thread pool overlaps NetCDF/npy reads with device compute, and
completed batches are moved to device (optionally with a sharding) ahead
of consumption — double buffering hides H2D latency behind the step.
"""

from __future__ import annotations

import concurrent.futures as _fut
import itertools
from typing import Any, Callable, Iterable, Iterator, Optional, Sequence

import numpy as np


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    key: str = "inputs",
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    epochs: Optional[int] = 1,
) -> Iterator[np.ndarray]:
    """Yield (B, C, H, W) batches from an indexable dataset whose items
    are dicts with ``key`` -> (T, C, H, W); the first sequence step is
    used (codec training consumes single timesteps)."""
    n = len(dataset)
    rng = np.random.default_rng(seed)
    epoch_iter = range(epochs) if epochs is not None else itertools.count()
    for _ in epoch_iter:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for i in range(0, n, batch_size):
            idx = order[i : i + batch_size]
            if len(idx) < batch_size and drop_last:
                continue
            items = [dataset[int(j)] for j in idx]
            arrs = [
                it[key][0] if isinstance(it, dict) else np.asarray(it) for it in items
            ]
            yield np.stack(arrs)


class PrefetchLoader:
    """Wrap any batch iterable: a producer thread keeps ``depth`` batches
    loaded (and optionally transferred to device) ahead of the consumer."""

    def __init__(
        self,
        batches: Iterable,
        depth: int = 2,
        to_device: Optional[Callable[[np.ndarray], Any]] = None,
    ):
        self.batches = batches
        self.depth = max(1, depth)
        self.to_device = to_device

    def __iter__(self):
        import queue as _queue
        import threading

        put = self.to_device or (lambda x: x)
        q: _queue.Queue = _queue.Queue(maxsize=self.depth)
        _END = object()

        def producer():
            try:
                for batch in self.batches:
                    q.put(put(batch))
            except BaseException as e:  # surfaced on the consumer side
                q.put(("__error__", e))
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
                raise item[1]
            yield item
        t.join()
