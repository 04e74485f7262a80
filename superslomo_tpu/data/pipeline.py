"""Batching loader + device prefetch.

Replaces the reference's 12-process torch DataLoader with pinned memory
(default_reader.py:289-311, main.py:188-190) with a TPU-native feed:

* a thread pool decodes/transforms samples (cv2 releases the GIL during
  imdecode, so threads parallelize well without process-fork overhead);
* ``prefetch_to_device`` keeps N batches in flight with ``jax.device_put``
  so the host→HBM copy of batch k+1 overlaps step k's compute — the
  double-buffered prefetch of BASELINE.json config 5.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np


def _collate(samples: Sequence[tuple]) -> tuple:
    """Stack a list of per-sample tuples into batched numpy arrays
    (ints collate to an int array)."""
    out = []
    for parts in zip(*samples):
        if isinstance(parts[0], np.ndarray):
            out.append(np.stack(parts))
        else:
            out.append(np.asarray(parts))
    return tuple(out)


class Loader:
    """Iterable over shuffled, collated batches of a Reader.

    Determinism contract: every item draws from its own child generator
    seeded by ``(seed, epoch, index)``, so batches are bit-identical for any
    ``num_threads`` (NumPy Generators are not thread-safe; sharing one across
    pool workers corrupts the reversal/crop statistics). The reference's
    analogue is per-DataLoader-worker process reseeding
    (default_reader.py:306); per-item spawning is stronger — thread-count
    independent."""

    def __init__(self, reader, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_threads: int = 4,
                 seed: int = 0):
        self.reader = reader
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.seed = seed
        self._epoch = 0
        self._takes_rng = None  # lazily probed: reader.__getitem__(idx, rng=)

    def __len__(self):
        n = len(self.reader)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _fetch(self, idx: int, epoch: int):
        if self._takes_rng is None:
            import inspect

            try:
                sig = inspect.signature(self.reader.__getitem__)
                self._takes_rng = "rng" in sig.parameters
            except (TypeError, ValueError):
                self._takes_rng = False
        if not self._takes_rng:
            return self.reader[idx]
        rng = np.random.default_rng([self.seed, epoch, idx])
        return self.reader.__getitem__(idx, rng=rng)

    def __iter__(self) -> Iterator[tuple]:
        n = len(self.reader)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng([self.seed, self._epoch]).shuffle(order)
        epoch = self._epoch
        self._epoch += 1

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, n, self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_threads == 1:
            for b in batches:
                yield _collate([self._fetch(int(i), epoch) for i in b])
            return

        with ThreadPoolExecutor(self.num_threads) as pool:
            # pipeline two batches ahead
            pending = []
            it = iter(batches)

            def submit(b):
                return [pool.submit(self._fetch, int(i), epoch) for i in b]

            for _ in range(2):
                b = next(it, None)
                if b is not None:
                    pending.append(submit(b))
            while pending:
                futs = pending.pop(0)
                b = next(it, None)
                if b is not None:
                    pending.append(submit(b))
                yield _collate([f.result() for f in futs])


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator with an N-deep device_put pipeline.

    :param sharding: optional jax.sharding.Sharding (e.g. batch-sharded
        NamedSharding) applied in device_put — the multi-chip feed path.
        A tuple of shardings applies element-wise to each batch tuple entry
        (e.g. spatially-sharded frames vs batch-only t).
    """
    import jax

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def _put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        if isinstance(sharding, tuple):
            return tuple(jax.device_put(x, s) for x, s in zip(batch, sharding))
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    def producer():
        try:
            for batch in iterator:
                q.put(_put(batch))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
