"""Batching + prefetch for SR training/eval.

Replaces the reference's torch DataLoader stack (``sr_datamodule.py:137-162``:
16 forked workers, shuffle, per-scale dict collation) with an explicit
thread-pooled prefetcher feeding stacked numpy batches:

- training epoch = shuffled indices over ``len(dataset) * repeat`` (the
  reference's ConcatDataset x20, ``sr_datamodule.py:108``), batched into
  ``{scale: (lr[B,...], hr[B,...])}`` with static shapes per scale;
- eval = batch-1 full images in order (``sr_datamodule.py:146-162``).

Per-sample RNG streams are derived from (seed, epoch, global index) so any
host/worker produces identical data for a given index — this is what makes
multi-host sharding trivial: host h takes indices h::num_hosts.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

Batch = Dict[float, Tuple[np.ndarray, np.ndarray]]


def _sample_rng(seed: int, epoch: int, index: int) -> np.random.Generator:
    return np.random.default_rng(
        np.random.SeedSequence([seed, epoch, index]))


def _bounded_map(pool: ThreadPoolExecutor, fn, items, bound: int):
    """Ordered ``pool.map`` with at most ``bound`` tasks in flight.

    ``Executor.map`` submits every task eagerly, so on an epoch-scale
    iterable completed-but-unconsumed results pile up in host RAM whenever
    the consumer (the train step) is slower than the loader threads. This
    keeps a fixed-size submission window instead: host memory is bounded by
    ``bound`` decoded samples regardless of epoch length.
    """
    items = list(items)
    inflight: deque = deque()
    nxt = 0
    try:
        while nxt < len(items) or inflight:
            while nxt < len(items) and len(inflight) < bound:
                inflight.append(pool.submit(fn, items[nxt]))
                nxt += 1
            yield inflight.popleft().result()
    finally:
        for f in inflight:
            f.cancel()


def train_batches(dataset, *, batch_size: int, epoch: int, seed: int = 123,
                  repeat: int = 1, num_workers: int = 8,
                  shard_index: int = 0, num_shards: int = 1,
                  drop_last: bool = True) -> Iterator[Batch]:
    """Shuffled, repeated, sharded, prefetched training batches."""
    n = len(dataset) * repeat
    order = np.random.default_rng(
        np.random.SeedSequence([seed, epoch])).permutation(n)
    if num_shards > 1:
        # Truncate the GLOBAL order to a multiple of num_shards*batch before
        # sharding: every host then yields exactly the same number of
        # batches per epoch. Sharding first and dropping the remainder per
        # host can give hosts different step counts when len(order) isn't
        # divisible — one host would enter the next collective alone and
        # hang the whole job at epoch end.
        stride = num_shards * batch_size
        order = order[:(len(order) // stride) * stride]
    order = order[shard_index::num_shards]
    usable = (len(order) // batch_size) * batch_size if drop_last else len(order)
    order = order[:usable]

    def load(i):
        gidx = int(order[i])
        return dataset.sample(gidx % len(dataset),
                              _sample_rng(seed, epoch, gidx))

    workers = max(1, num_workers)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        bound = max(2 * workers, 2 * batch_size)
        buf = []
        for sample in _bounded_map(pool, load, range(len(order)), bound):
            buf.append(sample)
            if len(buf) == batch_size:
                yield _collate(buf)
                buf = []
        if buf and not drop_last:
            yield _collate(buf)


def _collate(samples) -> Batch:
    scales = samples[0].keys()
    return {
        s: (np.stack([smp[s][0] for smp in samples]).astype(np.float32),
            np.stack([smp[s][1] for smp in samples]).astype(np.float32))
        for s in scales
    }


def eval_batches(dataset, *, seed: int = 123,
                 indices: Optional[range] = None,
                 num_workers: int = 4) -> Iterator[Tuple[int, dict]]:
    """Full-image, batch-1 eval samples in dataset order."""
    idxs = list(indices if indices is not None else range(len(dataset)))

    def load(i):
        return i, dataset.sample(i, _sample_rng(seed, 0, i))

    workers = max(1, num_workers)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for i, sample in _bounded_map(pool, load, idxs, 2 * workers):
            yield i, {s: (lr[None], hr[None], name)
                      for s, (lr, hr, name) in sample.items()}
