"""Batch iteration: per-flow loaders + min-size multi-flow combination.

Replaces the reference's torch DataLoader + Lightning `CombinedLoader
(mode="min_size")` (plangen_base.py:1040) with a simple numpy batcher:
shuffled epoch order per flow, one dict of flow batches per step, epoch ends
when the SHORTEST flow is exhausted (min_size semantics). Data-parallel
sharding happens downstream by device_put with a NamedSharding — each batch
is globally sized (per-flow batch_size x dp) like the reference's per-process
loaders combined.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List

import numpy as np


class BatchLoader:
    """Shuffling epoch iterator yielding lists of samples."""

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[List[Any]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        batch: List[Any] = []
        for idx in order:
            batch.append(self.dataset[int(idx)])
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch


class CombinedLoader:
    """min_size combination of several flow loaders: yields
    {flow_id: batch} until the shortest flow is exhausted."""

    def __init__(self, loaders: Dict[int, BatchLoader]):
        self.loaders = loaders

    def __len__(self):
        return min(len(l) for l in self.loaders.values())

    def __iter__(self):
        iters = {fid: iter(l) for fid, l in self.loaders.items()}
        while True:
            out = {}
            try:
                for fid, it in iters.items():
                    out[fid] = next(it)
            except StopIteration:
                return
            yield out


def infinite(loader) -> Iterator:
    """Endless epochs (the reference steps a fixed max_train_steps)."""
    while True:
        yield from loader
