"""Host-side data feeding for memory-mapped vector datasets.

Re-designs the reference's torch-DataLoader stack (reference:
qinco/datasets.py:23-134) for a static-shape JAX pipeline:

- Batches are always exactly ``batch`` rows; the final partial batch is
  zero-padded and accompanied by its valid-row count so jitted consumers
  keep one compiled shape (the reference relies on dynamic last batches
  plus "fake batch" padding in distributed eval, qinco_tasks.py:93-96).
- Block-cached reads with intra-block shuffling replace ``MMapDataset``'s
  2M-row cache (qinco/datasets.py:62-94): sequential disk access, random
  order within a block.
- Epoch-windowed looping over huge trainsets replaces ``LoopSubset``
  (qinco/datasets.py:23-59): epoch ``e`` covers rows
  ``[e·loop, (e+1)·loop) mod N``.
- Host sharding for multi-process data parallelism replaces per-rank
  index arithmetic (search_tasks.py:103-104): pass ``shard=(i, n)``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from .vecs_io import open_vectors

BLOCK_CACHE_ROWS = 2_000_000


@dataclass
class Batch:
    x: np.ndarray  # (batch, D) float32, zero-padded past n_valid
    n_valid: int


class BlockShuffledLoader:
    """Iterates fixed-size float32 batches over a (memmapped) row source."""

    def __init__(
        self,
        data: np.ndarray,
        batch_size: int,
        *,
        shuffle: bool = False,
        loop: int | None = None,
        block_rows: int = BLOCK_CACHE_ROWS,
        seed: int = 0,
        shard: tuple[int, int] = (0, 1),
        pad_final: bool = True,
        drop_final: bool = False,
    ):
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.block_rows = block_rows
        self.seed = seed
        self.shard_i, self.shard_n = shard
        self.pad_final = pad_final
        self.drop_final = drop_final
        n = len(data)
        self.loop = min(loop, n) if loop else None
        self.window = self.loop if self.loop else n
        self.n_total = n

    @property
    def dim(self) -> int:
        return self.data.shape[-1]

    def __len__(self) -> int:
        per_shard = self.window // self.shard_n if self.shard_n > 1 else self.window
        if self.drop_final:
            return per_shard // self.batch_size
        return math.ceil(per_shard / self.batch_size)

    def _epoch_bounds(self, epoch: int) -> tuple[int, int]:
        """Row range [start, start+window) for this epoch's loop window."""
        if self.loop is None or self.window >= self.n_total:
            return 0, self.window
        start = (epoch * self.loop) % self.n_total
        return start, start + self.window

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        start, end = self._epoch_bounds(epoch)
        # Shard rows contiguously across hosts.
        if self.shard_n > 1:
            span = end - start
            per = span // self.shard_n
            lo = start + per * self.shard_i
            hi = start + per * (self.shard_i + 1) if self.shard_i < self.shard_n - 1 else end
            # Keep shapes identical across shards for lockstep collectives.
            hi = min(hi, lo + per) if per else hi
            start, end = lo, hi

        rng = np.random.default_rng(self.seed + epoch * 0x9E3779B9) if self.shuffle else None
        bs = self.batch_size
        leftover: np.ndarray | None = None

        for blk_start in range(start, end, self.block_rows):
            blk_end = min(end, blk_start + self.block_rows)
            lo = blk_start % self.n_total
            span = blk_end - blk_start
            if lo + span > self.n_total:  # window wraps around the dataset end
                block = np.concatenate(
                    [self.data[lo:], self.data[: lo + span - self.n_total]], axis=0
                )
            else:
                block = self.data[lo : lo + span]
            block = np.asarray(block, dtype=np.float32)
            if rng is not None:
                block = block[rng.permutation(len(block))]
            if leftover is not None and len(leftover):
                block = np.concatenate([leftover, block], axis=0)
                leftover = None
            n_full = (len(block) // bs) * bs
            for i in range(0, n_full, bs):
                yield Batch(block[i : i + bs], bs)
            if n_full < len(block):
                leftover = block[n_full:]

        if leftover is not None and len(leftover) and not self.drop_final:
            n_valid = len(leftover)
            if self.pad_final:
                pad = np.zeros((bs - n_valid, leftover.shape[-1]), dtype=np.float32)
                leftover = np.concatenate([leftover, pad], axis=0)
            yield Batch(leftover, n_valid)

    def __iter__(self) -> Iterator[Batch]:
        return self.epoch(0)

    def take(self, max_rows: int) -> np.ndarray:
        """Materialize up to ``max_rows`` rows as float32 (for k-means / stats)."""
        n = min(max_rows, self.window)
        start, end = self._epoch_bounds(0)
        return np.asarray(self.data[start : start + n], dtype=np.float32)


def load_vec_trainset(cfg, shard: tuple[int, int] = (0, 1)):
    """Training/validation split + loaders (reference: qinco/datasets.py:143-167).

    The last ``cfg.ds.valset`` rows become validation, the (optionally
    capped) head is training.
    """
    assert cfg.trainset is not None, (
        "Provide a training dataset via 'trainset', or a default dataset via 'db'"
    )
    xt_full = open_vectors(cfg.trainset, "training")
    assert cfg.ds.valset <= len(xt_full) // 2, (
        "Validation set larger than half the training set; abnormal configuration"
    )
    xt, xval = xt_full[: -cfg.ds.valset], xt_full[-cfg.ds.valset :]
    cfg.ds.trainset = min(cfg.ds.trainset or len(xt), len(xt))
    xt = xt[: cfg.ds.trainset]

    loop = None if cfg.qinco1_mode else cfg.ds.loop
    train_loader = BlockShuffledLoader(
        xt, cfg.batch, shuffle=True, loop=loop, seed=cfg.seed, shard=shard
    )
    val_loader = BlockShuffledLoader(xval, cfg.batch, shuffle=False, shard=shard)
    return (xt, xval), (train_loader, val_loader)


def load_vec_db(cfg, shard: tuple[int, int] = (0, 1)):
    """Database loader (reference: qinco/datasets.py:170-184)."""
    assert cfg.db is not None, "Provide a database path or preset name via 'db'"
    xdb = open_vectors(cfg.db, "database")
    cfg.ds.db = min(cfg.ds.db or len(xdb), len(xdb))
    xdb = xdb[: cfg.ds.db]
    db_loader = BlockShuffledLoader(xdb, cfg.batch, shuffle=False, shard=shard)
    return xdb, db_loader


def load_queries_data(cfg):
    """Query vectors + ground truth (reference: qinco/datasets.py:187-202)."""
    assert cfg.queries is not None, "Provide queries via 'queries'"
    xq = open_vectors(cfg.queries, "queries")
    assert cfg.queries_gt is not None, "Provide ground truth via 'queries_gt'"
    xq_gt = open_vectors(cfg.queries_gt, "queries_gt")
    return xq, xq_gt
