"""Padded batch construction with length bucketing.

RecordBlocks are columnar (bytes + offsets); this module packs reads into
fixed-shape [B, 2L+8] uint8 device feeds (bases || quals || len || mask
per row).  Reads are grouped by length bucket so padding stays bounded, and
batch shapes are canonical — one (B, L) pair per bucket — because every new
shape costs an XLA compile.

BatchBuilder accumulates reads ACROSS RecordBlocks until a batch is full,
so partially-filled batches only occur at end of input; the runner tracks
per-block completion to keep output in input order.
"""

import numpy as np

from ..common import TOKENS_PER_BATCH, MAX_BATCH_READS

import os as _os

# length buckets: powers of two (density 1), optionally with 1.5x midpoints
# (FASTPLONG_BUCKET_DENSITY=2) — halves padding waste at the cost of twice
# as many compiled shapes
_DENSITY = int(_os.environ.get("FASTPLONG_BUCKET_DENSITY", "1"))
_BUCKETS = []
for _k in range(7, 31):
    _BUCKETS.append(1 << _k)
    if _DENSITY >= 2 and _k < 30:
        _BUCKETS.append((1 << _k) + (1 << (_k - 1)))
_BUCKETS.sort()


def bucket_len(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return n


def batch_rows(L: int, multiple: int = 1) -> int:
    """Rows per batch for bucket length L; in mesh mode `multiple` is the
    device count so every shard gets equal rows.

    Bounded by the real token budget: a monster bucket (L beyond
    TOKENS_PER_BATCH) gets a single row rather than a floor of 8 — an
    8Mbp read must not force a [8, 8M] batch (16x the budget)."""
    b = max(1, TOKENS_PER_BATCH // L)
    b = int(min(MAX_BATCH_READS, b))
    if multiple > 1:
        b = max(multiple, (b // multiple) * multiple)
    return b


class Segment:
    """A run of batch rows belonging to one RecordBlock."""

    __slots__ = ("block", "indices", "row_start")

    def __init__(self, block, indices, row_start):
        self.block = block
        self.indices = indices      # record indices within the block
        self.row_start = row_start  # first batch row of this run


class Batch:
    __slots__ = ("packed", "lens", "read_mask", "segments", "L",
                 "pre_medians")

    def __init__(self, packed, lens, read_mask, segments, L):
        self.packed = packed        # [B, 2L+8] uint8
        self.lens = lens            # [B] int32
        self.read_mask = read_mask  # [B] bool
        self.segments = segments
        self.L = L
        self.pre_medians = None     # host-stats mode: per-row median bytes


class BatchBuilder:
    def __init__(self, L, rows_multiple=1):
        self.L = L
        self.rows = batch_rows(L, rows_multiple)
        self._reset()

    def _reset(self):
        stride = 2 * self.L + 8
        self.packed = np.zeros((self.rows, stride), np.uint8)
        self.lens = np.zeros(self.rows, np.int32)
        self.read_mask = np.zeros(self.rows, bool)
        self.segments = []
        self.count = 0

    @property
    def space(self):
        return self.rows - self.count

    @property
    def full(self):
        return self.count >= self.rows

    def add(self, block, take):
        """Fill rows with records `take` (indices into block); take must
        fit in the remaining space."""
        k = len(take)
        r0 = self.count
        filled = False
        try:
            from ..native import pack_batch_into
            filled = pack_batch_into(
                self.packed, r0, block.buf, block.seq_off, block.seq_len,
                block.qual_off, take, self.L)
        except Exception:
            filled = False
        sl = block.seq_len[take]
        if not filled:
            L = self.L
            col = np.arange(L, dtype=np.int64)
            src_b = block.seq_off[take][:, None] + col[None, :]
            src_q = block.qual_off[take][:, None] + col[None, :]
            valid = col[None, :] < sl[:, None]
            np.copyto(self.packed[r0:r0 + k, :L],
                      block.arr[np.where(valid, src_b, 0)], where=valid)
            np.copyto(self.packed[r0:r0 + k, L:2 * L],
                      block.arr[np.where(valid, src_q, 0)], where=valid)
            self.packed[r0:r0 + k, 2 * L:2 * L + 4] = sl.astype(
                "<i4").view(np.uint8).reshape(k, 4)
            self.packed[r0:r0 + k, 2 * L + 4] = 1
        self.lens[r0:r0 + k] = sl
        self.read_mask[r0:r0 + k] = True
        self.segments.append(Segment(block, np.asarray(take), r0))
        self.count += k

    def take_batch(self):
        b = Batch(self.packed, self.lens, self.read_mask, self.segments,
                  self.L)
        self._reset()
        return b


def bucket_groups(block):
    """Yields (L, record_indices) per contiguous length-bucket group,
    indices sorted by length within the group."""
    n = block.n
    if n == 0:
        return
    order = np.argsort(block.seq_len, kind="stable")
    bucket_idx = np.searchsorted(np.asarray(_BUCKETS, np.int64),
                                 np.maximum(block.seq_len[order], 1))
    boundaries = np.flatnonzero(np.diff(bucket_idx)) + 1
    start = 0
    for end in list(boundaries) + [n]:
        if end > start:
            yield _BUCKETS[bucket_idx[start]], order[start:end]
            start = end


def make_batches(block):
    """Single-block batching (used by tests/benchmarks): yields full and
    trailing partial Batches covering all records of one block."""
    builders = {}
    for L, take in bucket_groups(block):
        b = builders.setdefault(L, BatchBuilder(L))
        pos = 0
        while pos < len(take):
            k = min(b.space, len(take) - pos)
            b.add(block, take[pos:pos + k])
            pos += k
            if b.full:
                yield b.take_batch()
    for b in builders.values():
        if b.count:
            yield b.take_batch()
