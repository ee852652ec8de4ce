"""Padded batch construction with length bucketing.

RecordBlocks are columnar (bytes + offsets); this module packs groups of
records into fixed-shape [B, L] uint8 device feeds.  Reads are grouped by
length bucket so padding waste stays bounded, and batch shapes are drawn
from a small fixed set so jit caches stay warm.

The packing gather itself is vectorized numpy (one fancy-index per batch),
not a per-read Python loop.
"""

import numpy as np

from ..common import TOKENS_PER_BATCH, MAX_BATCH_READS

# length buckets: powers of two
_BUCKETS = [1 << k for k in range(7, 31)]  # 128 .. 1G


def bucket_len(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return n


def batch_rows(L: int) -> int:
    """Rows per batch for bucket length L."""
    b = max(8, TOKENS_PER_BATCH // L)
    return int(min(MAX_BATCH_READS, b))


class Batch:
    __slots__ = ("bases", "quals", "lens", "read_mask", "indices", "block")

    def __init__(self, bases, quals, lens, read_mask, indices, block):
        self.bases = bases          # [B, L] uint8
        self.quals = quals          # [B, L] uint8
        self.lens = lens            # [B] int32
        self.read_mask = read_mask  # [B] bool
        self.indices = indices      # [B] int64 record index within block (-1 pad)
        self.block = block          # source RecordBlock


def make_batches(block):
    """Yield Batches covering all records of a RecordBlock."""
    n = block.n
    if n == 0:
        return
    seq_len = block.seq_len
    order = np.argsort(seq_len, kind="stable")
    arr = block.arr
    pos = 0
    while pos < n:
        # `order` is ascending by length: tentatively take a full batch for
        # the smallest read's bucket, then shrink to the bucket the group
        # max actually lands in (taking fewer of the sorted reads can only
        # lower the max, so one adjustment suffices).
        L = bucket_len(max(int(seq_len[order[pos]]), 1))
        take = order[pos:pos + batch_rows(L)]
        gmax = int(seq_len[take].max())
        if gmax > L:
            L = bucket_len(gmax)
            take = order[pos:pos + batch_rows(L)]
        pos += len(take)
        yield _pack(block, take, L, batch_rows(L))


def _pack(block, take, L, rows):
    B = max(rows, len(take))
    k = len(take)
    bases = np.zeros((B, L), np.uint8)
    quals = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    read_mask = np.zeros(B, bool)
    indices = np.full(B, -1, np.int64)

    sl = block.seq_len[take]
    lens[:k] = sl
    read_mask[:k] = True
    indices[:k] = take

    # vectorized gather: flat source indices for each (row, col)
    col = np.arange(L, dtype=np.int64)
    src_b = block.seq_off[take][:, None] + col[None, :]
    src_q = block.qual_off[take][:, None] + col[None, :]
    valid = col[None, :] < sl[:, None]
    np.copyto(bases[:k], block.arr[np.where(valid, src_b, 0)], where=valid)
    np.copyto(quals[:k], block.arr[np.where(valid, src_q, 0)], where=valid)
    return Batch(bases, quals, lens, read_mask, indices, block)
