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
    __slots__ = ("packed", "lens", "read_mask", "indices", "block")

    def __init__(self, packed, lens, read_mask, indices, block):
        self.packed = packed        # [B, 2L+8] uint8 (bases||quals||len||mask)
        self.lens = lens            # [B] int32
        self.read_mask = read_mask  # [B] bool
        self.indices = indices      # [B] int64 record index within block (-1 pad)
        self.block = block          # source RecordBlock

    @property
    def L(self):
        return (self.packed.shape[1] - 8) // 2


def make_batches(block):
    """Yield Batches covering all records of a RecordBlock."""
    n = block.n
    if n == 0:
        return
    seq_len = block.seq_len
    order = np.argsort(seq_len, kind="stable")
    arr = block.arr
    # group reads by their OWN length bucket (reads are sorted, so groups
    # are contiguous) — the compiled (B, L) shapes stay canonical, one per
    # bucket, since every new shape costs an XLA compile
    bucket_idx = np.searchsorted(np.asarray(_BUCKETS, np.int64),
                                 np.maximum(seq_len[order], 1))
    pos = 0
    while pos < n:
        bi = bucket_idx[pos]
        L = _BUCKETS[bi]
        rows = batch_rows(L)
        end = pos
        while end < n and end - pos < rows and bucket_idx[end] == bi:
            end += 1
        take = order[pos:end]
        pos = end
        yield _pack(block, take, L, rows)


def _pack(block, take, L, rows):
    B = max(rows, len(take))
    k = len(take)
    lens = np.zeros(B, np.int32)
    read_mask = np.zeros(B, bool)
    indices = np.full(B, -1, np.int64)

    sl = block.seq_len[take]
    lens[:k] = sl
    read_mask[:k] = True
    indices[:k] = take

    # native row-copy fill of the packed [B, 2L+8] device feed
    try:
        from ..native import pack_batch
        packed = pack_batch(block.buf, block.seq_off, block.seq_len,
                            block.qual_off, take, L, B)
    except Exception:
        packed = None
    if packed is None:
        packed = np.zeros((B, 2 * L + 8), np.uint8)
        col = np.arange(L, dtype=np.int64)
        src_b = block.seq_off[take][:, None] + col[None, :]
        src_q = block.qual_off[take][:, None] + col[None, :]
        valid = col[None, :] < sl[:, None]
        np.copyto(packed[:k, :L], block.arr[np.where(valid, src_b, 0)],
                  where=valid)
        np.copyto(packed[:k, L:2 * L], block.arr[np.where(valid, src_q, 0)],
                  where=valid)
        packed[:k, 2 * L:2 * L + 4] = lens[:k].astype("<i4").view(
            np.uint8).reshape(k, 4)
        packed[:k, 2 * L + 4] = 1
    return Batch(packed, lens, read_mask, indices, block)
