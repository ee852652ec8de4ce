"""Padded batch construction with length bucketing.

RecordBlocks are columnar (bytes + offsets); this module packs reads into
fixed-shape uint8 device feeds.  Two row layouts exist:

  base5  [B, L+8]   one byte per base: code + 5*(qual-33), code in
                    {A:0, C:1, G:2, T:3, N:4}; 255 marks padding.  The
                    device decodes bases/quals on-chip (device.py), so the
                    h2d feed costs 1 byte/base instead of 2 — host->device
                    volume is a first-order cost on weak links.
  wide   [B, 2L+8]  bases || quals verbatim — the fallback for rows the
                    base5 alphabet can't express (IUPAC codes, lowercase,
                    qualities above Q50).  Behavior is identical either
                    way: base5 decode reproduces the original bytes
                    exactly or the builder falls back.

Both layouts end with len(le32) || mask || 3 zero bytes per row.

Reads are grouped by length bucket so padding stays bounded, and batch
shapes are canonical — one (B, L) pair per bucket — because every new
shape costs an XLA compile AND an executable load onto the device (seconds
each through a tunneled interconnect; see runner prewarm).  Bucket growth
is 1.5x by default: padded h2d bytes are a first-order cost on weak links
(4x growth measured 2.28 bytes/base and made the warm pipeline
link-bound), while the extra shapes load concurrently on the prewarm pool
and amortize entirely under the warm daemon.  2.0/4.0 trade padding for
fewer shapes where loads are not amortized (FASTPLONG_BUCKET_GROWTH).

BatchBuilder accumulates reads ACROSS RecordBlocks until a batch is full,
so partially-filled batches only occur at end of input; the runner tracks
per-block completion to keep output in input order.
"""

import numpy as np

from ..common import TOKENS_PER_BATCH, MAX_BATCH_READS

import os as _os

# length buckets: geometric from FASTPLONG_BUCKET_MIN with growth
# FASTPLONG_BUCKET_GROWTH (4 = fewest compiled shapes, 1.5 = least
# padding).  Growth may be fractional; the default is 1.5 (round-4 A/B on
# the tunnel: ~15-20% faster daemon jobs than 2.0 — padded feed bytes are
# the wall in the degraded-transfer regime, and the prewarm pool plus the
# resident daemon amortize the extra shapes).  2.0 and 4.0 remain the
# right trade where per-shape device program loads are NOT amortized.
#
# FASTPLONG_BUCKETS pins the ladder outright (comma-separated lengths):
# the daemon's pristine single-use workers run with a 2-bucket ladder so
# a job's entire executable set is pre-loaded off-clock — padding waste
# is irrelevant in their fast pre-first-d2h transfer regime, shape count
# is everything.  The ladder continues geometrically above the top pin so
# monster reads still land in canonical (cacheable) shapes.
_GROWTH = max(1.2, float(_os.environ.get("FASTPLONG_BUCKET_GROWTH", "1.5")))
_MIN = max(64, int(_os.environ.get("FASTPLONG_BUCKET_MIN", "1024")))
_PINNED = _os.environ.get("FASTPLONG_BUCKETS", "")
if _PINNED:
    _BUCKETS = sorted({max(64, int(-(-int(x) // 64) * 64))
                       for x in _PINNED.split(",") if x.strip()})
    _b = _BUCKETS[-1]
    while _b < (1 << 30):
        _b = max(_b + 64, int(-(-_b * 4 // 64) * 64))
        _BUCKETS.append(_b)
else:
    _BUCKETS = []
    _b = _MIN
    while _b < (1 << 30):
        _BUCKETS.append(_b)
        # 64-aligned shapes keep device tiling friendly
        _b = max(_b + 64, int(-(-_b * _GROWTH // 64) * 64))
    _BUCKETS.append(_b)

# base5 pack tables: v16 = CODE[s] + QMUL[q]; any byte outside the base5
# alphabet or quality range leaves bit 8/9 set -> fall back to wide
_B5_CODE = np.full(256, 0x100, np.uint16)
for _c, _v in ((ord("A"), 0), (ord("C"), 1), (ord("G"), 2), (ord("T"), 3),
               (ord("N"), 4)):
    _B5_CODE[_c] = _v
_B5_QMUL = np.full(256, 0x200, np.uint16)
for _q in range(33, 84):
    _B5_QMUL[_q] = 5 * (_q - 33)


def b5_decode(v):
    """Decode base5-packed bytes (numpy) -> (bases, quals) uint8 arrays,
    reproducing the wide-layout bytes EXACTLY (padding 255 -> 0, 0).
    The single numpy decode shared by every host-side consumer; the jnp
    twin lives in device.unpack_on_device and the C tables in
    native/host_io.cpp:fpl_stat_rows."""
    q5 = v // 5
    pad = v == 255
    bases = np.where(pad, 0,
                     np.frombuffer(b"ACGTN\0\0\0", np.uint8)[v - q5 * 5])
    quals = np.where(pad, 0, q5 + 33).astype(np.uint8)
    return bases.astype(np.uint8), quals


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
    __slots__ = ("packed", "lens", "read_mask", "segments", "L", "layout",
                 "pre_medians", "_queued", "full_rows")

    def __init__(self, packed, lens, read_mask, segments, L, layout="b5"):
        self.packed = packed        # [B, L+8] (base5) or [B, 2L+8] (wide)
        self.lens = lens            # [B] int32
        self.read_mask = read_mask  # [B] bool
        self.segments = segments
        self.L = L
        self.layout = layout
        self.pre_medians = None     # host-stats mode: per-row median bytes
        self._queued = False        # set with the bs.pending append
                                    # (runner._device_dispatch, under lock)
        self.full_rows = packed.shape[0]  # bucket ring row count (a
                                    # partial batch may be row-trimmed)


class BatchBuilder:
    def __init__(self, L, rows_multiple=1):
        self.L = L
        self.rows = batch_rows(L, rows_multiple)
        self.layout = "b5"
        self._reset()

    def _reset(self):
        L = self.L
        if self.layout == "b5":
            self.packed = np.full((self.rows, L + 8), 255, np.uint8)
            self.packed[:, L:] = 0
        else:
            self.packed = np.zeros((self.rows, 2 * L + 8), np.uint8)
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
        if self.layout == "b5" and not self._add_b5(block, take, r0):
            # a byte outside the base5 alphabet: this builder goes wide
            # for the rest of the run (such files usually stay weird)
            self._widen()
        if self.layout == "wide":
            self._add_wide(block, take, r0)
        sl = block.seq_len[take]
        self.lens[r0:r0 + k] = sl
        self.read_mask[r0:r0 + k] = True
        self.segments.append(Segment(block, np.asarray(take), r0))
        self.count += k

    def _add_b5(self, block, take, r0):
        """base5-pack records into rows [r0:]; False if any byte doesn't
        fit the base5 alphabet (caller widens and repacks)."""
        try:
            from ..native import pack_batch_b5_into
            r = pack_batch_b5_into(
                self.packed, r0, block.buf, block.seq_off, block.seq_len,
                block.qual_off, take, self.L)
        except Exception:
            r = None
        if r is not None:
            return r
        L = self.L
        k = len(take)
        sl = block.seq_len[take]
        col = np.arange(L, dtype=np.int64)
        src_b = block.seq_off[take][:, None] + col[None, :]
        src_q = block.qual_off[take][:, None] + col[None, :]
        valid = col[None, :] < sl[:, None]
        v16 = (_B5_CODE[block.arr[np.where(valid, src_b, 0)]]
               + _B5_QMUL[block.arr[np.where(valid, src_q, 0)]])
        if (v16[valid] > 254).any():
            return False
        dst = self.packed[r0:r0 + k, :L]
        np.copyto(dst, v16.astype(np.uint8), where=valid)
        np.copyto(dst, np.uint8(255), where=~valid)
        self.packed[r0:r0 + k, L:L + 4] = sl.astype(
            "<i4").view(np.uint8).reshape(k, 4)
        self.packed[r0:r0 + k, L + 4] = 1
        self.packed[r0:r0 + k, L + 5:] = 0
        return True

    def _add_wide(self, block, take, r0):
        filled = False
        try:
            from ..native import pack_batch_into
            filled = pack_batch_into(
                self.packed, r0, block.buf, block.seq_off, block.seq_len,
                block.qual_off, take, self.L)
        except Exception:
            filled = False
        if filled:
            return
        L = self.L
        k = len(take)
        sl = block.seq_len[take]
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

    def _widen(self):
        """Convert the (partially filled) base5 buffer to the wide layout
        in place; the builder stays wide afterwards."""
        L = self.L
        old = self.packed
        self.layout = "wide"
        wide = np.zeros((self.rows, 2 * L + 8), np.uint8)
        if self.count:
            b, q = b5_decode(old[:self.count, :L])
            wide[:self.count, :L] = b
            wide[:self.count, L:2 * L] = q
        wide[:self.rows, 2 * L:] = old[:self.rows, L:]
        self.packed = wide

    def take_batch(self):
        b = Batch(self.packed, self.lens, self.read_mask, self.segments,
                  self.L, self.layout)
        b.full_rows = self.rows
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
        b = builders.get(L)
        if b is None:
            b = builders[L] = BatchBuilder(L)
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
