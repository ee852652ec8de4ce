"""Host-side per-read statistics for monster reads.

Reads longer than the device stat cap (FASTPLONG_STAT_DEVICE_CAP, default
64Kbp) would need [34*L] device accumulators per bucket and giant XLA
shapes, so their spans/verdicts still run through the (stats-free) device
step while the statistics are computed here with vectorized numpy —
numerically identical to ops/stats_kernels.stat_batch, which itself mirrors
the reference Stats::statRead (src/stats.cpp:265-375).  Monster reads are
rare, and a single O(L) numpy pass per read is microseconds per Mbp.

The per-cycle scatter uses plain fancy-indexed `+=`: within ONE read every
(base-bucket, position) pair is unique, so there are no collisions.
"""

import numpy as np

Q20 = ord("5")
Q30 = ord("?")

_CODE = np.full(256, -1, np.int8)
for _c, _v in ((ord("A"), 0), (ord("T"), 1), (ord("U"), 1),
               (ord("C"), 2), (ord("G"), 3)):
    _CODE[_c] = _v

_STAT_KEYS = ("cycle_q20", "cycle_q30", "cycle_content", "cycle_qual",
              "cycle_total_base", "cycle_total_qual", "base_qual_hist",
              "kmer")


class HostStatAccumulator:
    """Accumulates statRead partials for a group of (usually 1-8) reads."""

    def __init__(self):
        self.L = 0
        self.p = None

    def _ensure(self, n):
        if self.p is None:
            self.p = {
                "cycle_q20": np.zeros((8, n), np.int64),
                "cycle_q30": np.zeros((8, n), np.int64),
                "cycle_content": np.zeros((8, n), np.int64),
                "cycle_qual": np.zeros((8, n), np.int64),
                "cycle_total_base": np.zeros(n, np.int64),
                "cycle_total_qual": np.zeros(n, np.int64),
                "base_qual_hist": np.zeros(128, np.int64),
                "kmer": np.zeros(1024, np.int64),
            }
            self.L = n
            return
        if n > self.L:
            for k in ("cycle_q20", "cycle_q30", "cycle_content",
                      "cycle_qual"):
                buf = np.zeros((8, n), np.int64)
                buf[:, :self.L] = self.p[k]
                self.p[k] = buf
            for k in ("cycle_total_base", "cycle_total_qual"):
                buf = np.zeros(n, np.int64)
                buf[:self.L] = self.p[k]
                self.p[k] = buf
            self.L = n

    def add_read(self, b, q):
        """b, q: np.uint8 arrays of one read's bases/qualities (the span
        to stat, already masked with N where applicable)."""
        n = len(b)
        if n == 0:
            return
        self._ensure(n)
        p = self.p
        idx = np.arange(n)
        bucket = (b & 0x07).astype(np.int64)
        q33 = q.astype(np.int64) - 33
        q20m = q >= Q20
        q30m = q >= Q30
        p["cycle_content"][bucket, idx] += 1
        p["cycle_qual"][bucket, idx] += q33
        p["cycle_q20"][bucket[q20m], idx[q20m]] += 1
        p["cycle_q30"][bucket[q30m], idx[q30m]] += 1
        p["cycle_total_base"][:n] += 1
        p["cycle_total_qual"][:n] += q33
        p["base_qual_hist"] += np.bincount(np.minimum(q, 127).astype(np.int64),
                                           minlength=128)
        if n >= 5:
            code = _CODE[b].astype(np.int64)
            key = ((code[:-4] << 8) | (code[1:-3] << 6) | (code[2:-2] << 4)
                   | (code[3:-1] << 2) | code[4:])
            kvalid = ((code[:-4] >= 0) & (code[1:-3] >= 0) & (code[2:-2] >= 0)
                      & (code[3:-1] >= 0) & (code[4:] >= 0))
            if kvalid.any():
                p["kmer"] += np.bincount(key[kvalid], minlength=1024)

    def partial(self):
        """The accumulated partial dict (or None if nothing was added)."""
        return self.p


def median_qual(q):
    """sorted[len >> 1] (reference stats.cpp:351-362); 0 for empty."""
    n = len(q)
    if n == 0:
        return 0
    return int(np.sort(q)[n >> 1])


def masked_span(seq, lo, hi, m_lo, m_hi):
    """seq[lo:hi] with [m_lo, m_hi) (absolute coords) replaced by N,
    mirroring maskRegionWithN (read.cpp:217-225)."""
    out = seq[lo:hi]
    a = max(lo, int(m_lo))
    b = min(hi, int(m_hi))
    if b > a:
        out = out.copy()
        out[a - lo:b - lo] = ord("N")
    return out
