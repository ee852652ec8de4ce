#!/usr/bin/env python
"""Microbenchmark + oracle check for the native statRead pass
(native/host_io.cpp fpl_stat_rows, base5 fast path).

Run: JAX_PLATFORMS=cpu python tools/stat_bench.py
Round-5 reference on this 4-core host: ~260 MB/s/core (the naive
per-base loop measured ~100 MB/s/core)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from fastplong_tpu.pipeline.host_stats import BatchStatAccumulator
    L, B = 16384, 2048
    rng = np.random.default_rng(0)
    lens = rng.integers(2000, L, size=B).astype(np.int64)
    packed = np.full((B, L + 8), 255, np.uint8)
    vals = rng.integers(0, 250, size=(B, L), dtype=np.uint8)
    m = np.arange(L)[None, :] < lens[:, None]
    packed[:, :L][m] = vals[m]
    packed[:, L:L + 4] = lens.astype("<i4").view(np.uint8).reshape(B, 4)
    packed[:, L + 4] = 1
    total = int(lens.sum())

    hs = BatchStatAccumulator(65536)
    hs.add_rows(packed, L, None, lens, None, None, np.ones(B, bool), "b5")
    best = None
    for _ in range(5):
        t0 = time.time()
        med = hs.add_rows(packed, L, None, lens, None, None,
                          np.ones(B, bool), "b5")
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print("statRead: %.0f Mbases in %.3fs = %.0f MB/s/core"
          % (total / 1e6, best, total / 1e6 / best))

    # oracle check: native vs the vectorized numpy fallback
    a = BatchStatAccumulator(65536)
    med_a = a.add_rows(packed, L, None, lens, None, None,
                       np.ones(B, bool), "b5")
    b = BatchStatAccumulator(65536)
    med_b = np.zeros(B, np.uint8)
    b._numpy_rows(packed, L, None, lens, None, None, np.ones(B, bool),
                  med_b, "b5")
    ok = np.array_equal(med_a, med_b)
    for x, y in ((a.cyc, b.cyc), (a.q20, b.q20), (a.q30, b.q30),
                 (a.hist, b.hist), (a.kmer, b.kmer)):
        ok = ok and np.array_equal(x, y)
    print("oracle match:", ok)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
