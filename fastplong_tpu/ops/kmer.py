"""Device 10-mer histogram for adapter auto-detection.

TPU-native equivalent of the reference Evaluator's k-mer fill
(src/evaluator.cpp:167-255): rolling 2-bit keys over the sampled end
windows, scatter-added into 4^10 counters plus a per-key position
accumulator.  The device holds one donated (counts, posacc) state pair;
invalid windows (non-ACGTU bases, beyond the per-read window count)
scatter into a dummy bin KEYSPACE that the drain drops.  getTopKey and
the greedy consensus extension stay on the host (evaluator.py) — they
touch a handful of keys — so detection output is bit-identical to the
host-numpy path (tests/test_golden_detect.py).

Overflow discipline: counts and posacc are uint32 on device.  The caller
bounds total_windows * max_position against 2^31 before dispatch and
falls back to the host path beyond (pathological --trim_tail only); the
drain widens to int64/uint64 on the host.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

KEYLEN = 10
KEYSPACE = 1 << (KEYLEN * 2)

# base codes as in the reference seq2int (A0 T1 U1 C2 G3, else invalid)
_CODE_PAIRS = ((ord("A"), 0), (ord("T"), 1), (ord("U"), 1),
               (ord("C"), 2), (ord("G"), 3))


def _codes(mat):
    c = jnp.full(mat.shape, -1, jnp.int8)
    for ch, v in _CODE_PAIRS:
        c = jnp.where(mat == jnp.uint8(ch), jnp.int8(v), c)
    return c


@functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(0, 1))
def _accumulate(counts, pacc, mat, npos, pbase, nvalid_rows, sign):
    """One scatter-add pass over a padded window matrix.

    counts/pacc: [KEYSPACE+1] uint32 donated accumulators.
    mat:   [n, W + KEYLEN] uint8 raw window bytes (row i holds the read's
           window region starting at its base position).
    npos:  [n] int32 number of window positions of row i (0 for padding).
    pbase: [n] int32 position value of column 0 (start side: base_pos;
           end side: len - base_pos), advanced by `sign` per column.
    nvalid_rows: [] int32 rows beyond it are padding.
    """
    n, Wfull = mat.shape
    W = Wfull - KEYLEN
    codes = _codes(mat)
    keys = jnp.zeros((n, W), jnp.int32)
    valid = jnp.ones((n, W), bool)
    for k in range(KEYLEN):
        c = jax.lax.slice_in_dim(codes, k, k + W, axis=1)
        keys = (keys << 2) | jnp.maximum(c, 0).astype(jnp.int32)
        valid &= c >= 0
    col = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid &= col < npos[:, None]
    valid &= (jnp.arange(n, dtype=jnp.int32) < nvalid_rows)[:, None]
    pv = pbase[:, None] + jnp.int32(sign) * col
    idx = jnp.where(valid, keys, KEYSPACE).reshape(-1)
    counts = counts.at[idx].add(jnp.uint32(1))
    pacc = pacc.at[idx].add(
        jnp.where(valid, pv, 0).astype(jnp.uint32).reshape(-1))
    return counts, pacc


def _pad_rows(n):
    p = 256
    while p < n:
        p *= 2
    return p


def kmer_histogram_device(mat, npos, base_pos, lens, end_side):
    """Device-kernel histogram; returns (counts int64 [KEYSPACE],
    posacc uint64 [KEYSPACE], total_valid_windows) matching the host
    arithmetic of evaluator._kmer_histogram bit for bit.

    Returns None when the uint32 position accumulator could overflow
    (caller uses the host path) — only reachable with a --trim_tail in
    the hundreds of thousands.
    """
    n, Wfull = mat.shape
    W = Wfull - KEYLEN
    total_windows = int(npos.sum())
    if total_windows == 0:
        return (np.zeros(KEYSPACE, np.int64), np.zeros(KEYSPACE, np.uint64),
                0)
    if end_side:
        pbase = (lens - base_pos).astype(np.int32)
        sign = -1
        max_pv = int(pbase.max()) if n else 0
    else:
        pbase = base_pos.astype(np.int32)
        sign = 1
        max_pv = int((base_pos + np.maximum(npos - 1, 0)).max()) if n else 0
    if total_windows * max(max_pv, 1) >= (1 << 31):
        return None

    rows = _pad_rows(n)
    mat_p = np.zeros((rows, Wfull), np.uint8)
    mat_p[:n] = mat
    npos_p = np.zeros(rows, np.int32)
    npos_p[:n] = npos
    pbase_p = np.zeros(rows, np.int32)
    pbase_p[:n] = pbase

    counts = jnp.zeros(KEYSPACE + 1, jnp.uint32)
    pacc = jnp.zeros(KEYSPACE + 1, jnp.uint32)
    counts, pacc = _accumulate(counts, pacc, jnp.asarray(mat_p),
                               jnp.asarray(npos_p), jnp.asarray(pbase_p),
                               np.int32(n), sign)
    counts_h = np.asarray(counts)[:KEYSPACE].astype(np.int64)
    pacc_h = np.asarray(pacc)[:KEYSPACE].astype(np.uint64)
    # total = windows whose 10 bases were all ACGTU (the dummy bin KEYSPACE
    # absorbed the rest) — matches the host path's valid.sum()
    return counts_h, pacc_h, int(counts_h.sum())
