"""Per-batch statistics reductions.

Device-side equivalent of the reference Stats::statRead loop
(src/stats.cpp:265-375): per-cycle Q20/Q30/content/quality accumulators
indexed by (base & 0x07), base-quality histogram, rolling 5-mer counts, and
the per-read median quality.  A batch of reads is reduced to fixed-shape
partial tensors which the host (or a psum across a mesh) accumulates into
the run totals.

Inputs are spans [lo, hi) into padded [B, L] arrays; the kernel aligns each
span to cycle 0 via a gather so that "cycle" == position within the
(trimmed) read, exactly like the reference's per-read loop.
"""

import jax.numpy as jnp

from .align import align_spans

Q20_CHAR = ord("5")
Q30_CHAR = ord("?")


def stat_batch(bases, quals, lo, hi, read_mask, zero_lo=False):
    """Returns a dict of per-batch partial statistics.

    read_mask [B] bool excludes padding rows / filtered-out reads.
    zero_lo=True (pre-stats on untrimmed reads) skips span alignment.
    """
    B, L = bases.shape
    lo = lo.astype(jnp.int32)
    hi = jnp.maximum(hi.astype(jnp.int32), lo)
    rlen = jnp.where(read_mask, hi - lo, 0)

    if zero_lo:
        idx = jnp.arange(L, dtype=jnp.int32)[None, :]
        m = idx < hi[:, None]
        b = jnp.where(m, bases, 0)
        q = jnp.where(m, quals, 0)
    else:
        b, q, m = align_spans(bases, quals, lo, hi)
    m = m & read_mask[:, None]
    qv = jnp.where(m, q.astype(jnp.int32), 0)

    bucket = (b & 0x07).astype(jnp.int32)
    q20m = m & (q >= Q20_CHAR)
    q30m = m & (q >= Q30_CHAR)
    qm33 = jnp.where(m, qv - 33, 0)

    cyc_q20 = []
    cyc_q30 = []
    cyc_content = []
    cyc_qual = []
    for c in range(8):
        is_c = m & (bucket == c)
        cyc_q20.append(jnp.sum(is_c & q20m, axis=0, dtype=jnp.int32))
        cyc_q30.append(jnp.sum(is_c & q30m, axis=0, dtype=jnp.int32))
        cyc_content.append(jnp.sum(is_c, axis=0, dtype=jnp.int32))
        cyc_qual.append(jnp.sum(jnp.where(is_c, qm33, 0), axis=0,
                                dtype=jnp.int32))

    cycle_total_base = jnp.sum(m, axis=0, dtype=jnp.int32)
    cycle_total_qual = jnp.sum(qm33, axis=0, dtype=jnp.int32)

    # base quality histogram over raw quality bytes (0..127)
    hist_idx = jnp.where(m, jnp.minimum(q.astype(jnp.int32), 127), 127)
    base_qual_hist = jnp.zeros((128,), jnp.int32).at[hist_idx].add(
        jnp.where(m, 1, 0))

    # rolling 5-mer counts (reference stats.cpp:282-348): count at position i
    # (i >= 4) iff the last five bases all map to A/T/U/C/G.
    code = jnp.full(b.shape, -1, jnp.int8)
    for ch, v in ((ord("A"), 0), (ord("T"), 1), (ord("U"), 1),
                  (ord("C"), 2), (ord("G"), 3)):
        code = jnp.where(b == ch, jnp.int8(v), code)
    codes = code.astype(jnp.int32)

    def shifted(k):
        # code at position i-k (invalid -1 outside)
        if k == 0:
            return codes
        pad = jnp.full((B, k), -1, jnp.int32)
        return jnp.concatenate([pad, codes[:, :L - k]], axis=-1)

    c0, c1, c2, c3, c4 = (shifted(k) for k in (4, 3, 2, 1, 0))
    kvalid = (c0 >= 0) & (c1 >= 0) & (c2 >= 0) & (c3 >= 0) & (c4 >= 0) & m
    key = ((c0 << 8) | (c1 << 6) | (c2 << 4) | (c3 << 2) | c4)
    kmer = jnp.zeros((1024,), jnp.int32).at[
        jnp.where(kvalid, key, 0)].add(jnp.where(kvalid, 1, 0))

    # per-read median quality: smallest q with #{quals <= q} > len/2, which
    # equals sorted[len >> 1] (reference stats.cpp:351-362)
    q_sorted = jnp.sort(jnp.where(m, q, jnp.uint8(255)), axis=-1)
    half = jnp.clip(rlen >> 1, 0, L - 1)
    median = jnp.take_along_axis(q_sorted, half[:, None], axis=-1)[:, 0]
    median = jnp.where(rlen > 0, median, 0).astype(jnp.uint8)

    return {
        "cycle_q20": jnp.stack(cyc_q20),        # [8, L]
        "cycle_q30": jnp.stack(cyc_q30),        # [8, L]
        "cycle_content": jnp.stack(cyc_content),  # [8, L]
        "cycle_qual": jnp.stack(cyc_qual),      # [8, L]
        "cycle_total_base": cycle_total_base,   # [L]
        "cycle_total_qual": cycle_total_qual,   # [L]
        "base_qual_hist": base_qual_hist,       # [128]
        "kmer": kmer,                           # [1024]
        "median": median,                       # [B] raw phred33 byte
        "rlen": rlen,                           # [B]
        "read_mask": read_mask,                 # [B]
        "reads": jnp.sum(read_mask.astype(jnp.int32)),
        "bases": jnp.sum(rlen),
    }
