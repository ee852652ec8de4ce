"""Global trimming + sliding-window quality cutting.

Vectorized equivalent of the reference Filter::trimAndCut
(src/filter.cpp:130-232).  Instead of mutating strings, the kernel returns a
per-read window [lo, hi) into the original bases plus a null flag (the
reference returns NULL for degenerate cases — such reads vanish from every
downstream stage, including the filter-result counters).

The reference's rolling sums are exact sliding-window sums here (verified
against the C++ recurrence):
  front scan tests S(s) = sum(qual[s:s+w]) for s in [front, l-tail-w),
  breaking at the first window with S >= (33+q)*w;
  tail scan tests S(t-w+1..t) for t descending in [front+w, l-tail-1].
The post-scan adjustments (s>0 -> s+w-1, t<l-1 -> t-w+1) and the trailing-N
skips carry the reference's exact asymmetries.
"""

import jax.numpy as jnp

from .primitives import first_true, last_true, qual_cumsum, window_sums

N_CHAR = ord("N")


def trim_and_cut(bases, quals, lens, front, tail, *,
                 enabled_front, enabled_tail,
                 window_front, quality_front,
                 window_tail, quality_tail):
    """Returns (lo, hi, null) int32/bool arrays of shape [B].

    front/tail are the global --trim_front/--trim_tail (static ints);
    the enabled_*/window_*/quality_* parameters are static config.
    """
    B, L = bases.shape
    lens = lens.astype(jnp.int32)
    zero = jnp.zeros((B,), jnp.int32)

    if front == 0 and tail == 0 and not enabled_front and not enabled_tail:
        return zero, lens, jnp.zeros((B,), bool)

    l = lens
    rlen = l - front - tail
    null = rlen < 0

    if not enabled_front and not enabled_tail:
        # pure global trimming (reference filter.cpp:141-151)
        lo = jnp.full((B,), front, jnp.int32)
        if front == 0:
            lo = zero
        hi = l - tail
        lo = jnp.where(null, 0, lo)
        hi = jnp.where(null, 0, jnp.maximum(hi, lo))
        return lo, hi, null

    cq = qual_cumsum(quals, lens)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    is_n = bases == N_CHAR

    frontv = jnp.full((B,), front, jnp.int32)

    if enabled_front:
        w = window_front
        thr = (33 + quality_front) * w
        null = null | (l - front - tail - w <= 0)
        S = window_sums(cq, w)
        cand = (idx >= front) & (idx + w < (l - tail)[:, None]) & (S >= thr)
        s = first_true(cand, l - tail - w)
        s = jnp.where(s > 0, s + w - 1, s)
        # skip forward over 'N' (reference filter.cpp:185-186)
        nonn = (idx >= s[:, None]) & (idx < l[:, None]) & (~is_n)
        s = first_true(nonn, l)
        frontv = s
        rlen = l - frontv - tail

    hi = l - tail
    if enabled_tail:
        w = window_tail
        thr = (33 + quality_tail) * w
        null = null | (l - frontv - tail - w <= 0)
        Sw = window_sums(cq, w)  # Sw[:, p] = sum(q[p:p+w]); window ending at t -> p = t-w+1
        t_idx = idx  # candidate t positions
        p = t_idx - (w - 1)
        Send = jnp.take_along_axis(
            Sw, jnp.clip(p, 0, L - 1), axis=-1)
        cand = (t_idx >= (frontv + w)[:, None]) & (t_idx <= (l - tail - 1)[:, None]) & (Send >= thr)
        t = last_true(cand, frontv + w - 1)
        t = jnp.where(t < l - 1, t - w + 1, t)
        # skip backward over 'N' (reference filter.cpp:216-217)
        nonn = (idx <= t[:, None]) & (~is_n)
        t = last_true(nonn, jnp.full((B,), -1, jnp.int32))
        rlen = t - frontv + 1
        hi = t + 1

    null = null | (rlen <= 0) | (frontv >= l - 1)
    lo = jnp.where(null, 0, frontv)
    hi = jnp.where(null, 0, jnp.maximum(hi, lo))
    return lo, hi, null
