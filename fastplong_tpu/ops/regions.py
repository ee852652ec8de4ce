"""Low-quality region detection (drives --break and --mask).

Vectorized equivalent of Filter::detectLowQualityRegions
(src/filter.cpp:83-128) — including its quasi-rolling totalQual quirks.

Closed-form analysis of the reference loop (verified against the C++):
with S(p) = sum(qual[p : p+w]) and T = (33+quality)*w,

  * iteration 1 (start=0) tests  S(s) - qual[w-1]      against T;
  * iterations k>=2 (start >= w) test  S(s) - S(start_k);
  * both phases share  tested(x) = S(x) - base  with
    base_1 = qual[w-1],  base_k = S(start_k);
  * region k = (ws_k, e_k + w - 1) where ws_k is the first s in
    [start_k, l-w) with tested(s) < T and e_k the first e in [ws_k, l-w)
    with tested(e+1) >= T (else l-w);  start_{k+1} = e_k + w.

Because start_{k+1} = end_k + 1, consecutive regions are ADJACENT: the
union of all regions is the single interval [ws_1, last_end], and
Read::breakByRegions can only ever emit a head fragment [0, ws_1-1] and a
tail fragment [last_end+1, l-1] (read.cpp:227-262).  This kernel therefore
returns the region summary (ws1, last_end, count) instead of a list; the
count feeds the tail fragment's "rN-" name tag.

The outer loop is data-dependent (one step per region) and runs as a
lax.while_loop inside the jitted batch step; extra regions are rare (they
need a window whose sum exceeds base + T), so it converges in one or two
iterations on real data.
"""

import jax
import jax.numpy as jnp

from .primitives import first_true, qual_cumsum


def detect_regions_summary(cq, lo, hi, w, T):
    """Pure-jax region summary for spans [lo, hi).

    cq: [B, L+1] exclusive qual cumsum (qual_cumsum).
    Returns (ws1, last_end, count) span-relative; ws1 = -1 when no regions.
    """
    B = lo.shape[0]
    L = cq.shape[1] - 1
    l = hi - lo
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]

    if w <= 0:
        z = jnp.full((B,), -1, jnp.int32)
        return z, z, jnp.zeros((B,), jnp.int32)

    a = jnp.clip(lo[:, None] + idx, 0, L)
    b = jnp.clip(lo[:, None] + idx + w, 0, L)
    S_all = (jnp.take_along_axis(cq, b, axis=1)
             - jnp.take_along_axis(cq, a, axis=1))  # [B, L]
    Snext = jnp.concatenate(
        [S_all[:, 1:], jnp.zeros((B, 1), S_all.dtype)], axis=1)
    qw1 = (jnp.take_along_axis(cq, jnp.clip(lo + w, 0, L)[:, None], axis=1)
           - jnp.take_along_axis(cq, jnp.clip(lo + w - 1, 0, L)[:, None],
                                 axis=1))[:, 0]

    def cond(state):
        return ~jnp.all(state[1])

    def body(state):
        start, done, first, ws1, last_end, count = state
        S_start = jnp.take_along_axis(
            S_all, jnp.clip(start, 0, L - 1)[:, None], axis=1)[:, 0]
        base = jnp.where(first, qw1, S_start)
        active = ~done & (start + w <= l)

        in_find = (idx >= start[:, None]) & (idx + w < l[:, None])
        found_mask = in_find & (S_all - base[:, None] < T)
        ws = first_true(found_mask, -1)
        has_ws = active & (ws >= 0)

        in_ext = (idx >= ws[:, None]) & (idx + w < l[:, None])
        ext_mask = in_ext & (Snext - base[:, None] >= T)
        e = first_true(ext_mask, l - w)

        ws1 = jnp.where(has_ws & first, ws, ws1)
        last_end = jnp.where(has_ws, e + w - 1, last_end)
        count = count + has_ws.astype(jnp.int32)
        start = jnp.where(has_ws, e + w, start)
        first = first & ~has_ws
        done = done | ~has_ws
        return start, done, first, ws1, last_end, count

    init = (jnp.zeros(B, jnp.int32), jnp.zeros(B, bool), jnp.ones(B, bool),
            jnp.full(B, -1, jnp.int32), jnp.full(B, -1, jnp.int32),
            jnp.zeros(B, jnp.int32))
    _, _, _, ws1, last_end, count = jax.lax.while_loop(cond, body, init)
    return ws1, last_end, count


def detect_regions(quals, lens, lo, hi, window_size, quality):
    """Convenience wrapper (used by tests): returns dict of summaries."""
    w = int(window_size)
    T = (33 + int(quality)) * w
    cq = qual_cumsum(quals, lens)
    ws1, last_end, count = detect_regions_summary(cq, lo, hi, w, T)
    return {"ws1": ws1, "last_end": last_end, "count": count}
