"""3' polyX tail trimming.

Vectorized equivalent of the reference PolyX::trimPolyX (src/polyx.cpp:11-78)
operating on spans [lo, hi) of the padded base array.

The reference walks from the tail accumulating per-base counts (N counts as
all four), with mismatch budget min(5, seen/8), stopping at the first
position where every base exceeds its budget (subject to the pos>=8 /
pos+1>=compareReq-1 gate).  If the scanned run is >= compareReq, the
dominant base is picked (first of A,T,C,G on ties) and the trim point is
walked back to the last occurrence of that base.

Returns (new_hi, poly_base_idx, trimmed_len) — poly_base_idx is -1 when no
trimming happened; trimmed_len is the per-read base count removed (the
reference records these in FilterResult::addPolyXTrimmed).
"""

import jax.numpy as jnp

from .align import align_single
from .primitives import first_true, last_true

_BASES = (ord("A"), ord("T"), ord("C"), ord("G"))
N_CHAR = ord("N")


def trim_polyx(bases, lo, hi, compare_req):
    B, L = bases.shape
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)
    rlen = hi - lo

    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    # tail-relative position: pos p corresponds to absolute index hi-1-p;
    # the tail view = flip the whole row, then shift left by L - hi
    # (a sort-based alignment — data-dependent gathers are slow on TPU)
    tail_bases, in_span = align_single(bases[:, ::-1], L - hi, rlen)

    is_n = tail_bases == N_CHAR
    counts = []  # cumulative counts C[b][p] inclusive of position p
    for bch in _BASES:
        onehot = ((tail_bases == bch) | is_n) & in_span
        counts.append(jnp.cumsum(onehot.astype(jnp.int32), axis=-1))
    counts = jnp.stack(counts, axis=1)  # [B, 4, L]

    cmp = idx + 1  # pos+1
    allowed = jnp.minimum(5, cmp // 8)
    ok_any = jnp.any(cmp[:, None, :] - counts <= allowed[:, None, :], axis=1)
    need_break = ~ok_any
    gate = (idx >= 8) | (cmp >= compare_req - 1)
    stop = need_break & gate & in_span
    # first stopping pos; if none, the loop runs to pos = rlen (one past end)
    P = first_true(stop, rlen)

    # counts at the stopping pos (inclusive); when P == rlen (no stop, whole
    # span consumed) the masked cumsum at clip(P) already equals the totals.
    Pc = jnp.clip(P, 0, L - 1)
    counts_at = jnp.take_along_axis(
        counts, jnp.broadcast_to(Pc[:, None, None], (B, 4, 1)), axis=-1)[..., 0]

    has_poly = (P + 1 >= compare_req) & (rlen > 0)

    # dominant base: first index with strictly greater count (reference uses
    # `>` so earlier bases win ties; argmax picks the first maximum)
    poly = jnp.argmax(counts_at, axis=1).astype(jnp.int32)
    poly_char = jnp.full(poly.shape, _BASES[0], jnp.uint8)
    for bi in range(1, 4):
        poly_char = jnp.where(poly == bi, jnp.uint8(_BASES[bi]), poly_char)

    # walk back: largest pos' <= P with tail_bases[pos'] == polyBase, else -1
    match = (tail_bases == poly_char[:, None]) & (idx <= P[:, None]) & in_span
    P2 = last_true(match, jnp.full((B,), -1, jnp.int32))

    # The reference records addPolyXTrimmed(poly, pos+1) whenever has_poly —
    # even if the walk-back reached pos == -1 (trim of 0 bases, resize no-op).
    trimmed = jnp.where(has_poly, P2 + 1, 0)
    new_hi = hi - trimmed
    poly_out = jnp.where(has_poly, poly, -1)
    return new_hi, poly_out, trimmed
