"""Adapter search and trimming.

Vectorized equivalent of the reference AdapterTrimmer
(src/adaptertrimmer.cpp): sliding mismatch-count scans over 200bp end
windows with three scan policies, a 16-mer seed scan by edit distance, and
Myers-verified decision ladders for trimBySequenceStart/End, plus the
whole-read middle-adapter search.

Reference decision-ladder quirks preserved exactly:
  * the early-return "mismatch <= threshold" path skips the edit-distance
    verification (adaptertrimmer.cpp:99-101,124-126);
  * tie-breaks differ per policy (leftmost scan keeps the LAST best, the
    rightmost scan keeps the LOWEST best, global keeps the FIRST best);
  * the end-side partial scan stops at the first candidate whose edit
    distance exceeds the running minimum ("last one is best" with break,
    adaptertrimmer.cpp:273-286), while the start side keeps scanning;
  * trimFront clamps to length-1, while resize can empty the read;
  * the end-side partial path requires pos > 0 (adaptertrimmer.cpp:288).

Spans [lo, hi) index the padded batch; all outputs are per-read scalars the
host applies to record bytes.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from .myers import (build_pattern_table, build_pattern_masks,
                    myers_distance, myers_distance_unrolled,
                    myers_distance_blockscan, BLOCK, MAX_DEVICE_PATTERN)
from .primitives import first_true, last_true

WINDOW = 200
PATTERN_LEN = 16


def _cpp_round(x: float) -> int:
    return int(math.floor(x + 0.5))


class AdapterSpec:
    """Host-precomputed constants for one adapter sequence.

    Long-adapter policy (verified against the reference at 640/704bp by
    tests/test_golden_long_adapters.py):
      * the start/end trim verifies compare at most min(alen, WINDOW)
        pattern bytes — the full-match search is structurally empty for
        alen >= WINDOW (searchAdapter's ranges collapse,
        adaptertrimmer.cpp:80-110), and the partial path's cmplen is
        bounded by the window — so their bitmask tables are capped at
        WINDOW and never unroll more than ceil(WINDOW/32) blocks;
      * only the middle-adapter global search needs full-length edit
        distance; it uses the unrolled kernel up to MAX_DEVICE_PATTERN
        and the compile-bounded block-scan kernel beyond (the reference's
        DP-fallback boundary, editdistance.cpp:88-124).
    """

    def __init__(self, seq: str, ed_max: float):
        self.seq = seq
        self.data = seq.encode("latin-1")
        self.alen = len(seq)
        self.plen = min(PATTERN_LEN, self.alen)
        self.ed_max = ed_max
        self.thr_full = _cpp_round(ed_max * self.alen)
        self.thr_seed = _cpp_round(ed_max * self.plen)
        self.verify_cap = min(self.alen, WINDOW)
        self.pm_fwd, self.K = build_pattern_masks(self.data[:self.verify_cap])
        self.pm_rev, _ = build_pattern_masks(
            self.data[::-1][:self.verify_cap])
        # full-length tables, only consumed by the middle-adapter search
        if self.alen <= MAX_DEVICE_PATTERN:
            self.pm_full, self.K_full = build_pattern_masks(self.data)
            self.pm_full_tbl = None
        else:
            self.pm_full, self.K_full = None, (self.alen + BLOCK - 1) // BLOCK
            self.pm_full_tbl = build_pattern_table(self.data)
        # thresholds for every possible cmplen (plen..alen), python ints
        self.thr_list = [_cpp_round(ed_max * c) for c in range(self.alen + 1)]
        self.adapter_arr = jnp.asarray(
            np.frombuffer(self.data, np.uint8)) if self.alen else \
            jnp.zeros(0, jnp.uint8)
        # python-int bitmasks of the seed patterns (char -> plen-bit mask)
        self.seed_masks_fwd = _seed_masks(self.data[:self.plen])
        self.seed_masks_rev = _seed_masks(self.data[::-1][:self.plen])


def _seed_masks(pattern: bytes):
    """{char_byte: bitmask} with bit i set iff pattern[i] == char."""
    masks = {}
    for i, ch in enumerate(pattern):
        masks[ch] = masks.get(ch, 0) | (1 << i)
    return masks


def _region(bases, start_abs, R, valid_len):
    B, L = bases.shape
    j = jnp.arange(R, dtype=jnp.int32)[None, :]
    src = start_abs[:, None] + j
    ok = (j < valid_len[:, None]) & (src >= 0) & (src < L)
    out = jnp.take_along_axis(bases, jnp.clip(src, 0, L - 1), axis=-1)
    return jnp.where(ok, out, 0)


def _mismatch_full(bases, data: bytes):
    """mm[b, p] = #(bases[b, p+i] != adapter[i], i<alen) at EVERY raw
    position p in [0, L).  Windows running past L compare against zero
    padding (callers mask by range).  Returned dtype is uint8 when the
    count fits (alen <= 255) — the array is shared by several consumers,
    so XLA materializes it once and the narrow dtype quarters that HBM
    round trip (search_full widens in-register).

    The default is the jnp shifted-compare form: measured on v5e it beats
    the VMEM-tiled Pallas kernel 4x standalone (0.096 vs 0.414 ms on
    [1024, 8192] x 28bp) and ~10% on the full fused step — XLA's fusion
    of 28 uint8 compare-adds is already at the HBM roofline, and the
    Pallas version forces a tile materialization XLA avoids.  The kernel
    is kept behind FASTPLONG_PALLAS=1 (ops/pallas_kernels.py)."""
    from .pallas_kernels import use_pallas, mismatch_scan
    if use_pallas():
        mm = mismatch_scan(bases, data)
        if mm is not None:
            return mm
    B, L = bases.shape
    alen = len(data)
    padded = jnp.pad(bases, ((0, 0), (0, alen)))
    if alen <= 255:
        mm = jnp.zeros((B, L), jnp.uint8)
        for i, ch in enumerate(data):
            mm = mm + (padded[:, i:i + L] != ch).astype(jnp.uint8)
        return mm
    mm = jnp.zeros((B, L), jnp.int32)
    for i, ch in enumerate(data):
        mm = mm + (padded[:, i:i + L] != ch)
    return mm


def _verify_at(bases, abs_start, spec, cmplen=None, reverse=False,
               full=False):
    """Myers distance of the window starting (or ending) at abs_start.

    forward: text = bases[abs_start : abs_start+n], pattern = adapter[:n]
    reverse: text = reversed bases[abs_start-n+1 ... abs_start],
             pattern = reversed(adapter)[:n]  (== adapter suffix of len n)
    n = cmplen (per-lane) or alen.

    full=False (trim-stage verifies): pattern tables capped at
    min(alen, WINDOW) — cmplen never exceeds the window there.
    full=True (middle-adapter search): full-length pattern; unrolled
    kernel up to MAX_DEVICE_PATTERN, block-scan beyond.
    """
    B, L = bases.shape
    alen = spec.alen
    n = cmplen if cmplen is not None else jnp.full((B,), alen, jnp.int32)
    T = max(alen if full else spec.verify_cap, 1)
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    if reverse:
        src = abs_start[:, None] - j
    else:
        src = abs_start[:, None] + j
    ok = (j < n[:, None]) & (src >= 0) & (src < L)
    text = jnp.where(ok, jnp.take_along_axis(
        bases, jnp.clip(src, 0, L - 1), axis=-1), 0)
    if full:
        assert not reverse
        if spec.pm_full is not None:
            return myers_distance_unrolled(spec.pm_full, spec.K_full,
                                           n, text, n)
        return myers_distance_blockscan(spec.pm_full_tbl, n, text, n)
    pm = spec.pm_rev if reverse else spec.pm_fwd
    return myers_distance_unrolled(pm, spec.K, n, text, n)


def _thr_select(cmplen, spec):
    """round(edMax*cmplen) per lane as a select chain over the static
    threshold table (no device-table gather)."""
    thr = jnp.zeros(cmplen.shape, jnp.int32)
    for c in range(1, spec.alen + 1):
        t = spec.thr_list[c]
        if c == 1 or t != spec.thr_list[c - 1]:
            thr = jnp.where(cmplen >= c, t, thr)
    return thr


def _pm_select(col, masks, dtype=jnp.uint32):
    """Pattern-mask lookup without a gather: a select chain over the (at
    most 5) distinct pattern characters."""
    pm = jnp.zeros(col.shape, dtype)
    for ch, m in masks.items():
        pm = jnp.where(col == ch, dtype(m), pm)
    return pm


def _seed_scan(bases, base_abs, ncand, spec, start_side):
    """ed16[b, p] for p in [0, P): edit distance of the p-th seed window.

    start side: text = read[p : p+plen] reversed, pattern = rev(adapter)[:plen]
    end side:   text = read[rlen-plen-p : rlen-p], pattern = adapter[:plen]
    base_abs: absolute index of the p=0 window's anchor
      (start side: lo;  end side: lo + rlen - plen)

    All P windows advance one Myers step per unrolled iteration; the text
    column for step j is a SLICE of a small gathered region, and the
    pattern-mask lookup is a select chain — no gathers in the loop, pure
    VPU work on [B, P] lanes (plen <= 16 so a single uint32 block).
    """
    B, L = bases.shape
    plen = spec.plen
    P = WINDOW - PATTERN_LEN  # static number of candidate positions
    R = P + plen  # bytes touched by all candidate windows
    if start_side:
        region = _region(bases, base_abs, R, jnp.full((B,), R, jnp.int32))
        masks = spec.seed_masks_rev
    else:
        region = _region(bases, base_abs - (P - 1), R,
                         jnp.full((B,), R, jnp.int32))
        masks = spec.seed_masks_fwd

    one = jnp.uint32(1)
    full = jnp.uint32((1 << plen) - 1)
    top = jnp.uint32(1 << (plen - 1))
    zero32 = jnp.uint32(0)
    VP = jnp.full((B, P), full, jnp.uint32)
    VN = jnp.zeros((B, P), jnp.uint32)
    D = jnp.full((B, P), plen, jnp.int32)
    for j in range(plen):
        if start_side:
            # window p, step j reads region[p + plen-1-j]
            col = region[:, plen - 1 - j: plen - 1 - j + P]
        else:
            # window p, step j reads region[P-1-p + j] = flip(region[j:j+P])
            col = region[:, j: j + P][:, ::-1]
        X = _pm_select(col, masks)
        D0 = (((X & VP) + VP) ^ VP) | X | VN
        HP = VN | ~(D0 | VP)
        HN = D0 & VP
        X2 = (HP << one) | one
        VP = ((HN << one) | ~(D0 | X2)) & full
        VN = D0 & X2
        D = D + jnp.where((HP & top) != zero32, 1,
                          jnp.where((HN & top) != zero32, -1, 0))
    p = jnp.arange(P, dtype=jnp.int32)[None, :]
    valid = p < ncand[:, None]
    return jnp.where(valid, D, 10 ** 6)


def search_full(mm, rlen, alen, thr, lo_rel, hi_rel_excl, policy):
    """Shared full-match searchAdapter policies over a mismatch array.

    mm[b, p] is relative to some anchor; candidate range is
    [lo_rel, hi_rel_excl) (per-lane).  policy: 'left' | 'right' | 'global'.
    Returns (pos, needs_verify) where pos is the relative position or -1;
    needs_verify=True lanes must pass the Myers check (early-exit lanes
    skip it, matching adaptertrimmer.cpp:99-101).
    """
    B, P = mm.shape
    mm = mm.astype(jnp.int32)  # may arrive uint8 (_mismatch_full)
    p = jnp.arange(P, dtype=jnp.int32)[None, :]
    in_range = (p >= lo_rel[:, None]) & (p < hi_rel_excl[:, None])
    mm_m = jnp.where(in_range, mm, 10 ** 6)
    has_any = jnp.any(in_range, axis=-1)

    early_mask = in_range & (mm <= thr)
    if policy == "right":
        early = last_true(early_mask, -1)
    else:  # 'left' scans ascending
        early = first_true(early_mask, -1)

    if policy == "left":
        # ties keep the LAST best: last index achieving the min
        mn = jnp.min(mm_m, axis=-1)
        best = last_true(mm_m == mn[:, None], -1)
    else:
        # 'right' and 'global': first index achieving the min
        best = jnp.argmin(mm_m, axis=-1).astype(jnp.int32)
    best = jnp.where(has_any, best, -1)

    if policy == "global":
        pos = best
        needs_verify = pos >= 0
    else:
        pos = jnp.where(early >= 0, early, best)
        needs_verify = (early < 0) & (best >= 0)
    return pos, needs_verify


def trim_by_sequence_start(bases, lo, hi, spec, ext, mm=None):
    """Returns (new_lo, trimmed_ret, rec_cmplen) per read.

    trimmed_ret: value added to FilterResult (0 = no trim).
    rec_cmplen:  0 = none, alen = full adapter, else the partial cmplen
                 (record adapter[alen-cmplen:]).
    """
    B, L = bases.shape
    alen, plen = spec.alen, spec.plen
    rlen = hi - lo
    eligible = rlen >= PATTERN_LEN
    if alen == 0:
        z = jnp.zeros((B,), jnp.int32)
        return lo, z, z

    # mismatch counts over RAW positions; candidate ranges offset by lo
    if mm is None:
        mm = _mismatch_full(bases, spec.data)

    if alen < WINDOW:
        search_end = jnp.minimum(rlen, WINDOW)
        # searchAdapter(.., 0, WINDOW, false, true): rightmost policy needs
        # searchEnd > alen; also searchStart + alen > rlen -> -1
        valid_search = (alen <= rlen) & (search_end > alen)
        pos_f, needs_v = search_full(
            mm, rlen, alen, spec.thr_full,
            lo, lo + search_end - alen + 1, "right")
        pos_f = jnp.where(valid_search & (pos_f >= 0), pos_f - lo, -1)
        ed_f = _verify_at(bases, lo + jnp.maximum(pos_f, 0), spec)
        ok_f = (pos_f >= 0) & jnp.where(needs_v, ed_f <= spec.thr_full, True)
    else:
        # alen >= WINDOW: the reference's full-match ranges are empty —
        # searchEnd = min(rlen, WINDOW) <= alen fails both the rightmost
        # gate and the global loop bound (adaptertrimmer.cpp:80-110)
        pos_f = jnp.full((B,), -1, jnp.int32)
        ok_f = jnp.zeros((B,), bool)

    # ---- partial 16-mer path
    ncand = jnp.clip(jnp.minimum(rlen - plen, WINDOW - plen), 0, None)
    ed16 = _seed_scan(bases, lo, ncand, spec, start_side=True)
    cand = ed16 <= spec.thr_seed
    e_m = jnp.where(cand, ed16, 10 ** 6)
    pos_p = jnp.where(jnp.any(cand, axis=-1),
                      jnp.argmin(e_m, axis=-1).astype(jnp.int32), -1)
    cmplen = jnp.minimum(pos_p + plen, alen)
    # verify: ed(read[pos+plen-cmplen : pos+plen], adapter[alen-cmplen:])
    ed_p = _verify_at(bases, lo + jnp.maximum(pos_p, 0) + plen - 1, spec,
                      cmplen=cmplen, reverse=True)
    thr_c = _thr_select(cmplen, spec)
    ok_p = (pos_p >= 0) & (ed_p <= thr_c)

    # ---- combine (full match wins; partial only tried if no full match)
    mpos = jnp.minimum(pos_f + ext, rlen - alen)
    n_full = mpos + alen
    ppos = jnp.minimum(pos_p + ext, rlen - alen)
    n_part = ppos + plen

    use_full = eligible & ok_f
    use_part = eligible & ~ok_f & ok_p
    n = jnp.where(use_full, n_full, jnp.where(use_part, n_part, 0))
    trimmed = use_full | use_part
    # trimFront semantics (read.cpp:69-73): min(len-1, n); negative empties
    applied = jnp.where(n < 0, rlen, jnp.minimum(n, rlen - 1))
    new_lo = jnp.where(trimmed, lo + applied, lo)
    trimmed_ret = jnp.where(trimmed, n, 0)
    rec = jnp.where(use_full, alen, jnp.where(use_part, cmplen, 0))
    return new_lo, trimmed_ret, rec


def trim_by_sequence_end(bases, lo, hi, spec, ext, mm=None):
    """Returns (new_hi, trimmed_ret, rec_cmplen); rec as in start side but
    recording adapter[:cmplen]."""
    B, L = bases.shape
    alen, plen = spec.alen, spec.plen
    rlen = hi - lo
    eligible = rlen >= PATTERN_LEN
    if alen == 0:
        z = jnp.zeros((B,), jnp.int32)
        return hi, z, z

    # ---- full match: leftmost in [searchStart, rlen-alen) over the last
    # WINDOW bases; raw-coordinate mismatch scan, range offset by lo
    if mm is None:
        mm = _mismatch_full(bases, spec.data)
    if alen < WINDOW:
        search_start = jnp.maximum(rlen - WINDOW, 0)
        valid_search = (search_start + alen) <= rlen
        pos_f, needs_v = search_full(
            mm, rlen, alen, spec.thr_full,
            lo + search_start, lo + rlen - alen, "left")
        pos_f = jnp.where(valid_search & (pos_f >= 0),
                          pos_f - lo - search_start, -1)
        abs_f = search_start + pos_f  # position within the span
        ed_f = _verify_at(bases, lo + jnp.maximum(abs_f, 0), spec)
        ok_f = (pos_f >= 0) & jnp.where(needs_v, ed_f <= spec.thr_full, True)
    else:
        # alen >= WINDOW: rlen - alen <= max(rlen - WINDOW, 0) makes the
        # leftmost loop empty for every rlen (adaptertrimmer.cpp:86-95)
        pos_f = jnp.full((B,), -1, jnp.int32)
        abs_f = pos_f
        ok_f = jnp.zeros((B,), bool)

    # ---- partial: sequential-break scan (adaptertrimmer.cpp:269-286)
    ncand = jnp.clip(jnp.minimum(rlen - plen, WINDOW - plen), 0, None)
    ed16 = _seed_scan(bases, lo + rlen - plen, ncand, spec, start_side=False)
    cand = ed16 <= spec.thr_seed
    e_m = jnp.where(cand, ed16, 10 ** 6)
    firstc = first_true(cand, 10 ** 6)
    P = e_m.shape[1]
    pidx = jnp.arange(P, dtype=jnp.int32)[None, :]
    # exclusive running min over candidates before p
    prevmin = jnp.concatenate(
        [jnp.full((B, 1), 10 ** 6, jnp.int32),
         jax.lax.cummin(e_m, axis=1)[:, :-1]], axis=1)
    breaking = cand & (pidx > firstc[:, None]) & (e_m > prevmin)
    pb = first_true(breaking, P)
    pos_p = last_true(cand & (pidx < pb[:, None]),
                      jnp.full((B,), -1, jnp.int32))
    # reference requires pos > 0 strictly for the partial path
    has_p = pos_p > 0
    cmplen = jnp.minimum(pos_p + plen, alen)
    ed_p = _verify_at(bases, lo + rlen - plen - jnp.maximum(pos_p, 0), spec,
                      cmplen=cmplen, reverse=False)
    thr_c = _thr_select(cmplen, spec)
    ok_p = has_p & (ed_p <= thr_c)

    # ---- combine
    mpos = jnp.maximum(abs_f - ext, 0)
    use_full = eligible & ok_f
    use_part = eligible & ~ok_f & ok_p
    ppos = jnp.minimum(pos_p + ext, rlen - plen)
    new_len_full = mpos          # resize(mpos)
    new_len_part = rlen - plen - ppos
    new_len = jnp.where(use_full, new_len_full,
                        jnp.where(use_part, new_len_part, rlen))
    # resize is a no-op if new_len > rlen or < 0 (read.cpp:62-67)
    new_len = jnp.where((new_len >= 0) & (new_len <= rlen), new_len, rlen)
    new_hi = lo + new_len
    trimmed_ret = jnp.where(use_full, rlen - mpos,
                            jnp.where(use_part, ppos + plen, 0))
    rec = jnp.where(use_full, alen, jnp.where(use_part, cmplen, 0))
    return new_hi, trimmed_ret, rec


def search_global(bases, lo, hi, spec, mm=None):
    """searchAdapter with default policy over the whole span (used by
    findMiddleAdapters).  Returns position within span or -1."""
    B, L = bases.shape
    alen = spec.alen
    rlen = hi - lo
    if alen == 0:
        # degenerate: empty adapter "matches" at 0 whenever the global loop
        # runs at least once (rlen > 0)
        return jnp.where(rlen > 0, 0, -1).astype(jnp.int32)
    if mm is None:
        mm = _mismatch_full(bases, spec.data)
    valid = alen <= rlen
    pos, needs_v = search_full(
        mm, rlen, alen, spec.thr_full, lo, lo + rlen - alen, "global")
    pos = jnp.where(valid & (pos >= 0), pos - lo, -1)
    ed = _verify_at(bases, lo + jnp.maximum(pos, 0), spec, full=True)
    ok = (pos >= 0) & (ed <= spec.thr_full)
    return jnp.where(ok, pos, -1)


def find_middle_adapters(bases, lo, hi, start_spec, end_spec, ext,
                         mm_start=None, mm_end=None):
    """Reference findMiddleAdapters (adaptertrimmer.cpp:13-40).

    Returns (found, start, length) relative to the span."""
    rlen = hi - lo
    sp = search_global(bases, lo, hi, start_spec, mm=mm_start)
    ep = search_global(bases, lo, hi, end_spec, mm=mm_end)
    slen = start_spec.alen
    elen = end_spec.alen

    both = (sp >= 0) & (ep >= 0)
    s_only = (sp >= 0) & (ep < 0)
    e_only = (ep >= 0) & (sp < 0)

    b_start = jnp.maximum(jnp.minimum(sp, ep) - ext, 0)
    b_end = jnp.minimum(jnp.maximum(sp + slen, ep + elen) + ext, rlen)

    s_start = jnp.maximum(sp - ext, 0)
    s_end = jnp.minimum(sp + slen + ext, rlen)

    e_start = jnp.maximum(ep - ext, 0)
    e_end = jnp.minimum(ep + elen + ext, rlen)

    start = jnp.where(both, b_start, jnp.where(s_only, s_start, e_start))
    end = jnp.where(both, b_end, jnp.where(s_only, s_end, e_end))
    found = both | s_only | e_only
    return found, jnp.where(found, start, -1), jnp.where(found, end - start, 0)
