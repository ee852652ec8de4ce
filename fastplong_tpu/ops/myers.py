"""Batched Myers bit-parallel Levenshtein distance.

Device equivalent of the reference's hot kernel (src/editdistance.cpp:31-126,
Hyyro/Myers VP/VN/HP/HN recurrence).  The pattern (an adapter, or an
adapter prefix when verifying partial matches) is encoded once as per-byte
bitmask blocks; the text (read windows) is scanned in a lax.scan, with every
batch lane carrying its own pattern length / text length.

Key properties exploited:
  * edit distance is symmetric, and invariant under reversing BOTH strings —
    so suffix-pattern comparisons are done against the reversed adapter's
    prefix, keeping the precomputed bitmasks fixed.
  * with a fixed full-pattern bitmask, per-lane shorter pattern lengths are
    handled by initializing VP to the low `plen` bits and reading the score
    bit at position plen-1: higher bitmask bits only ever carry upward and
    cannot affect the tracked score.

Blocks are uint32 (TPU-native); K = ceil(max_pattern_len/32) blocks are
unrolled statically.  Patterns longer than MAX_DEVICE_PATTERN fall back to
the host DP (ops.myers.edit_distance_host).
"""

import numpy as np
import jax
import jax.numpy as jnp

BLOCK = 32
# Device-pattern policy, mirroring the reference's algorithm boundary
# (editdistance.cpp:88-124: specialized Myers blocks up to 10x64 = 640bp,
# DP fallback beyond).  Patterns up to MAX_DEVICE_PATTERN use the unrolled
# select-chain kernel (myers_distance_unrolled, compile size O(K)); longer
# patterns use the block-scan kernel (myers_distance_blockscan, compile
# size O(1), runtime O(T*K)) — the TPU-native replacement for the
# reference's quadratic DP fallback.  Both compute exact Levenshtein
# distance; ops/adapter._verify_at picks per adapter length, and
# edit_distance_host below is the independent test oracle
# (tests/test_adapter.py, tests/test_golden_long_adapters.py).
MAX_DEVICE_PATTERN = 640


def build_pattern_table(pattern: bytes):
    """[256, K] uint32 bitmask table: bit i of block r set iff
    pattern[r*32+i] == byte."""
    plen = len(pattern)
    K = max(1, (plen + BLOCK - 1) // BLOCK)
    tbl = np.zeros((256, K), np.uint32)
    for i, ch in enumerate(pattern):
        tbl[ch, i // BLOCK] |= np.uint32(1) << np.uint32(i % BLOCK)
    return tbl


def myers_distance(pm_tbl, plen, text, tlen):
    """Batched edit distance of text[..., :tlen] vs pattern[:plen].

    pm_tbl: [256, K] uint32 (device array)
    plen:   [...] int32 per-lane pattern length (1..K*32)
    text:   [..., T] uint8 text bytes
    tlen:   [...] int32 per-lane text length (0..T)

    Returns [...] int32 distances.  Lanes with plen <= 0 return tlen
    (edit distance to the empty pattern).
    """
    K = pm_tbl.shape[1]
    T = text.shape[-1]
    shape = text.shape[:-1]
    plen = jnp.maximum(plen.astype(jnp.int32), 0)
    tlen = tlen.astype(jnp.int32)

    # per-lane VP init: low plen bits set across blocks
    def init_vp(r):
        bits = jnp.clip(plen - r * BLOCK, 0, BLOCK)
        full = jnp.uint32(0xFFFFFFFF)
        safe = jnp.clip(bits, 0, BLOCK - 1).astype(jnp.uint32)
        partial = (jnp.uint32(1) << safe) - jnp.uint32(1)
        return jnp.where(bits >= BLOCK, full, partial)

    VP0 = [init_vp(r) for r in range(K)]
    VN0 = [jnp.zeros(shape, jnp.uint32) for _ in range(K)]

    top_block = jnp.clip((plen - 1) // BLOCK, 0, K - 1)
    top_bit = jnp.where(plen > 0, (plen - 1) % BLOCK, 0).astype(jnp.uint32)
    lmb = jnp.uint32(1) << jnp.uint32(BLOCK - 1)
    one = jnp.uint32(1)
    zero32 = jnp.uint32(0)

    D0_init = jnp.where(plen > 0, plen, 0).astype(jnp.int32)

    def step(carry, xs):
        col, j = xs
        D, VP, VN = carry
        active = j < tlen
        pm = pm_tbl[col.astype(jnp.int32)]  # [..., K]
        newVP = []
        newVN = []
        HPs = []
        HNs = []
        hn_carry = jnp.zeros(shape, bool)
        hp_carry = jnp.ones(shape, bool)  # r==0 gets the +1 bit
        for r in range(K):
            X = pm[..., r]
            X = jnp.where(hn_carry, X | one, X)
            vp = VP[r]
            vn = VN[r]
            D0 = (((X & vp) + vp) ^ vp) | X | vn
            HP = vn | ~(D0 | vp)
            HN = D0 & vp
            X2 = HP << one
            X2 = jnp.where(hp_carry, X2 | one, X2)
            vp_new = (HN << one) | ~(D0 | X2)
            vp_new = jnp.where(hn_carry, vp_new | one, vp_new)
            vn_new = D0 & X2
            newVP.append(jnp.where(active, vp_new, vp))
            newVN.append(jnp.where(active, vn_new, vn))
            HPs.append(HP)
            HNs.append(HN)
            hn_carry = (HN & lmb) != zero32
            hp_carry = (HP & lmb) != zero32
        HPst = jnp.stack(HPs, axis=-1)
        HNst = jnp.stack(HNs, axis=-1)
        hp_top = jnp.take_along_axis(HPst, top_block[..., None], axis=-1)[..., 0]
        hn_top = jnp.take_along_axis(HNst, top_block[..., None], axis=-1)[..., 0]
        inc = jnp.where(((hp_top >> top_bit) & one) != zero32, 1,
                        jnp.where(((hn_top >> top_bit) & one) != zero32, -1, 0))
        D = jnp.where(active & (plen > 0), D + inc, D)
        return (D, newVP, newVN), None

    text_t = jnp.moveaxis(text, -1, 0)  # [T, ...]
    (D, _, _), _ = jax.lax.scan(
        step, (D0_init, VP0, VN0),
        (text_t, jnp.arange(T, dtype=jnp.int32)))
    # empty pattern: distance = tlen
    D = jnp.where(plen > 0, D, tlen)
    return D


def build_pattern_masks(pattern: bytes):
    """{char: tuple of K uint32 ints} bitmasks + K, for the select-chain
    kernel (no device tables, so no gathers)."""
    plen = len(pattern)
    K = max(1, (plen + BLOCK - 1) // BLOCK)
    masks = {}
    for i, ch in enumerate(pattern):
        if ch not in masks:
            masks[ch] = [0] * K
        masks[ch][i // BLOCK] |= 1 << (i % BLOCK)
    return {ch: tuple(m) for ch, m in masks.items()}, K


def myers_distance_unrolled(masks, K, plen, text, tlen, T=None):
    """Batched Myers distance with all pattern lookups as select chains —
    no gathers anywhere.  The text loop is a lax.scan (tiny-bodied scans
    are cheap on TPU; unrolling instead blows up XLA compile for long
    patterns).

    masks/K: from build_pattern_masks (python ints).
    plen: [...] per-lane pattern length; text: [..., T] uint8;
    tlen: [...] per-lane text length.
    """
    if T is None:
        T = text.shape[-1]
    shape = text.shape[:-1]
    plen = jnp.maximum(plen.astype(jnp.int32), 0)
    tlen = tlen.astype(jnp.int32)

    one = jnp.uint32(1)
    zero32 = jnp.uint32(0)
    lmb = jnp.uint32(1) << jnp.uint32(BLOCK - 1)

    def init_vp(r):
        bits = jnp.clip(plen - r * BLOCK, 0, BLOCK)
        full = jnp.uint32(0xFFFFFFFF)
        safe = jnp.clip(bits, 0, BLOCK - 1).astype(jnp.uint32)
        partial = (jnp.uint32(1) << safe) - jnp.uint32(1)
        return jnp.where(bits >= BLOCK, full, partial)

    VP0 = [init_vp(r) for r in range(K)]
    VN0 = [jnp.zeros(shape, jnp.uint32) for _ in range(K)]
    D0_ = jnp.where(plen > 0, plen, 0).astype(jnp.int32)

    top_block = jnp.clip((plen - 1) // BLOCK, 0, K - 1)
    top_bit = jnp.where(plen > 0, (plen - 1) % BLOCK, 0).astype(jnp.uint32)

    def step(carry, xs):
        col, j = xs
        D, VP, VN = carry
        active = j < tlen
        hn_carry = jnp.zeros(shape, bool)
        hp_carry = jnp.ones(shape, bool)
        newVP = []
        newVN = []
        HPs = []
        HNs = []
        for r in range(K):
            X = jnp.zeros(shape, jnp.uint32)
            for ch, mlist in masks.items():
                if mlist[r]:
                    X = jnp.where(col == ch, jnp.uint32(mlist[r]), X)
            X = jnp.where(hn_carry, X | one, X)
            vp = VP[r]
            vn = VN[r]
            D0 = (((X & vp) + vp) ^ vp) | X | vn
            HP = vn | ~(D0 | vp)
            HN = D0 & vp
            X2 = HP << one
            X2 = jnp.where(hp_carry, X2 | one, X2)
            vp_new = (HN << one) | ~(D0 | X2)
            vp_new = jnp.where(hn_carry, vp_new | one, vp_new)
            vn_new = D0 & X2
            newVP.append(jnp.where(active, vp_new, vp))
            newVN.append(jnp.where(active, vn_new, vn))
            HPs.append(HP)
            HNs.append(HN)
            hn_carry = (HN & lmb) != zero32
            hp_carry = (HP & lmb) != zero32
        # top-block selection without a gather: where-chain over K
        hp_top = HPs[0]
        hn_top = HNs[0]
        for r in range(1, K):
            hp_top = jnp.where(top_block == r, HPs[r], hp_top)
            hn_top = jnp.where(top_block == r, HNs[r], hn_top)
        inc = jnp.where(((hp_top >> top_bit) & one) != zero32, 1,
                        jnp.where(((hn_top >> top_bit) & one) != zero32, -1, 0))
        D = jnp.where(active & (plen > 0), D + inc, D)
        return (D, newVP, newVN), None

    text_t = jnp.moveaxis(text, -1, 0)
    (D, _, _), _ = jax.lax.scan(
        step, (D0_, VP0, VN0),
        (text_t, jnp.arange(T, dtype=jnp.int32)))
    return jnp.where(plen > 0, D, tlen)


def myers_distance_blockscan(pm_tbl, plen, text, tlen):
    """Batched Myers distance for patterns BEYOND MAX_DEVICE_PATTERN.

    Same results as myers_distance_unrolled, but the per-column block
    recurrence runs as a lax.scan over the K uint32 blocks, so the
    compiled program size is constant in the pattern length — a 5kbp
    FASTA adapter must not unroll 160 blocks into the jit graph.  The
    pattern table is a device gather ([256, K]); acceptable because this
    kernel only ever runs for rare oversized adapters.

    pm_tbl: [256, K] uint32 from build_pattern_table (numpy or device).
    plen/tlen: [...] per-lane lengths; text: [..., T] uint8.
    """
    pm_tbl = jnp.asarray(pm_tbl)
    K = pm_tbl.shape[1]
    T = text.shape[-1]
    shape = text.shape[:-1]
    plen = jnp.maximum(plen.astype(jnp.int32), 0)
    tlen = tlen.astype(jnp.int32)

    r_idx = jnp.arange(K, dtype=jnp.int32)
    bits = jnp.clip(plen[..., None] - r_idx * BLOCK, 0, BLOCK)
    full = jnp.uint32(0xFFFFFFFF)
    safe = jnp.clip(bits, 0, BLOCK - 1).astype(jnp.uint32)
    VP0 = jnp.where(bits >= BLOCK, full,
                    (jnp.uint32(1) << safe) - jnp.uint32(1))   # [..., K]
    VN0 = jnp.zeros(shape + (K,), jnp.uint32)
    D0_init = jnp.where(plen > 0, plen, 0).astype(jnp.int32)

    top_block = jnp.clip((plen - 1) // BLOCK, 0, K - 1)
    top_bit = jnp.where(plen > 0, (plen - 1) % BLOCK, 0).astype(jnp.uint32)
    one = jnp.uint32(1)
    zero32 = jnp.uint32(0)
    lmb = jnp.uint32(1) << jnp.uint32(BLOCK - 1)

    def col_step(carry, xs):
        col, j = xs
        D, VP, VN = carry
        active = j < tlen
        pm = pm_tbl[col.astype(jnp.int32)]          # [..., K]

        def block_step(bc, xs_r):
            hn_carry, hp_carry = bc
            X, vp, vn = xs_r                        # [...] per block
            X = jnp.where(hn_carry, X | one, X)
            D0 = (((X & vp) + vp) ^ vp) | X | vn
            HP = vn | ~(D0 | vp)
            HN = D0 & vp
            X2 = HP << one
            X2 = jnp.where(hp_carry, X2 | one, X2)
            vp_new = (HN << one) | ~(D0 | X2)
            vp_new = jnp.where(hn_carry, vp_new | one, vp_new)
            vn_new = D0 & X2
            hn_next = (HN & lmb) != zero32
            hp_next = (HP & lmb) != zero32
            return (hn_next, hp_next), (vp_new, vn_new, HP, HN)

        init = (jnp.zeros(shape, bool), jnp.ones(shape, bool))
        xs_r = (jnp.moveaxis(pm, -1, 0), jnp.moveaxis(VP, -1, 0),
                jnp.moveaxis(VN, -1, 0))
        _, (vp_new, vn_new, HPs, HNs) = jax.lax.scan(block_step, init, xs_r)
        vp_new = jnp.moveaxis(vp_new, 0, -1)
        vn_new = jnp.moveaxis(vn_new, 0, -1)
        HPs = jnp.moveaxis(HPs, 0, -1)
        HNs = jnp.moveaxis(HNs, 0, -1)
        VP = jnp.where(active[..., None], vp_new, VP)
        VN = jnp.where(active[..., None], vn_new, VN)
        hp_top = jnp.take_along_axis(HPs, top_block[..., None],
                                     axis=-1)[..., 0]
        hn_top = jnp.take_along_axis(HNs, top_block[..., None],
                                     axis=-1)[..., 0]
        inc = jnp.where(((hp_top >> top_bit) & one) != zero32, 1,
                        jnp.where(((hn_top >> top_bit) & one) != zero32,
                                  -1, 0))
        D = jnp.where(active & (plen > 0), D + inc, D)
        return (D, VP, VN), None

    text_t = jnp.moveaxis(text, -1, 0)
    (D, _, _), _ = jax.lax.scan(
        col_step, (D0_init, VP0, VN0),
        (text_t, jnp.arange(T, dtype=jnp.int32)))
    return jnp.where(plen > 0, D, tlen)


def edit_distance_host(a: bytes, b: bytes) -> int:
    """Host DP oracle (the reference's >640bp fallback algorithm,
    editdistance.cpp:66-76).  Not in the pipeline: the device covers all
    pattern lengths (unrolled kernel to MAX_DEVICE_PATTERN, block-scan
    beyond); this is the independent cross-check the kernel tests and the
    long-adapter goldens compare against."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = np.arange(lb + 1, dtype=np.int32)
    bb = np.frombuffer(b, np.uint8).astype(np.int32)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, np.int32)
        cur[0] = i
        sub = prev[:-1] + (bb != a[i - 1])
        cur[1:] = np.minimum(prev[1:] + 1, sub)
        for j in range(1, lb + 1):  # resolve left-dependency
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[lb])
