"""Per-row variable shift ("span alignment") without gathers.

TPU data-dependent gathers run on the slow path (~30-80ms per call on a
[B, L] batch); a stable sort on a binary key implements `out[b, j] =
in[b, lo[b] + j]` at full VPU speed instead: positions before lo get key 1
and are stably moved to the row tail, leaving the span left-aligned.
"""

import jax
import jax.numpy as jnp


def align_rows(values_u16, lo):
    """values_u16: [B, L] uint16; returns rows shifted left by lo[b].

    Positions j >= L - lo[b] contain the wrapped-around prefix (callers
    mask by span length)."""
    B, L = values_u16.shape
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    key = (idx < lo[:, None]).astype(jnp.uint8)
    _, out = jax.lax.sort_key_val(
        jnp.broadcast_to(key, (B, L)), values_u16, dimension=1,
        is_stable=True)
    return out


def align_spans(bases, quals, lo, hi):
    """Shift each read's span [lo, hi) to start at column 0.

    Returns (bases_aligned, quals_aligned, valid_mask) — one packed sort
    for both arrays."""
    B, L = bases.shape
    packed = (bases.astype(jnp.uint16) << 8) | quals.astype(jnp.uint16)
    out = align_rows(packed, lo)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    m = idx < (hi - lo)[:, None]
    b = jnp.where(m, (out >> 8).astype(jnp.uint8), 0)
    q = jnp.where(m, (out & 0xFF).astype(jnp.uint8), 0)
    return b, q, m


def align_single(values_u8, lo, n):
    """Shift one uint8 array left by lo, masked to n valid columns."""
    B, L = values_u8.shape
    out = align_rows(values_u8.astype(jnp.uint16), lo)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    m = idx < n[:, None]
    return jnp.where(m, out.astype(jnp.uint8), 0), m
