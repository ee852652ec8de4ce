"""Shared vectorized helpers for per-read [B, L] kernels."""

import jax.numpy as jnp


def first_true(mask, default):
    """Per-row index of first True in mask [B, L]; `default` [B] or scalar."""
    any_ = jnp.any(mask, axis=-1)
    idx = jnp.argmax(mask, axis=-1).astype(jnp.int32)
    return jnp.where(any_, idx, default)


def last_true(mask, default):
    """Per-row index of last True in mask [B, L]."""
    L = mask.shape[-1]
    any_ = jnp.any(mask, axis=-1)
    idx = (L - 1 - jnp.argmax(mask[..., ::-1], axis=-1)).astype(jnp.int32)
    return jnp.where(any_, idx, default)


def qual_cumsum(quals, lens):
    """Exclusive cumulative sum of raw quality bytes, zero beyond length.

    Returns cq [B, L+1] int32 with cq[:, j] = sum(qual[:, :j]).
    """
    B, L = quals.shape
    pos = jnp.arange(L, dtype=jnp.int32)
    q = jnp.where(pos[None, :] < lens[:, None], quals.astype(jnp.int32), 0)
    cq = jnp.cumsum(q, axis=-1)
    return jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cq], axis=-1)


def window_sums(cq, w):
    """True sliding-window sums S[:, s] = sum(q[s:s+w]) for all s in [0, L).

    Windows running past the end wrap into padding zeros (callers mask by
    valid range).  cq is the [B, L+1] exclusive cumsum.
    """
    L = cq.shape[-1] - 1
    s = jnp.arange(L, dtype=jnp.int32)
    hi = jnp.minimum(s + w, L)
    return jnp.take_along_axis(cq, hi[None, :], axis=-1) - cq[:, :L]
