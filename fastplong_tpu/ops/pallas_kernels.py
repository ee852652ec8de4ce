"""Pallas TPU kernels for the hot inner ops.

`mismatch_scan` computes mm[b, p] = #(bases[b, p+i] != adapter[i]) at every
position — the adapter-search workhorse (reference adaptertrimmer.cpp:59-166
vectorizes this with Highway SIMD).  The jnp fallback implements it as
`alen` shifted compares, i.e. `alen` passes over the [B, L] array in HBM;
this kernel tiles the array through VMEM once and runs the compare-
accumulate loop on-chip, cutting HBM traffic by ~alen x for long reads.

Windows crossing a tile boundary read from a second input ref mapped to the
NEXT tile (same array, block index j+1), so no halo exchange is needed; the
caller pads L so the j+1 block always exists.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 8
TILE_L = 512
MAX_PALLAS_ALEN = 256  # <= TILE_L so one lookahead tile suffices


def use_pallas():
    """Default OFF as of round 3: measured on v5e, the XLA jnp
    shifted-compare form of the mismatch scan beats this kernel 4x
    standalone and ~10% on the full fused step (tools/device_roofline.py)
    — XLA already runs that chain at the HBM roofline with uint8
    accumulators and avoids the tile materialization pallas_call forces.
    FASTPLONG_PALLAS=1 re-enables for future hardware where the balance
    differs."""
    flag = os.environ.get("FASTPLONG_PALLAS", "auto")
    if flag != "1":
        return False
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat not in ("cpu",)


def _kernel(data, cur_ref, nxt_ref, out_ref):
    # int8 compares are unsupported on some TPU targets; widen once in VMEM
    tile = jnp.concatenate([cur_ref[:], nxt_ref[:]], axis=1).astype(jnp.int32)
    mm = jnp.zeros((tile.shape[0], TILE_L), jnp.int32)
    for i, ch in enumerate(data):
        mm = mm + (tile[:, i:i + TILE_L] != ch).astype(jnp.int32)
    out_ref[:] = mm


@functools.partial(jax.jit, static_argnames=("data", "interpret"))
def _mismatch_pallas(bases, data, interpret=False):
    B, L = bases.shape
    Lp = ((L + TILE_L - 1) // TILE_L) * TILE_L
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B
    # one extra tile of zero padding so the j+1 lookahead block exists
    x = jnp.pad(bases, ((0, Bp - B), (0, Lp - L + TILE_L)))
    grid = (Bp // TILE_B, Lp // TILE_L)
    out = pl.pallas_call(
        functools.partial(_kernel, data),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, TILE_L), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, TILE_L), lambda i, j: (i, j + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, TILE_L), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x)
    return out[:B, :L]


def mismatch_scan(bases, data: bytes, interpret=False):
    """Pallas-accelerated mismatch scan; returns None when unavailable so
    the caller falls back to the jnp version (ops.adapter._mismatch_full)."""
    if not data or len(data) > MAX_PALLAS_ALEN:
        return None
    try:
        return _mismatch_pallas(bases, tuple(data), interpret=interpret)
    except Exception:
        return None
