"""Drain-layout invariants: _flat_partial / unflatten_side round-trip,
padding to the global stat length, and max-seen trimming."""

import numpy as np
import jax.numpy as jnp

from fastplong_tpu.ops.stats_kernels import stat_batch
from fastplong_tpu.pipeline.device import (
    _flat_partial, unflatten_side, flat_side_len, _FLAT_EXTRA, _FLAT_PER_L)


def _random_partial(rng, B=6, L=32):
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L))
    quals = rng.integers(35, 74, size=(B, L)).astype(np.uint8)
    lens = rng.integers(0, L + 1, size=B).astype(np.int32)
    mask = rng.random(B) < 0.9
    part = stat_batch(jnp.asarray(bases), jnp.asarray(quals),
                      jnp.zeros(B, jnp.int32), jnp.asarray(lens),
                      jnp.asarray(mask), zero_lo=True)
    return {k: np.asarray(v) for k, v in part.items()}


def test_flat_roundtrip_with_padding():
    rng = np.random.default_rng(3)
    part = _random_partial(rng, L=32)
    SL = 48
    flat = np.asarray(_flat_partial(
        {k: jnp.asarray(v) for k, v in part.items()}, SL))
    assert flat.shape == (flat_side_len(SL),)
    got = unflatten_side(flat, SL)
    np.testing.assert_array_equal(got["cycle_content"][:, :32],
                                  part["cycle_content"])
    assert got["cycle_content"][:, 32:].sum() == 0
    np.testing.assert_array_equal(got["cycle_qual"][:, :32],
                                  part["cycle_qual"])
    np.testing.assert_array_equal(got["cycle_total_base"][:32],
                                  part["cycle_total_base"])
    np.testing.assert_array_equal(got["cycle_total_qual"][:32],
                                  part["cycle_total_qual"])
    np.testing.assert_array_equal(got["q20_totals"],
                                  part["cycle_q20"].sum(axis=1))
    np.testing.assert_array_equal(got["q30_totals"],
                                  part["cycle_q30"].sum(axis=1))
    np.testing.assert_array_equal(got["base_qual_hist"],
                                  part["base_qual_hist"])
    np.testing.assert_array_equal(got["kmer"], part["kmer"])


def test_trimmed_drain_preserves_everything():
    """Trimming the cycle block at the longest read seen loses nothing."""
    from fastplong_tpu.pipeline.fast_runner import DeviceStats
    rng = np.random.default_rng(4)
    part = _random_partial(rng, L=20)
    SL = 64
    flat = np.asarray(_flat_partial(
        {k: jnp.asarray(v) for k, v in part.items()}, SL))
    ds = DeviceStats()
    ds.state = jnp.stack([jnp.asarray(flat), jnp.asarray(flat) * 2])
    ds.max_seen = 20
    st = np.asarray(ds.trimmed_state())
    # the cut is power-of-2 quantized for drain shape stability (20 -> 32)
    assert st.shape[-1] == _FLAT_PER_L * 32 + _FLAT_EXTRA
    got = unflatten_side(st[0], 32)
    full = unflatten_side(flat, SL)
    for k in got:
        np.testing.assert_array_equal(
            got[k], full[k][..., :got[k].shape[-1]]
            if full[k].ndim else full[k])
    # row 1 carried the doubled side
    got2 = unflatten_side(st[1], 32)
    np.testing.assert_array_equal(got2["kmer"], 2 * full["kmer"])


def test_stats_q20_totals_fold():
    """Reduced q20/q30 totals fold into cycle 0 without changing sums."""
    from fastplong_tpu.stats import Stats
    s = Stats()
    s.add_device_partial({
        "cycle_total_base": np.arange(5, dtype=np.int64),
        "cycle_total_qual": np.arange(5, dtype=np.int64),
        "cycle_content": np.ones((8, 5), np.int64),
        "cycle_qual": np.ones((8, 5), np.int64),
        "q20_totals": np.full(8, 7, np.int64),
        "q30_totals": np.full(8, 3, np.int64),
        "base_qual_hist": np.zeros(128, np.int64),
        "kmer": np.zeros(1024, np.int64),
    })
    assert s.cycle_q20.sum() == 56
    assert s.cycle_q30.sum() == 24
