"""Host-statistics backend: native batch statRead must match the device
reduction exactly, and --stats_backend host must be byte-parity with the
reference end to end."""

import numpy as np
import jax.numpy as jnp
import pytest

from golden_util import assert_parity
from test_golden_monster import _write_mixed, FULL


def _packed(rng, B, L, maxlen=None):
    from fastplong_tpu.pipeline.device import pack_input
    maxlen = maxlen or L
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L))
    quals = rng.integers(34, 76, size=(B, L)).astype(np.uint8)
    lens = rng.integers(0, maxlen + 1, size=B).astype(np.int32)
    mask = rng.random(B) < 0.9
    return pack_input(bases, quals, lens, mask), bases, quals, lens, mask


@pytest.mark.parametrize("use_native", [True, False])
def test_batch_accumulator_matches_stat_batch(use_native, monkeypatch):
    from fastplong_tpu.pipeline import host_stats
    from fastplong_tpu.ops.stats_kernels import stat_batch
    if not use_native:
        import fastplong_tpu.native as native
        monkeypatch.setattr(native, "get_lib", lambda: None)
    rng = np.random.default_rng(11)
    B, L, SL = 7, 24, 40
    packed, bases, quals, lens, mask = _packed(rng, B, L)
    acc = host_stats.BatchStatAccumulator(SL)

    # pre pass: full reads
    med = acc.add_rows(packed, L, None, lens.astype(np.int64), None, None,
                       mask)
    ref = {k: np.asarray(v) for k, v in stat_batch(
        jnp.asarray(bases), jnp.asarray(quals), jnp.zeros(B, jnp.int32),
        jnp.asarray(lens), jnp.asarray(mask), zero_lo=True).items()}
    np.testing.assert_array_equal(
        np.where(mask, med, 0), np.where(mask, ref["median"], 0))

    # post pass: random spans + N-mask regions
    lo = np.array([int(rng.integers(0, max(1, l))) if l else 0
                   for l in lens], np.int64)
    hi = np.array([int(rng.integers(s, l + 1)) for s, l in zip(lo, lens)],
                  np.int64)
    mlo = lo + 1
    mhi = np.minimum(hi, mlo + 3)
    pass_c = mask & (rng.random(B) < 0.8)
    med2 = acc.add_rows(packed, L, lo, hi, mlo, mhi, pass_c)
    masked = bases.copy()
    idx = np.arange(L)[None, :]
    sel = (idx >= mlo[:, None]) & (idx < mhi[:, None])
    masked[sel] = ord("N")
    ref2 = {k: np.asarray(v) for k, v in stat_batch(
        jnp.asarray(masked), jnp.asarray(quals),
        jnp.asarray(lo.astype(np.int32)), jnp.asarray(hi.astype(np.int32)),
        jnp.asarray(pass_c)).items()}
    np.testing.assert_array_equal(
        np.where(pass_c, med2, 0), np.where(pass_c, ref2["median"], 0))

    part = acc.partial()
    # the partial is trimmed to the longest span seen; reference columns
    # beyond it must be zero
    for k in ("cycle_content", "cycle_qual"):
        want = ref[k] + ref2[k]
        got = part[k]
        w = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :w], want[:, :w], err_msg=k)
        assert got[:, w:].sum() == 0 and want[:, w:].sum() == 0, k
    for k in ("cycle_total_base", "cycle_total_qual"):
        want = ref[k] + ref2[k]
        w = min(len(part[k]), len(want))
        np.testing.assert_array_equal(part[k][:w], want[:w], err_msg=k)
        assert part[k][w:].sum() == 0 and want[w:].sum() == 0, k
    np.testing.assert_array_equal(
        part["q20_totals"],
        ref["cycle_q20"].sum(axis=1) + ref2["cycle_q20"].sum(axis=1))
    np.testing.assert_array_equal(
        part["q30_totals"],
        ref["cycle_q30"].sum(axis=1) + ref2["cycle_q30"].sum(axis=1))
    np.testing.assert_array_equal(part["base_qual_hist"],
                                  ref["base_qual_hist"]
                                  + ref2["base_qual_hist"])
    np.testing.assert_array_equal(part["kmer"], ref["kmer"] + ref2["kmer"])


def test_golden_host_stats_backend(tmp_path, monkeypatch):
    """Full-feature run with --stats_backend host: byte parity incl. JSON
    curves/kmers/medians, mixed with monster reads (low cap)."""
    monkeypatch.setenv("FASTPLONG_STATS", "host")
    monkeypatch.setenv("FASTPLONG_STAT_DEVICE_CAP", "2048")
    rng = np.random.default_rng(77)
    lens = [int(rng.integers(30, 5000)) for _ in range(100)]
    fq = _write_mixed(str(tmp_path / "in.fq"), rng, lens)
    assert_parity(fq, str(tmp_path), FULL)
