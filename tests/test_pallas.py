"""Pallas mismatch-scan kernel vs the jnp fallback (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from fastplong_tpu.ops.pallas_kernels import mismatch_scan
from fastplong_tpu.ops.adapter import _mismatch_full


def test_mismatch_scan_matches_fallback():
    rng = np.random.default_rng(4)
    for B, L, alen in ((4, 300, 28), (9, 1200, 64), (3, 100, 5)):
        bases = jnp.asarray(rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                                       size=(B, L)))
        data = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                size=alen).tolist())
        ref = np.asarray(_mismatch_full(bases, data))
        got = mismatch_scan(bases, data, interpret=True)
        assert got is not None
        np.testing.assert_array_equal(ref, np.asarray(got)[:B, :L])
