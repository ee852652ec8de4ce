"""Read filters: quality / N-base / length / low-complexity.

Vectorized equivalent of the reference Filter::passFilter and
Filter::passLowComplexityFilter (src/filter.cpp:12-81).  Works on spans
[lo, hi) of the padded base/qual arrays via prefix sums — no per-read
materialization needed.

All threshold comparisons are performed in exact integer arithmetic that is
provably equivalent to the reference's double comparisons for read lengths
up to ~21 Mbp (see inline notes).
"""

import jax.numpy as jnp

from ..common import (PASS_FILTER, FAIL_N_BASE, FAIL_LENGTH, FAIL_TOO_LONG,
                      FAIL_QUALITY, FAIL_COMPLEXITY)

N_CHAR = ord("N")


def _span_sum(excl_cumsum, lo, hi):
    """sum over [lo, hi) given exclusive cumsum [B, L+1]."""
    take = jnp.take_along_axis
    return (take(excl_cumsum, hi[:, None], axis=-1)
            - take(excl_cumsum, lo[:, None], axis=-1))[:, 0]


def _excl_cumsum(x):
    B = x.shape[0]
    c = jnp.cumsum(x.astype(jnp.int32), axis=-1)
    return jnp.concatenate([jnp.zeros((B, 1), jnp.int32), c], axis=-1)


def pass_filter(bases, quals, lo, hi, lens, *,
                qual_enabled, qualified_qual, unqualified_percent_limit,
                n_base_limit, n_base_percent_limit, avg_qual_req,
                length_enabled, required_length, max_length,
                complexity_enabled, complexity_threshold_pct):
    """Returns filter codes [B] int32 per span.

    complexity_threshold_pct is the integer CLI percentage (0..100); the
    reference converts it to double threshold = pct/100.0 (main.cpp:205).
    """
    B, L = bases.shape
    lo = lo.astype(jnp.int32)
    hi = jnp.maximum(hi.astype(jnp.int32), lo)
    rlen = hi - lo
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < lens[:, None]

    code = jnp.full((B,), PASS_FILTER, jnp.int32)

    low_qual = n_base = total_qual = None
    if qual_enabled or length_enabled:
        cq_low = _excl_cumsum((quals < qualified_qual) & valid)
        cq_n = _excl_cumsum((bases == N_CHAR) & valid)
        cq_tq = _excl_cumsum(
            jnp.where(valid, quals.astype(jnp.int32) - 33, 0))
        low_qual = _span_sum(cq_low, lo, hi)
        n_base = _span_sum(cq_n, lo, hi)
        total_qual = _span_sum(cq_tq, lo, hi)

    if complexity_enabled:
        # diff[j] = base[j] != base[j+1]; count over j in [lo, hi-1)
        nxt = jnp.concatenate([bases[:, 1:], jnp.zeros((B, 1), bases.dtype)],
                              axis=-1)
        cq_diff = _excl_cumsum(bases != nxt)
        diff = _span_sum(cq_diff, lo, jnp.maximum(hi - 1, lo))
        # pass iff diff/(len-1) >= pct/100 and len > 1 (filter.cpp:67-81);
        # exact integer form: 100*diff >= pct*(len-1)
        complexity_fail = (rlen <= 1) | (100 * diff < complexity_threshold_pct * (rlen - 1))
        code = jnp.where(complexity_fail, FAIL_COMPLEXITY, code)

    if length_enabled:
        if max_length > 0:
            code = jnp.where(rlen > max_length, FAIL_TOO_LONG, code)
        code = jnp.where(rlen < required_length, FAIL_LENGTH, code)

    if qual_enabled:
        rlen_safe = jnp.maximum(rlen, 1)
        if n_base_limit != 1000000:
            code = jnp.where(n_base > n_base_limit, FAIL_N_BASE, code)
        code = jnp.where(n_base * 100 > rlen * n_base_percent_limit,
                         FAIL_N_BASE, code)
        if avg_qual_req > 0:
            # reference uses C++ integer division totalQual/rlen (filter.cpp:44)
            code = jnp.where(total_qual // rlen_safe < avg_qual_req,
                             FAIL_QUALITY, code)
        # lowQualNum > upl*rlen/100.0  <=>  100*lowQualNum > upl*rlen
        code = jnp.where(100 * low_qual > unqualified_percent_limit * rlen,
                         FAIL_QUALITY, code)

    # zero-length reads fail with FAIL_LENGTH regardless (filter.cpp:13-15)
    code = jnp.where(rlen == 0, FAIL_LENGTH, code)
    return code
