"""The per-batch device computation.

Builds a single jit-compiled function that runs the full per-read kernel
chain over a padded [B, L] batch — the TPU-native replacement for the
reference's per-read worker loop (src/seprocessor.cpp:180-329):

  pre-stats -> trimAndCut -> polyX -> [adapters, M3] -> filters -> post-stats

Returns per-read span/verdict vectors (applied host-side to the original
bytes) plus per-batch statistic partials.
"""

import functools

import jax
import jax.numpy as jnp

from ..common import PASS_FILTER
from ..ops.qualcut import trim_and_cut
from ..ops.polyx import trim_polyx
from ..ops.filters import pass_filter
from ..ops.stats_kernels import stat_batch


def kernel_params(opt):
    """Extract the static (hashable) kernel parameters from Options."""
    qc = opt.quality_cut
    qf = opt.qualfilter
    lf = opt.length_filter
    cf = opt.complexity_filter
    return dict(
        trim_front=opt.trim.front,
        trim_tail=opt.trim.tail,
        cut=dict(
            enabled_front=qc.enabled_front, enabled_tail=qc.enabled_tail,
            window_front=qc.window_size_front, quality_front=qc.quality_front,
            window_tail=qc.window_size_tail, quality_tail=qc.quality_tail),
        polyx_enabled=opt.polyx_trim.enabled,
        polyx_min_len=opt.polyx_trim.min_len,
        filt=dict(
            qual_enabled=qf.enabled,
            qualified_qual=qf.qualified_qual,
            unqualified_percent_limit=qf.unqualified_percent_limit,
            n_base_limit=qf.n_base_limit,
            n_base_percent_limit=qf.n_base_percent_limit,
            avg_qual_req=qf.avg_qual_req,
            length_enabled=lf.enabled,
            required_length=lf.required_length,
            max_length=lf.max_length,
            complexity_enabled=cf.enabled,
            complexity_threshold_pct=int(round(cf.threshold * 100))),
    )


def build_step(opt):
    """Returns a jitted fn(bases, quals, lens, read_mask) -> outputs dict."""
    p = kernel_params(opt)

    def step(bases, quals, lens, read_mask):
        lens = jnp.where(read_mask, lens, 0)
        pre = stat_batch(bases, quals, jnp.zeros_like(lens), lens, read_mask)

        lo, hi, null = trim_and_cut(
            bases, quals, lens, p["trim_front"], p["trim_tail"], **p["cut"])
        null = null | ~read_mask

        poly = jnp.full(lens.shape, -1, jnp.int32)
        poly_trim = jnp.zeros_like(lens)
        if p["polyx_enabled"]:
            new_hi, poly_b, ptrim = trim_polyx(bases, lo, hi,
                                               p["polyx_min_len"])
            hi = jnp.where(null, hi, new_hi)
            poly = jnp.where(null, -1, poly_b)
            poly_trim = jnp.where(null, 0, ptrim)

        code = pass_filter(bases, quals, lo, hi, lens, **p["filt"])
        passed = (code == PASS_FILTER) & ~null

        post = stat_batch(bases, quals, lo, hi, passed)

        return {
            "lo": lo, "hi": hi, "null": null, "code": code,
            "passed": passed,
            "poly": poly, "poly_trim": poly_trim,
            "pre": pre, "post": post,
        }

    return jax.jit(step)
