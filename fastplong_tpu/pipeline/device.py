"""The per-batch device computation.

Builds a single jit-compiled function that runs the full per-read kernel
chain over a padded [B, L] batch — the TPU-native replacement for the
reference's per-read worker loop (src/seprocessor.cpp:180-329):

  pre-stats -> trimAndCut -> polyX -> adapter trims (start/end/FASTA) ->
  middle-adapter split -> filters -> post-stats

Adapter sequences are static (fixed at startup, exactly like the reference),
so their bitmask tables and thresholds are baked into the compiled graph.
Returns per-read span/verdict vectors (applied host-side to the original
bytes) plus per-batch statistic partials.

Out-reads: middle-adapter splitting can produce up to 2 children per read
(breakByGap, read.cpp:192-215); the step emits OUT_CAP=2 span slots with
name-tag codes (0 plain, 1 split-left, 2 split-right).
"""

import jax
import jax.numpy as jnp

from ..common import PASS_FILTER
from ..ops.qualcut import trim_and_cut
from ..ops.polyx import trim_polyx
from ..ops.filters import pass_filter
from ..ops.stats_kernels import stat_batch
from ..ops.adapter import (AdapterSpec, trim_by_sequence_start,
                           trim_by_sequence_end, find_middle_adapters)

OUT_CAP = 2
TAG_NONE = 0
TAG_SPLIT_LEFT = 1
TAG_SPLIT_RIGHT = 2


def kernel_params(opt):
    """Extract the static (hashable) kernel parameters from Options."""
    qc = opt.quality_cut
    qf = opt.qualfilter
    lf = opt.length_filter
    cf = opt.complexity_filter
    ad = opt.adapter
    return dict(
        trim_front=opt.trim.front,
        trim_tail=opt.trim.tail,
        cut=dict(
            enabled_front=qc.enabled_front, enabled_tail=qc.enabled_tail,
            window_front=qc.window_size_front, quality_front=qc.quality_front,
            window_tail=qc.window_size_tail, quality_tail=qc.quality_tail),
        polyx_enabled=opt.polyx_trim.enabled,
        polyx_min_len=opt.polyx_trim.min_len,
        adapter_enabled=ad.enabled,
        start_seq=ad.sequence_start,
        end_seq=ad.sequence_end,
        fasta_seqs=tuple(ad.seqs_in_fasta),
        ed_max=ad.ed_max,
        ext=ad.trimming_extension,
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


def adapter_stages(p):
    """Static list of (adapter_seq, side) trim stages, reference order
    (seprocessor.cpp:205-213)."""
    stages = []
    if p["adapter_enabled"]:
        if p["start_seq"]:
            stages.append((p["start_seq"], "start"))
        if p["end_seq"]:
            stages.append((p["end_seq"], "end"))
        for seq in p["fasta_seqs"]:
            stages.append((seq, "start"))
            stages.append((seq, "end"))
    return stages


def build_step(opt):
    """Returns a jitted fn(bases, quals, lens, read_mask) -> outputs dict."""
    p = kernel_params(opt)
    stages = adapter_stages(p)
    specs = [AdapterSpec(seq, p["ed_max"]) for seq, _ in stages]
    middle_specs = None
    if p["adapter_enabled"]:
        middle_specs = (AdapterSpec(p["start_seq"], p["ed_max"]),
                        AdapterSpec(p["end_seq"], p["ed_max"]))

    def step(bases, quals, lens, read_mask):
        B = lens.shape[0]
        lens = jnp.where(read_mask, lens, 0)
        pre = stat_batch(bases, quals, jnp.zeros_like(lens), lens, read_mask)

        lo, hi, null = trim_and_cut(
            bases, quals, lens, p["trim_front"], p["trim_tail"], **p["cut"])
        null = null | ~read_mask
        lo = jnp.where(null, 0, lo)
        hi = jnp.where(null, 0, hi)

        poly = jnp.full((B,), -1, jnp.int32)
        poly_trim = jnp.zeros((B,), jnp.int32)
        if p["polyx_enabled"]:
            new_hi, poly_b, ptrim = trim_polyx(bases, lo, hi,
                                               p["polyx_min_len"])
            hi = jnp.where(null, hi, new_hi)
            poly = jnp.where(null, -1, poly_b)
            poly_trim = jnp.where(null, 0, ptrim)

        # ---- adapter trimming (each stage mutates the span sequentially)
        trimmed_total = jnp.zeros((B,), jnp.int32)
        recs = []
        for spec, (seq, side) in zip(specs, stages):
            if side == "start":
                new_lo, t, rec = trim_by_sequence_start(
                    bases, lo, hi, spec, p["ext"])
                lo = jnp.where(null, lo, new_lo)
            else:
                new_hi, t, rec = trim_by_sequence_end(
                    bases, lo, hi, spec, p["ext"])
                hi = jnp.where(null, hi, new_hi)
            t = jnp.where(null, 0, t)
            rec = jnp.where(null, 0, rec)
            trimmed_total = trimmed_total + t
            recs.append(rec)

        # ---- middle adapter split (breakByGap)
        out_lo = jnp.zeros((B, OUT_CAP), jnp.int32)
        out_hi = jnp.zeros((B, OUT_CAP), jnp.int32)
        out_tag = jnp.zeros((B, OUT_CAP), jnp.int32)
        active = jnp.zeros((B, OUT_CAP), bool)
        if middle_specs is not None:
            found, mstart, mlen = find_middle_adapters(
                bases, lo, hi, middle_specs[0], middle_specs[1], p["ext"])
            found = found & ~null
            len1 = mstart                      # left child length
            len2 = (hi - lo) - mstart - mlen   # right child length
            has_left = found & (len1 > 0)
            has_right = found & (len2 > 0)
            # slot 0: parent (not found) or left (found & left) or right
            s0_active = ~null & (~found | has_left | has_right)
            s0_is_parent = ~found
            s0_is_left = found & has_left
            s0_lo = jnp.where(s0_is_parent, lo,
                              jnp.where(s0_is_left, lo, lo + mstart + mlen))
            s0_hi = jnp.where(s0_is_parent, hi,
                              jnp.where(s0_is_left, lo + len1, hi))
            s0_tag = jnp.where(s0_is_parent, TAG_NONE,
                               jnp.where(s0_is_left, TAG_SPLIT_LEFT,
                                         TAG_SPLIT_RIGHT))
            # slot 1: right child when both exist
            s1_active = has_left & has_right
            s1_lo = lo + mstart + mlen
            s1_hi = hi
            out_lo = out_lo.at[:, 0].set(s0_lo).at[:, 1].set(s1_lo)
            out_hi = out_hi.at[:, 0].set(s0_hi).at[:, 1].set(s1_hi)
            out_tag = out_tag.at[:, 0].set(s0_tag).at[:, 1].set(TAG_SPLIT_RIGHT)
            active = active.at[:, 0].set(s0_active).at[:, 1].set(s1_active)
        else:
            out_lo = out_lo.at[:, 0].set(lo)
            out_hi = out_hi.at[:, 0].set(hi)
            active = active.at[:, 0].set(~null)

        # ---- filters + post-stats per out-read slot
        codes = []
        passed = []
        posts = []
        for c in range(OUT_CAP):
            code_c = pass_filter(bases, quals, out_lo[:, c], out_hi[:, c],
                                 lens, **p["filt"])
            pass_c = (code_c == PASS_FILTER) & active[:, c]
            codes.append(code_c)
            passed.append(pass_c)
            posts.append(stat_batch(bases, quals, out_lo[:, c], out_hi[:, c],
                                    pass_c))
        code = jnp.stack(codes, axis=1)
        passed = jnp.stack(passed, axis=1)

        n_out = jnp.sum(active.astype(jnp.int32), axis=1)
        return {
            "lo": lo, "hi": hi, "null": null,
            "out_lo": out_lo, "out_hi": out_hi, "out_tag": out_tag,
            "active": active, "n_out": n_out,
            "code": code, "passed": passed,
            "poly": poly, "poly_trim": poly_trim,
            "adapter_trimmed": trimmed_total,
            "adapter_recs": jnp.stack(recs, axis=1) if recs
                            else jnp.zeros((B, 0), jnp.int32),
            "pre": pre, "posts": posts,
        }

    return jax.jit(step), stages
