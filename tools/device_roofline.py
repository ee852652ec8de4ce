#!/usr/bin/env python
"""Device-step cost breakdown + roofline on the attached chip.

Times the full fused step and its major sub-kernels on a canonical
[B, 8192] batch, and compares against the HBM-bandwidth bound for the
bytes each stage must touch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    from bench import build_opt, START, END
    from fastplong_tpu.pipeline.batches import batch_rows
    from fastplong_tpu.pipeline.device import build_step
    from fastplong_tpu.ops.adapter import (AdapterSpec, _mismatch_full,
                                           _seed_scan, _verify_at,
                                           trim_by_sequence_start,
                                           trim_by_sequence_end,
                                           find_middle_adapters)
    from fastplong_tpu.ops.qualcut import trim_and_cut
    from fastplong_tpu.ops.stats_kernels import stat_batch
    from fastplong_tpu.ops.polyx import trim_polyx
    from fastplong_tpu.ops.filters import pass_filter

    workdir = "/tmp/fastplong_bench"
    os.makedirs(workdir, exist_ok=True)
    opt = build_opt("/dev/null", workdir, "roofline")

    L = 8192
    B = batch_rows(L)
    rng = np.random.default_rng(0)
    bases = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                   size=(B, L)))
    quals = jnp.asarray(rng.integers(38, 73, size=(B, L)).astype(np.uint8))
    lens = jnp.full(B, L, jnp.int32)
    mask = jnp.ones(B, bool)
    lo = jnp.zeros(B, jnp.int32)
    hi = lens

    total_bases = B * L
    print("B=%d L=%d  total=%.1f Mbases" % (B, L, total_bases / 1e6))

    step, _ = build_step(opt)
    dt = timeit(lambda: step(bases, quals, lens, mask))
    print("full step:        %7.3f ms  %8.2f Gb/s" % (
        dt * 1e3, total_bases / dt / 1e9))

    spec_s = AdapterSpec(START, 0.25)
    spec_e = AdapterSpec(END, 0.25)

    mm_s = jax.jit(lambda b: _mismatch_full(b, spec_s.data))
    dt = timeit(lambda: mm_s(bases))
    print("mismatch(start):  %7.3f ms  %8.2f Gb/s" % (
        dt * 1e3, total_bases / dt / 1e9))

    os.environ["FASTPLONG_PALLAS"] = "0"
    mm_jnp = jax.jit(lambda b: _mismatch_full(b, spec_s.data))
    dt = timeit(lambda: mm_jnp(bases))
    print("mismatch jnp:     %7.3f ms  %8.2f Gb/s" % (
        dt * 1e3, total_bases / dt / 1e9))
    os.environ.pop("FASTPLONG_PALLAS")

    seed = jax.jit(lambda b, l: _seed_scan(
        b, jnp.zeros(B, jnp.int32), jnp.full(B, 184, jnp.int32), spec_s,
        True))
    dt = timeit(lambda: seed(bases, lens))
    print("seed scan:        %7.3f ms" % (dt * 1e3))

    ver = jax.jit(lambda b: _verify_at(
        b, jnp.zeros(B, jnp.int32), spec_s))
    dt = timeit(lambda: ver(bases))
    print("verify full:      %7.3f ms" % (dt * 1e3))

    ts = jax.jit(lambda b, lo_, hi_: trim_by_sequence_start(
        b, lo_, hi_, spec_s, 10))
    dt = timeit(lambda: ts(bases, lo, hi))
    print("trim start stage: %7.3f ms" % (dt * 1e3))

    te = jax.jit(lambda b, lo_, hi_: trim_by_sequence_end(
        b, lo_, hi_, spec_e, 10))
    dt = timeit(lambda: te(bases, lo, hi))
    print("trim end stage:   %7.3f ms" % (dt * 1e3))

    mid = jax.jit(lambda b, lo_, hi_: find_middle_adapters(
        b, lo_, hi_, spec_s, spec_e, 10))
    dt = timeit(lambda: mid(bases, lo, hi))
    print("middle adapters:  %7.3f ms" % (dt * 1e3))

    qc = jax.jit(lambda b, q, l: trim_and_cut(
        b, q, l, 0, 0, enabled_front=True, enabled_tail=True,
        window_front=4, quality_front=20, window_tail=4, quality_tail=20))
    dt = timeit(lambda: qc(bases, quals, lens))
    print("qual cut:         %7.3f ms" % (dt * 1e3))

    px = jax.jit(lambda b, lo_, hi_: trim_polyx(b, lo_, hi_, 10))
    dt = timeit(lambda: px(bases, lo, hi))
    print("polyx:            %7.3f ms" % (dt * 1e3))

    sb = jax.jit(lambda b, q, lo_, hi_, m: stat_batch(b, q, lo_, hi_, m))
    dt = timeit(lambda: sb(bases, quals, lo, hi, mask))
    print("stat_batch:       %7.3f ms" % (dt * 1e3))

    pf = jax.jit(lambda b, q, lo_, hi_, l: pass_filter(
        b, q, lo_, hi_, l, qual_enabled=True, qualified_qual=48,
        unqualified_percent_limit=40, n_base_limit=5,
        n_base_percent_limit=-1, avg_qual_req=0, length_enabled=True,
        required_length=15, max_length=0, complexity_enabled=False,
        complexity_threshold_pct=30))
    dt = timeit(lambda: pf(bases, quals, lo, hi, lens))
    print("pass_filter:      %7.3f ms" % (dt * 1e3))

    # HBM roofline: bytes the step MUST touch at least once
    # in: bases+quals 2B/base; the mismatch scans write [B,L] int32 per
    # distinct adapter (2 here) and read them back in search_full
    hbm_bw = 8.1e11  # ~810 GB/s v5e HBM
    min_bytes = total_bases * 2
    print("roofline floor (in bytes only): %.3f ms"
          % (min_bytes / hbm_bw * 1e3))
    mm_bytes = total_bases * 2 + 2 * 2 * total_bases * 4
    print("roofline w/ 2 mm arrays rw:     %.3f ms"
          % (mm_bytes / hbm_bw * 1e3))


if __name__ == "__main__":
    main()
