#!/usr/bin/env python
"""Dissect the headline bench run: per-dispatch timing by bucket shape.

Monkey-patches SingleEndRunner._dispatch to record (L, rows, seconds)
per call, runs the exact headline config once, and prints a table —
distinguishes 'many cheap dispatches' from 'few slow ones' and 'first
call per shape slow' (executable load) from 'every call slow' (h2d
bytes).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_opt, gen_input, count_bases


def main():
    workdir = os.environ.get("FASTPLONG_BENCH_DIR", "/tmp/fastplong_bench")
    os.makedirs(workdir, exist_ok=True)
    in_fq = os.path.join(workdir, "bench_in.fq")
    if not os.path.exists(in_fq):
        gen_input(in_fq)
    total_bases = count_bases(in_fq)

    from fastplong_tpu.pipeline.runner import SingleEndRunner
    calls = []
    orig = SingleEndRunner._device_dispatch

    def timed(self, batch):
        t0 = time.perf_counter()
        rows = batch.packed.shape[0] if batch.packed is not None else -1
        r = orig(self, batch)
        calls.append((batch.L, rows, time.perf_counter() - t0))
        return r

    SingleEndRunner._device_dispatch = timed

    opt = build_opt(in_fq, workdir, "prof")
    t0 = time.time()
    runner = SingleEndRunner(opt)
    t_init = time.time() - t0
    runner.run()
    dt = time.time() - t0
    print("wall %.2fs  init %.2fs  rate %.2f Mb/s" % (
        dt, t_init, total_bases / dt / 1e6))
    print("stage:", json.dumps(runner.timer.report()))
    # group calls by L
    from collections import defaultdict
    byL = defaultdict(list)
    for L, rows, s in calls:
        byL[L].append(s)
    print("%8s %6s %9s %9s %9s %9s" % ("L", "calls", "first_s", "max_s",
                                        "rest_avg", "total_s"))
    for L in sorted(byL):
        ss = byL[L]
        rest = ss[1:] or [0.0]
        print("%8d %6d %9.3f %9.3f %9.3f %9.3f" % (
            L, len(ss), ss[0], max(ss), sum(rest) / len(rest), sum(ss)))
    print("total dispatch calls: %d  total: %.2fs" % (
        len(calls), sum(s for _, _, s in calls)))


if __name__ == "__main__":
    main()
