#!/usr/bin/env python
"""Measure the reference CPU anchor (BASELINE.md's prescription).

Runs the reference binary at -w 3 and -w 16 over the bench input for each
of the five BASELINE.json configs and writes bases/s to BASELINE_CPU.json
(bench.py folds the numbers into its report when the file exists).

Build provenance recorded in the output: by default the binary is the
SIMD shim build (tests/golden/build_reference.sh SIMD=1 — 16-lane GCC
vector extensions + -march=native for the Highway paths; isa-l inflate
still backed by zlib since libisal isn't installable here).  Outputs are
bit-identical to the scalar shim build; only speed differs.  Set
FASTPLONG_REF_BIN to anchor against a different build.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF_BIN = os.environ.get("FASTPLONG_REF_BIN",
                         "/tmp/fastplong_ref_simd/fastplong")

START = "AATGTACTTCGTTCAGTTACGTATTGCT"
END = "AGCAATACGTAACTGAACGAAGT"

CONFIGS = {
    "1_filters": ["--disable_adapter_trimming"],
    "2_cut_polyx": ["-5", "-3", "-x", "--disable_adapter_trimming"],
    "3_adapters": ["-s", START, "-e", END],
    # the EXACT bench headline config (bench.py build_opt): adapters both
    # ends + quality cut + polyX — vs_cpu_anchor must compare identical
    # work, and the extra stages make the reference measurably slower
    # than bare config 3
    "3h_headline_exact": ["-s", START, "-e", END, "-5", "-3", "-x"],
    "4_autodetect": [],
    "5_break_complexity_split": ["-b", "-y", "--split", "4"],
}


def main():
    workdir = os.environ.get("FASTPLONG_BENCH_DIR", "/tmp/fastplong_bench")
    os.makedirs(workdir, exist_ok=True)
    # the SAME input bench.py times the headline on (vs_cpu_anchor must
    # compare identical work — size and all)
    from bench import gen_input, count_bases, input_path, bench_input_size
    in_fq = input_path(workdir)
    if not os.path.exists(in_fq):
        n_reads, mean_len = bench_input_size()
        gen_input(in_fq, n_reads=n_reads, mean_len=mean_len)
    total = count_bases(in_fq)

    if not os.path.exists(REF_BIN):
        script = os.path.join(REPO, "tests", "golden", "build_reference.sh")
        env = dict(os.environ)
        if "ref_simd" in REF_BIN:
            env["SIMD"] = "1"
        subprocess.run(["bash", script], check=True, env=env, timeout=600)

    results = {"binary": ("SIMD shim build (16-lane GCC vector ext hwy, "
                          "-march=native; zlib-backed isa-l)"
                          if "ref_simd" in REF_BIN else
                          "shim build (scalar hwy/isa-l stand-ins)"),
               "input_bases": total, "configs": {}}
    for name, args in CONFIGS.items():
        results["configs"][name] = {}
        for w in (3, 16):
            out = os.path.join(workdir, "anchor_out.fq")
            cmd = [REF_BIN, "-i", in_fq, "-o", out,
                   "-j", os.path.join(workdir, "anchor.json"),
                   "-h", os.path.join(workdir, "anchor.html"),
                   "-w", str(w)] + args
            t0 = time.time()
            r = subprocess.run(cmd, capture_output=True, timeout=3600)
            dt = time.time() - t0
            if r.returncode != 0:
                results["configs"][name]["w%d" % w] = {
                    "error": r.stderr.decode()[-500:]}
                continue
            results["configs"][name]["w%d" % w] = {
                "seconds": round(dt, 2),
                "bases_per_second": round(total / dt, 1),
            }
            print("%s -w %d: %.1f Mbases/s (%.1fs)"
                  % (name, w, total / dt / 1e6, dt), flush=True)
    path = os.path.join(REPO, "BASELINE_CPU.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
