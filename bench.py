#!/usr/bin/env python
"""Benchmark: end-to-end trim+filter throughput (bases/s) on one chip.

Generates a Nanopore-like FASTQ (if not cached), runs the full pipeline
(adapter trimming at both ends + quality cut + polyX + filters + stats +
output writing), and reports bases/s against the BASELINE.json target of
3 GB/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

BASELINE_BASES_PER_S = 3e9  # driver-set target (BASELINE.json)

START = "AATGTACTTCGTTCAGTTACGTATTGCT"
END = "AGCAATACGTAACTGAACGAAGT"


def gen_input(path, n_reads=8000, mean_len=8000, seed=7):
    import numpy as np
    rng = np.random.default_rng(seed)
    qtab = (rng.integers(33 + 5, 33 + 40, size=1 << 16)).astype(np.uint8)
    with open(path, "wb") as f:
        chunks = []
        for i in range(n_reads):
            n = max(100, int(rng.gamma(3.0, mean_len / 3.0)))
            seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
            if rng.random() < 0.8:
                seq = np.concatenate(
                    [np.frombuffer(START.encode(), np.uint8), seq])
            if rng.random() < 0.8:
                seq = np.concatenate(
                    [seq, np.frombuffer(END.encode(), np.uint8)])
            qual = qtab[rng.integers(0, 1 << 16, size=len(seq))]
            chunks.append(b"@read%d\n" % i)
            chunks.append(seq.tobytes())
            chunks.append(b"\n+\n")
            chunks.append(qual.tobytes())
            chunks.append(b"\n")
            if len(chunks) > 4000:
                f.write(b"".join(chunks))
                chunks = []
        f.write(b"".join(chunks))
    return path


def main():
    workdir = os.environ.get("FASTPLONG_BENCH_DIR", "/tmp/fastplong_bench")
    os.makedirs(workdir, exist_ok=True)
    in_fq = os.path.join(workdir, "bench_in.fq")
    if not os.path.exists(in_fq):
        gen_input(in_fq)
    total_bases = 0
    # count bases once
    import numpy as np
    with open(in_fq, "rb") as f:
        data = f.read()
    lines = data.split(b"\n")
    total_bases = sum(len(lines[i]) for i in range(1, len(lines), 4))

    from fastplong_tpu.main import build_parser, options_from_args
    from fastplong_tpu.pipeline.runner import SingleEndRunner

    out_fq = os.path.join(workdir, "bench_out.fq")
    argv = ["fastplong", "-i", in_fq, "-o", out_fq,
            "-j", os.path.join(workdir, "bench.json"),
            "-h", os.path.join(workdir, "bench.html"),
            "-s", START, "-e", END, "-5", "-3", "-x"]
    args = build_parser().parse_args(argv[1:])
    opt = options_from_args(args, argv)
    opt.validate()

    # measure the resident device-step rate first, on a quiet device
    device_rate = _device_step_rate(opt)

    # warm-up run compiles all batch shapes on a truncated pass
    warm_opt = options_from_args(args, argv)
    warm_opt.validate()
    warm_opt.reads_to_process = 2000
    runner = SingleEndRunner(warm_opt)
    runner.run()

    t0 = time.time()
    runner = SingleEndRunner(opt)
    runner.run()
    dt = time.time() - t0

    value = total_bases / dt

    # device_rate (measured above): pure device-step throughput on one
    # resident batch; the end-to-end number includes host<->device
    # interconnect, which in tunneled dev environments is far below PCIe
    print(json.dumps({
        "metric": "bases_per_second_per_chip",
        "value": round(value, 1),
        "unit": "bases/s",
        "vs_baseline": round(value / BASELINE_BASES_PER_S, 4),
        "device_step_bases_per_second": round(device_rate, 1),
        "device_step_vs_baseline": round(device_rate / BASELINE_BASES_PER_S, 4),
    }))


def _device_step_rate(opt):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastplong_tpu.pipeline.device import build_step
    from fastplong_tpu.pipeline.batches import batch_rows
    import time as _t
    step, _ = build_step(opt)
    L = 8192
    B = batch_rows(L)
    rng = np.random.default_rng(0)
    bases = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                   size=(B, L)))
    quals = jnp.asarray(rng.integers(38, 73, size=(B, L)).astype(np.uint8))
    lens = jnp.full(B, L, jnp.int32)
    mask = jnp.ones(B, bool)
    out = step(bases, quals, lens, mask)
    jax.block_until_ready(out)
    n = 10
    t0 = _t.time()
    for _ in range(n):
        out = step(bases, quals, lens, mask)
    jax.block_until_ready(out)
    return B * L * n / (_t.time() - t0)


if __name__ == "__main__":
    main()
