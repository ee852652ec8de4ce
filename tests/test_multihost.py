"""Single-file multi-host sharding: range alignment, shard-output
equivalence, offline report merge, and the jax.distributed DCN merge."""

import json
import os
import subprocess
import sys
import socket

import numpy as np
import pytest

from golden_util import write_random_fastq, strip_command

START = "AATGTACTTCGTTCAGTTACGTATTGCT"
ARGS = ["-s", START, "-x", "--cut_front", "--cut_tail"]


def test_align_to_record_ambiguous_quality(tmp_path):
    """Quality lines made of '@' (Q31) must not be mistaken for record
    starts when aligning a byte offset."""
    from fastplong_tpu.multihost import align_to_record
    p = str(tmp_path / "a.fq")
    recs = []
    for i in range(50):
        seq = "ACGTACGTACGTACGTACGT"
        recs.append("@r%d\n%s\n+\n%s\n" % (i, seq, "@" * len(seq)))
    data = "".join(recs).encode()
    with open(p, "wb") as f:
        f.write(data)
    # every aligned offset must be a true record start ('@rN')
    starts = {0}
    off = 0
    for r in recs:
        starts.add(off)
        off += len(r)
    for pos in range(0, len(data), 7):
        a = align_to_record(p, pos)
        assert a in starts or a == len(data), (pos, a)
        assert a >= pos


def _run_main(argv):
    from fastplong_tpu.main import main
    main(["fastplong"] + argv)


def test_two_host_shards_equal_single_run(tmp_path):
    d = str(tmp_path)
    fq = write_random_fastq(os.path.join(d, "in.fq"), n_reads=300,
                            min_len=30, max_len=700, seed=42,
                            adapter_start=START, adapter_prob=0.4,
                            polya_prob=0.3)
    # single-process reference run (of ourselves)
    _run_main(["-i", fq, "-o", os.path.join(d, "s.fq"),
               "--failed_out", os.path.join(d, "s_failed.fq"),
               "-j", os.path.join(d, "s.json"),
               "-h", os.path.join(d, "s.html")] + ARGS)
    # two sharded runs (sequential, same process)
    for i in (0, 1):
        _run_main(["-i", fq, "-o", os.path.join(d, "m.fq"),
                   "--failed_out", os.path.join(d, "m_failed.fq"),
                   "-j", os.path.join(d, "m.json"),
                   "-h", os.path.join(d, "m.html"),
                   "--num_hosts", "2", "--host_index", str(i)] + ARGS)
    cat = b"".join(open(os.path.join(d, "%04d.m.fq" % (i + 1)), "rb").read()
                   for i in (0, 1))
    single = open(os.path.join(d, "s.fq"), "rb").read()
    assert cat == single
    cat_f = b"".join(
        open(os.path.join(d, "%04d.m_failed.fq" % (i + 1)), "rb").read()
        for i in (0, 1))
    assert cat_f == open(os.path.join(d, "s_failed.fq"), "rb").read()

    # offline merged report == single-run report (modulo command line)
    from fastplong_tpu.merge_reports import main as merge_main
    merge_main(["merge", os.path.join(d, "m.json.part0"),
                os.path.join(d, "m.json.part1")])
    merged = strip_command(open(os.path.join(d, "m.json")).read())
    single_js = strip_command(open(os.path.join(d, "s.json")).read())
    assert merged == single_js


def test_align_fuzz_adversarial_quality(tmp_path):
    """Random FASTQ with quality lines crafted to start with '@'/'+' and
    to collide in length: every aligned offset must be a true record
    start (or EOF)."""
    rng = np.random.default_rng(123)
    from fastplong_tpu.multihost import align_to_record
    p = str(tmp_path / "f.fq")
    recs = []
    for i in range(300):
        n = int(rng.integers(5, 80))
        seq = "".join(rng.choice(list("ACGTN"), size=n))
        first = rng.choice(["@", "+", "A"])  # adversarial quality starts
        qual = first + "".join(
            chr(int(q)) for q in rng.integers(33, 74, size=n - 1))
        strand = "+" if rng.random() < 0.7 else "+comment here"
        recs.append("@r%d x\n%s\n%s\n%s\n" % (i, seq, strand, qual))
    data = "".join(recs).encode()
    with open(p, "wb") as f:
        f.write(data)
    starts = set()
    off = 0
    for r in recs:
        starts.add(off)
        off += len(r)
    size = len(data)
    all_cuts = sorted(starts | {size})
    for pos in rng.integers(0, size + 1, size=250):
        a = align_to_record(p, int(pos))
        expected = next(s for s in all_cuts if s >= pos)
        assert a == expected, (int(pos), a, expected)


def test_multihost_rejects_gzip_and_split(tmp_path):
    from fastplong_tpu.main import main
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=10,
                            min_len=30, max_len=60, seed=1)
    gz = str(tmp_path / "in.fq.gz")
    import gzip
    with open(fq, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    with pytest.raises(SystemExit):
        main(["fastplong", "-i", gz, "-o", str(tmp_path / "o.fq"),
              "--num_hosts", "2", "--host_index", "0"])
    with pytest.raises(SystemExit):
        main(["fastplong", "-i", fq, "-o", str(tmp_path / "o.fq"),
              "--num_hosts", "2", "--host_index", "0", "--split", "3"])
    with pytest.raises(SystemExit):
        main(["fastplong", "-i", fq, "-o", str(tmp_path / "o.fq"),
              "--num_hosts", "2", "--host_index", "5"])


@pytest.mark.slow
def test_distributed_dcn_merge(tmp_path):
    """Two real processes with jax.distributed: host 0 writes the merged
    report via the DCN allgather path."""
    d = str(tmp_path)
    fq = write_random_fastq(os.path.join(d, "in.fq"), n_reads=120,
                            min_len=30, max_len=400, seed=9,
                            adapter_start=START, adapter_prob=0.4)
    _run_main(["-i", fq, "-o", os.path.join(d, "s.fq"),
               "-j", os.path.join(d, "s.json"),
               "-h", os.path.join(d, "s.html")] + ARGS)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu",
                "FASTPLONG_COORDINATOR": "127.0.0.1:%d" % port,
                "FASTPLONG_TOKENS_PER_BATCH": str(1 << 15),
                "FASTPLONG_MAX_BATCH_READS": "64"})
    procs = []
    for i in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fastplong_tpu.main",
             "-i", fq, "-o", os.path.join(d, "m.fq"),
             "-j", os.path.join(d, "m.json"),
             "-h", os.path.join(d, "m.html"),
             "--num_hosts", "2", "--host_index", str(i)] + ARGS,
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    merged = strip_command(open(os.path.join(d, "m.json")).read())
    single_js = strip_command(open(os.path.join(d, "s.json")).read())
    assert merged == single_js
