"""Folder batch driver: file discovery, per-file processing, summary."""

import json
import os

import numpy as np
import pytest

from fastplong_tpu import parallel


def _write_fq(path, n=40, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            ln = int(rng.integers(40, 150))
            seq = "".join(rng.choice(list("ACGT"), size=ln))
            q = "".join(chr(int(x)) for x in rng.integers(35, 70, size=ln))
            f.write("@r%d\n%s\n+\n%s\n" % (i, seq, q))


def test_find_fastqs(tmp_path):
    for name in ("a.fq", "b.fastq", "c.fq.gz", "Undetermined_x.fq",
                 "notes.txt"):
        (tmp_path / name).write_text("")
    (tmp_path / "sub").mkdir()
    found = [os.path.basename(p) for p in parallel.find_fastqs(str(tmp_path))]
    assert found == ["a.fq", "b.fastq", "c.fq.gz"]


def test_host_sharding(tmp_path):
    for name in ("a.fq", "b.fq", "c.fq", "d.fq"):
        (tmp_path / name).write_text("")
    files = parallel.find_fastqs(str(tmp_path))
    shard0 = [f for i, f in enumerate(files) if i % 2 == 0]
    shard1 = [f for i, f in enumerate(files) if i % 2 == 1]
    assert len(shard0) == 2 and len(shard1) == 2
    assert set(shard0) | set(shard1) == set(files)


def test_end_to_end(tmp_path):
    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    _write_fq(str(ind / "x.fq"), seed=1)
    _write_fq(str(ind / "y.fastq"), seed=2)
    rc = parallel.main(["-i", str(ind), "-o", str(outd), "--args=-A"])
    assert rc == 0
    names = sorted(os.listdir(outd))
    assert "x.clean.fastq.gz" in names
    assert "y.clean.fastq.gz" in names
    assert "overall.html" in names
    j = json.load(open(outd / "x.fq.json"))
    assert j["summary"]["before_filtering"]["total_reads"] == 40
    html = open(outd / "overall.html").read()
    assert "x.fq" in html and "y.fastq" in html


def test_summary_only(tmp_path):
    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    _write_fq(str(ind / "x.fq"), seed=1)
    rc = parallel.main(["-i", str(ind), "-o", str(outd), "--args=-A",
                        "--no_summary"])
    assert rc == 0
    assert "overall.html" not in os.listdir(outd)
    # post-hoc aggregation over the shared report dir (multi-host flow)
    rc = parallel.main(["-i", str(ind), "-o", str(outd), "--summary_only"])
    assert rc == 0
    assert "x.fq" in open(outd / "overall.html").read()


def test_summary_only_empty_dir(tmp_path):
    assert parallel.main(["-i", str(tmp_path), "--summary_only"]) == 1


def test_summary_only_missing_dir(tmp_path):
    # friendly error, not a FileNotFoundError traceback
    missing = str(tmp_path / "never_created")
    assert parallel.main(["-i", missing, "--summary_only"]) == 1


def test_summary_skips_unrelated_json(tmp_path):
    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    _write_fq(str(ind / "x.fq"), seed=1)
    rc = parallel.main(["-i", str(ind), "-o", str(outd), "--args=-A"])
    assert rc == 0
    # drop a non-report .json into the report dir (e.g. a stray config or
    # a merged multi-host artifact) and re-aggregate
    (outd / "stray_config.json").write_text('{"threads": 4}')
    rc = parallel.main(["-i", str(ind), "-o", str(outd), "--summary_only"])
    assert rc == 0
    html = open(outd / "overall.html").read()
    assert "x.fq" in html and "stray_config" not in html
