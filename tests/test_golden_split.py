"""Golden parity for split output (--split / --split_by_lines)."""

import glob
import os
import subprocess

import pytest

from golden_util import (write_random_fastq, ensure_reference, run_ours,
                         ref_env,
                         strip_command)


def run_split_case(fq, tmp_path, extra):
    ref_bin = ensure_reference()
    ref_dir = os.path.join(str(tmp_path), "ref")
    my_dir = os.path.join(str(tmp_path), "my")
    os.makedirs(ref_dir)
    os.makedirs(my_dir)
    r = subprocess.run(
        [ref_bin, "-i", fq, "-o", os.path.join(ref_dir, "out.fq"),
         "-j", os.path.join(ref_dir, "r.json"),
         "-h", os.path.join(ref_dir, "r.html")] + extra,
        capture_output=True, timeout=300, env=ref_env())
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    from fastplong_tpu.main import main
    main(["fastplong", "-i", fq, "-o", os.path.join(my_dir, "out.fq"),
          "-j", os.path.join(my_dir, "m.json"),
          "-h", os.path.join(my_dir, "m.html")] + extra)

    ref_files = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(ref_dir, "*.out.fq")))
    my_files = sorted(os.path.basename(p)
                      for p in glob.glob(os.path.join(my_dir, "*.out.fq")))
    assert ref_files == my_files, (ref_files, my_files)
    for f in ref_files:
        a = open(os.path.join(ref_dir, f), "rb").read()
        b = open(os.path.join(my_dir, f), "rb").read()
        assert a == b, "split file %s differs (ref %d vs ours %d bytes)" % (
            f, len(a), len(b))
    rj = strip_command(open(os.path.join(ref_dir, "r.json")).read())
    mj = strip_command(open(os.path.join(my_dir, "m.json")).read())
    assert rj == mj


@pytest.fixture(scope="module")
def fq(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_split")
    return write_random_fastq(str(d / "in.fq"), n_reads=500, min_len=30,
                              max_len=300, seed=33)


def test_split_by_number(fq, tmp_path):
    run_split_case(fq, tmp_path, ["-A", "--split", "5"])


def test_split_by_number_many(fq, tmp_path):
    run_split_case(fq, tmp_path, ["-A", "--split", "9",
                                  "--split_prefix_digits", "3"])


def test_split_by_lines(fq, tmp_path):
    run_split_case(fq, tmp_path, ["-A", "--split_by_lines", "1000"])


def test_split_single_thread(fq, tmp_path):
    run_split_case(fq, tmp_path, ["-A", "--split", "4", "-w", "1"])


def test_split_over_quota_documented_divergence(tmp_path_factory, tmp_path):
    """Over-quota --split: the input (503 reads) exceeds
    split.number*split.size (5*100) by 3 reads.

    The reference's behavior past the quota is TIMING-DEPENDENT: a worker
    whose files are full only re-checks canBeStopped between queue drains
    (seprocessor.cpp:430-438, threadconfig.cpp:88-108), so with a slow
    reader it drops the excess reads, while on a small input like this the
    reader finishes first and the excess appends to the worker's last
    file.  OUR behavior is the deterministic append in every case
    (pipeline/split.py divergence note) — which on this small input is
    also exactly what the reference does, so full byte parity is asserted
    here; on large inputs the reference may drop reads where we never do
    (the README documents this as the one known divergence).
    """
    d = tmp_path_factory.mktemp("golden_split_oq")
    fq = write_random_fastq(str(d / "in.fq"), n_reads=503, min_len=30,
                            max_len=300, seed=44)
    run_split_case(fq, tmp_path, ["-A", "--split", "5", "-w", "3"])
    # our no-drop invariant: every passed read is in some split file
    import json
    my_dir = os.path.join(str(tmp_path), "my")
    records = 0
    for p in glob.glob(os.path.join(my_dir, "*.out.fq")):
        with open(p, "rb") as f:
            records += sum(1 for _ in f) // 4
    with open(os.path.join(my_dir, "m.json")) as f:
        passed = json.load(f)["filtering_result"]["passed_filter_reads"]
    assert records == passed, "split output dropped passed reads"
