"""Threading/failure robustness: writer-thread error surfacing, pipeline
stress with minimal queue depths, split over-quota behavior pin."""

import time

import numpy as np
import pytest

from golden_util import assert_parity, write_random_fastq


class _FailingWriter:
    """Writer stand-in whose write always fails (e.g. disk full)."""

    def __init__(self):
        self.closed = False

    def write(self, data):
        raise OSError(28, "No space left on device")

    def close(self):
        self.closed = True


def test_async_writer_failure_surfaces_promptly():
    from fastplong_tpu.io.writer import AsyncWriter
    w = AsyncWriter(_FailingWriter(), max_queue=4)
    w.write(b"x")
    # the failure must surface via check() without another write call
    deadline = time.time() + 5
    while time.time() < deadline:
        try:
            w.check()
        except OSError:
            break
        time.sleep(0.01)
    else:
        pytest.fail("writer failure never surfaced through check()")
    # a dead writer must keep draining: these puts must not block even
    # though the queue bound is small
    for _ in range(64):
        try:
            w.write(b"y")
        except OSError:
            pass
    with pytest.raises(OSError):
        w.close()


def test_pipeline_stress_tiny_queues(tmp_path, monkeypatch):
    """Byte parity must hold with every pipeline depth at its minimum:
    fetch groups of 1, one group in flight, immediate partial flushes —
    maximal queue churn across the block-completion tracking."""
    from fastplong_tpu.pipeline import runner as runner_mod
    monkeypatch.setattr(runner_mod, "FETCH_GROUP", 1)
    monkeypatch.setattr(runner_mod.SingleEndRunner, "MAX_IN_FLIGHT", 0)
    monkeypatch.setattr(runner_mod.SingleEndRunner, "FLUSH_BLOCKS", 1)
    monkeypatch.setattr(runner_mod.SingleEndRunner, "MAX_BLOCKS_PENDING", 1)
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=400,
                            min_len=30, max_len=900, seed=77,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.4, polya_prob=0.3)
    assert_parity(fq, str(tmp_path),
                  ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-x",
                   "--cut_front", "--cut_tail"])


def test_profile_flag_writes_trace(tmp_path):
    """--profile DIR captures a jax.profiler trace of the run."""
    from fastplong_tpu.main import main
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=20,
                            min_len=30, max_len=120, seed=5)
    prof = tmp_path / "trace"
    main(["fastplong", "-i", fq, "-o", str(tmp_path / "o.fq"),
          "-j", str(tmp_path / "o.json"), "-h", str(tmp_path / "o.html"),
          "--profile", str(prof), "-A"])
    files = list(prof.rglob("*"))
    assert any(f.is_file() for f in files), "no trace files written"


def test_python_fallback_byte_parity(tmp_path, monkeypatch):
    """With the native library unavailable (FASTPLONG_NATIVE_SO pointing
    at a nonexistent path), every pure-Python fallback — parse, pack,
    emit, gzip, statRead — must still produce byte-identical output: a
    missing toolchain degrades performance, never correctness."""
    from fastplong_tpu import native

    monkeypatch.setenv("FASTPLONG_NATIVE_SO", "/nonexistent/libfpl.so")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    assert native.get_lib() is None

    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=300,
                            min_len=30, max_len=700, seed=88,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.5, polya_prob=0.3)
    assert_parity(fq, str(tmp_path),
                  ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-x",
                   "--cut_front", "--cut_tail"])


def test_split_over_quota_appends_to_last_file(tmp_path):
    """Pin the documented divergence (pipeline/split.py:11-17): reads past
    split.number * split.size keep appending to the worker's last file
    instead of the reference's timing-dependent drop."""
    from fastplong_tpu.config import Options
    from fastplong_tpu.pipeline.split import SplitWriterSet

    opt = Options()
    opt.out = str(tmp_path / "out.fq")
    opt.thread = 1
    opt.split.enabled = True
    opt.split.by_file_number = True
    opt.split.number = 2
    opt.split.size = 16         # one 16-read pack per file (quota: 32)
    opt.split.digits = 4
    s = SplitWriterSet(opt)
    for i in range(48):         # one full pack over quota
        s.add_read([b"@r%d\nACGT\n+\n!!!!\n" % i], 1)
    s.close()
    f1 = (tmp_path / "0001.out.fq").read_bytes()
    f2 = (tmp_path / "0002.out.fq").read_bytes()
    assert f1.count(b"@r") == 16
    # the over-quota pack (reads 32..47) appends to the last file
    assert f2.count(b"@r") == 32
    assert b"@r47\n" in f2
