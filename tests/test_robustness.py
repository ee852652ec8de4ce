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


@pytest.mark.parametrize("profile", ["fast", "tunnel"])
def test_link_profiles_byte_parity(tmp_path, monkeypatch, profile):
    """Byte parity must hold under BOTH link profiles (eager shallow
    fetching and deep deferred fetching) — the adaptive LinkPolicy only
    ever moves watermarks, never correctness."""
    monkeypatch.setenv("FASTPLONG_LINK", profile)
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=350,
                            min_len=30, max_len=800, seed=83,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.4)
    assert_parity(fq, str(tmp_path),
                  ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-x", "-3"])


def test_link_policy_pins_and_trim(monkeypatch):
    """Env pins override profiles; the daemon-resident pin forces
    partial trimming; the early-fetch trigger is byte-denominated."""
    from fastplong_tpu.pipeline.link import LinkPolicy
    monkeypatch.setenv("FASTPLONG_EARLY_FETCH_MB", "7")
    monkeypatch.setenv("FASTPLONG_TRIM_PARTIALS", "1")
    p = LinkPolicy(tunneled=True)
    assert p.early_fetch_bytes == 7 << 20
    assert p.partial_trim_ok()
    monkeypatch.delenv("FASTPLONG_EARLY_FETCH_MB")
    monkeypatch.setenv("FASTPLONG_TRIM_PARTIALS", "0")
    q = LinkPolicy(tunneled=False)   # fast profile, but pinned off
    assert not q.partial_trim_ok()
    monkeypatch.delenv("FASTPLONG_TRIM_PARTIALS")
    monkeypatch.setenv("FASTPLONG_DAEMON_CHILD", "1")
    r = LinkPolicy(tunneled=True)    # resident daemon: trim pinned on
    assert r.partial_trim_ok()
    assert not r.eager_drain         # tunnel schedule otherwise intact


def test_link_policy_adaptation():
    """Observed d2h bandwidth flips the profile both ways; env pins and
    forced profiles outrank the sniff."""
    from fastplong_tpu.pipeline.link import LinkPolicy
    p = LinkPolicy(tunneled=True)
    assert p.profile == "tunnel"
    p.observe_fetch(1 << 26, 0.1)   # ~670 MB/s observed
    assert p.profile == "fast"
    for _ in range(8):
        p.observe_fetch(1 << 20, 1.0)   # ~1 MB/s observed
    assert p.profile == "tunnel"
    # late sniff must not override a real observation
    p.set_tunneled(False)
    assert p.profile == "tunnel"
    # unknown platform starts conservative, sniff resolves it
    q = LinkPolicy(tunneled=None)
    assert q.profile == "tunnel"
    q.set_tunneled(False)
    assert q.profile == "fast"


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


def test_runner_transfer_accounting(tmp_path):
    """The runner's transfer counters (bench weather-normalization inputs)
    are populated: bytes_h2d covers the packed feeds, bytes_d2h the
    drains, and the base5 layout keeps the feed near 1 byte/base."""
    import numpy as np
    from fastplong_tpu.main import build_parser, options_from_args
    from fastplong_tpu.pipeline.runner import SingleEndRunner

    in_fq = str(tmp_path / "in.fq")
    rng = np.random.default_rng(3)
    total = 0
    with open(in_fq, "w") as f:
        for i in range(300):
            n = int(rng.integers(60, 900))
            total += n
            seq = "".join(rng.choice(list("ACGT"), size=n))
            q = "".join(chr(int(x)) for x in rng.integers(40, 74, size=n))
            f.write("@r%d\n%s\n+\n%s\n" % (i, seq, q))
    argv = ["fastplong", "-i", in_fq, "-o", str(tmp_path / "o.fq"),
            "-j", str(tmp_path / "o.json"), "-h", str(tmp_path / "o.html"),
            "-s", "AATGTACTTCGTTCAGTTACGTATTGCT"]
    args = build_parser().parse_args(argv[1:])
    opt = options_from_args(args, argv)
    opt.validate()
    runner = SingleEndRunner(opt)
    runner.run()
    assert runner.bytes_h2d > total          # feed >= 1 byte/base
    # padding-bounded: base5 feed stays well under 2 bytes/base even with
    # power-of-4 buckets on this length mix
    assert runner.bytes_h2d < 16 * total
    assert runner.bytes_d2h > 0              # at least one drain happened
    assert isinstance(runner.load_seconds, dict)
