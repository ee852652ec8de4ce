"""Fetch-watchdog host fallback: when a device->host result fetch stalls
beyond FASTPLONG_FETCH_TIMEOUT (a dead/degraded interconnect — the dev
tunnel's documented worst weather wedges d2h for tens of minutes), the
runner must flip to the host CPU backend and still produce byte-identical
output in bounded time.  The reference has no elastic-recovery analog
(SURVEY §5: failures are fatal error_exit); this is TPU-build hardening
for remote-attached accelerators."""

import threading
import time

from golden_util import run_ours, strip_command, write_random_fastq


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def _read_json(path):
    """JSON bytes minus the run-dependent command line (paths differ
    between the two runs' output dirs)."""
    with open(path) as f:
        return strip_command(f.read())


def _stuck_first_fetch(monkeypatch):
    """Monkeypatch runner._fetch_np so the FIRST fetch blocks ~forever
    (simulating a wedged tunnel d2h); later calls block too — after the
    watchdog fires nothing should consume them anyway."""
    from fastplong_tpu.pipeline import runner as runner_mod
    calls = {"n": 0}
    gate = threading.Event()

    def stuck(arr, *_a):
        calls["n"] += 1
        gate.wait(timeout=300)  # daemon thread: abandoned, never set
        raise RuntimeError("stuck fetch unexpectedly resumed")

    monkeypatch.setattr(runner_mod, "_fetch_np", stuck)
    return calls


def test_fallback_byte_parity(tmp_path, monkeypatch):
    """Normal run vs stuck-tunnel run: identical out/failed/JSON bytes."""
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=300,
                            min_len=30, max_len=900, seed=11,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.4, polya_prob=0.3)
    args = ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-x",
            "--cut_front", "--cut_tail", "--stats_backend", "host"]
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), args)

    monkeypatch.setenv("FASTPLONG_FETCH_TIMEOUT", "2.0")
    calls = _stuck_first_fetch(monkeypatch)
    b = tmp_path / "b"
    b.mkdir()
    t0 = time.time()
    out_b, failed_b, json_b = run_ours(fq, str(b), args)
    assert time.time() - t0 < 120, "fallback did not bound completion time"
    assert calls["n"] >= 1, "no fetch ever started — watchdog untested"
    assert _read(out_a) == _read(out_b)
    assert _read(failed_a) == _read(failed_b)
    assert _read_json(json_a) == _read_json(json_b)


def test_fallback_midrun_dispatch(tmp_path, monkeypatch):
    """Watchdog firing MID-run (minimal queue depths force an early
    drain): later batches must route through the CPU dispatch path and
    output must stay byte-identical."""
    from fastplong_tpu.pipeline import runner as runner_mod
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=400,
                            min_len=30, max_len=700, seed=23,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.3)
    args = ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-5", "-3",
            "--stats_backend", "host"]
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), args)

    monkeypatch.setenv("FASTPLONG_FETCH_TIMEOUT", "2.0")
    monkeypatch.setattr(runner_mod, "FETCH_GROUP", 1)
    monkeypatch.setattr(runner_mod.SingleEndRunner, "MAX_IN_FLIGHT", 0)
    _stuck_first_fetch(monkeypatch)
    b = tmp_path / "b"
    b.mkdir()
    out_b, failed_b, json_b = run_ours(fq, str(b), args)
    assert _read(out_a) == _read(out_b)
    assert _read(failed_a) == _read(failed_b)
    assert _read_json(json_a) == _read_json(json_b)


def test_fallback_monster_rebuild(tmp_path, monkeypatch):
    """Monster batches release their packed feed at dispatch; the
    fallback must rebuild it from the source blocks (_rebuild_packed)."""
    monkeypatch.setenv("FASTPLONG_STAT_DEVICE_CAP", "512")
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=120,
                            min_len=100, max_len=1500, seed=31,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.3)
    args = ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "--stats_backend",
            "host"]
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), args)

    monkeypatch.setenv("FASTPLONG_FETCH_TIMEOUT", "2.0")
    _stuck_first_fetch(monkeypatch)
    b = tmp_path / "b"
    b.mkdir()
    out_b, failed_b, json_b = run_ours(fq, str(b), args)
    assert _read(out_a) == _read(out_b)
    assert _read(failed_a) == _read(failed_b)
    assert _read_json(json_a) == _read_json(json_b)


def test_fallback_device_stats(tmp_path, monkeypatch):
    """Bounded completion in --stats_backend device mode: the on-device
    statistics accumulator is unreachable after the trip, so its
    contributions must be recomputed host-side from a re-read of the
    input (runner._recover_device_stats).  Byte-identical output AND
    JSON (the JSON embeds every curve the device state carried).
    DRAIN_EVERY=2 forces mid-run drains so the discard-drained-partials
    path (no double count) is exercised too."""
    from fastplong_tpu.pipeline import fast_runner
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=300,
                            min_len=30, max_len=900, seed=51,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.4, polya_prob=0.2)
    args = ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-x", "-5",
            "--stats_backend", "device"]
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), args)

    monkeypatch.setenv("FASTPLONG_FETCH_TIMEOUT", "2.0")
    monkeypatch.setattr(fast_runner.DeviceStats, "DRAIN_EVERY", 2)
    calls = _stuck_first_fetch(monkeypatch)
    b = tmp_path / "b"
    b.mkdir()
    t0 = time.time()
    out_b, failed_b, json_b = run_ours(fq, str(b), args)
    assert time.time() - t0 < 120, "fallback did not bound completion"
    assert calls["n"] >= 1
    assert _read(out_a) == _read(out_b)
    assert _read(failed_a) == _read(failed_b)
    assert _read_json(json_a) == _read_json(json_b)


def test_fallback_mesh_devices2(tmp_path, monkeypatch):
    """Bounded completion under a 2-device mesh (per-device stat
    partials on the unreachable devices): same recovery contract."""
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=260,
                            min_len=30, max_len=700, seed=57,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.3)
    args = ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-3",
            "--devices", "2", "--stats_backend", "device"]
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), args)

    monkeypatch.setenv("FASTPLONG_FETCH_TIMEOUT", "2.0")
    _stuck_first_fetch(monkeypatch)
    b = tmp_path / "b"
    b.mkdir()
    t0 = time.time()
    out_b, failed_b, json_b = run_ours(fq, str(b), args)
    assert time.time() - t0 < 180, "mesh fallback did not bound completion"
    assert _read(out_a) == _read(out_b)
    assert _read(failed_a) == _read(failed_b)
    assert _read_json(json_a) == _read_json(json_b)


def test_fallback_device_stats_stdin_fails_loud(tmp_path, monkeypatch):
    """Stream input cannot be re-read for device-state recovery: the trip
    must fail LOUD (error_exit with a diagnostic naming the fix), never
    hang or crash uncontrolled — the reference bar (util.h:270-273)."""
    import numpy as np
    import pytest
    from fastplong_tpu.pipeline.runner import SingleEndRunner
    from fastplong_tpu.main import build_parser, options_from_args
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=10,
                            min_len=30, max_len=400, seed=61)
    argv = ["fastplong", "-i", fq, "-o", str(tmp_path / "o.fq"),
            "-s", "AATGTACTTCGTTCAGTTACGTATTGCT",
            "--stats_backend", "device"]
    args = build_parser().parse_args(argv[1:])
    opt = options_from_args(args, argv)
    opt.validate()
    r = SingleEndRunner(opt)
    # simulate: stats already on device, input turns out to be a stream
    r._dev_statted.append(np.arange(4, dtype=np.int64))
    opt.in_file = "/dev/stdin"
    with pytest.raises(SystemExit):
        r._enter_fallback([])


def test_fallback_numpy_backend_parity(tmp_path, monkeypatch):
    """The rescue must complete byte-identically WITHOUT a JAX CPU
    backend (the round-3 bench TPU shipped none — jax.devices('cpu')
    raised and the rescue crashed): simulate that environment by making
    the CPU-backend probe fail, forcing the numpy host step."""
    import jax as jax_mod
    from fastplong_tpu.pipeline import runner as runner_mod
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=250,
                            min_len=30, max_len=800, seed=41,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.4, polya_prob=0.2)
    args = ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-x", "-5", "-3",
            "--stats_backend", "host"]
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), args)

    real_devices = jax_mod.devices

    def no_cpu_devices(platform=None):
        if platform == "cpu":
            raise RuntimeError(
                "Unknown backend cpu. Available backends are ['axon']")
        return real_devices(platform)

    monkeypatch.setenv("FASTPLONG_FETCH_TIMEOUT", "2.0")
    monkeypatch.setattr(runner_mod.jax, "devices", no_cpu_devices)
    _stuck_first_fetch(monkeypatch)
    b = tmp_path / "b"
    b.mkdir()
    t0 = time.time()
    out_b, failed_b, json_b = run_ours(fq, str(b), args)
    assert time.time() - t0 < 120
    assert _read(out_a) == _read(out_b)
    assert _read(failed_a) == _read(failed_b)
    assert _read_json(json_a) == _read_json(json_b)


def test_fallback_forced_numpy_env(tmp_path, monkeypatch):
    """FASTPLONG_FALLBACK_BACKEND=numpy pins the numpy host step even
    when a CPU backend exists (deterministic coverage of that layer)."""
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=200,
                            min_len=30, max_len=600, seed=43,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.4)
    args = ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-b",
            "--stats_backend", "host"]
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), args)

    monkeypatch.setenv("FASTPLONG_FETCH_TIMEOUT", "2.0")
    monkeypatch.setenv("FASTPLONG_FALLBACK_BACKEND", "numpy")
    _stuck_first_fetch(monkeypatch)
    b = tmp_path / "b"
    b.mkdir()
    out_b, failed_b, json_b = run_ours(fq, str(b), args)
    assert _read(out_a) == _read(out_b)
    assert _read(failed_a) == _read(failed_b)
    assert _read_json(json_a) == _read_json(json_b)


def test_daemon_executor():
    from fastplong_tpu.util import DaemonExecutor
    ex = DaemonExecutor(2)
    assert ex.submit(lambda a, b: a + b, 2, 3).result(5) == 5
    f = ex.submit(lambda: 1 / 0)
    try:
        f.result(5)
        assert False, "exception not propagated"
    except ZeroDivisionError:
        pass
    # workers must be daemon threads (wedged device calls cannot be
    # allowed to hang interpreter exit)
    assert all(t.daemon for t in ex._threads)
    ex.shutdown(timeout=5)
