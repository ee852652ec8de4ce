"""Warm-process daemon (fastplong_tpu/daemon.py): CLI jobs handed to a
resident process must produce byte-identical outputs, stale daemons must
be replaced, and ineligible invocations must bypass the daemon."""

import os
import subprocess
import sys
import time

import pytest

from golden_util import run_ours, strip_command, write_random_fastq

START = "AATGTACTTCGTTCAGTTACGTATTGCT"


def _read(p):
    with open(p, "rb") as f:
        return f.read()


@pytest.fixture()
def daemon_env(tmp_path, monkeypatch):
    """Isolated daemon socket dir; daemon torn down after the test."""
    d = tmp_path / "daemon"
    d.mkdir()
    monkeypatch.setenv("FASTPLONG_DAEMON_DIR", str(d))
    monkeypatch.setenv("FASTPLONG_DAEMON", "1")
    monkeypatch.setenv("FASTPLONG_DAEMON_IDLE", "120")
    yield str(d)
    from fastplong_tpu import daemon
    daemon.shutdown_daemon()


def _cli(args, timeout=300):
    r = subprocess.run([sys.executable, "-m", "fastplong_tpu.main"] + args,
                       capture_output=True, timeout=timeout,
                       env=dict(os.environ),
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    return r


def test_daemon_byte_parity_and_warm_speed(tmp_path, daemon_env):
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=250,
                            min_len=30, max_len=700, seed=71,
                            adapter_start=START, adapter_prob=0.4)
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), ["-s", START, "-x"])

    def args(tag):
        b = tmp_path / tag
        b.mkdir()
        return [
            "-i", fq, "-o", str(b / "out.fq"),
            "--failed_out", str(b / "failed.fq"),
            "-j", str(b / "r.json"), "-h", str(b / "r.html"),
            "-s", START, "-x",
        ], b

    # first run spawns the daemon (cold), second reuses it (warm)
    a1, d1 = args("d1")
    r1 = _cli(a1)
    assert r1.returncode == 0, r1.stderr.decode()[-2000:]
    assert b"daemon unavailable" not in r1.stderr
    t0 = time.time()
    a2, d2 = args("d2")
    r2 = _cli(a2)
    warm = time.time() - t0
    assert r2.returncode == 0, r2.stderr.decode()[-2000:]

    for d in (d1, d2):
        assert _read(str(d / "out.fq")) == _read(out_a)
        assert _read(str(d / "failed.fq")) == _read(failed_a)
        assert (strip_command(open(str(d / "r.json")).read())
                == strip_command(open(json_a).read()))
    # the warm run must skip backend init (generous bound: CI jitter)
    assert warm < 60

    # the CLI stderr must still carry the run summary (relayed from the
    # daemon job)
    assert b"JSON report:" in r2.stderr


def test_daemon_stale_code_token_respawns(tmp_path, daemon_env):
    from fastplong_tpu import daemon
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=50,
                            min_len=30, max_len=200, seed=73)
    b = tmp_path / "b"
    b.mkdir()
    args = ["-i", fq, "-o", str(b / "out.fq"), "-j", str(b / "r.json"),
            "-h", str(b / "r.html"), "-A"]
    r = _cli(args)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    # talk to the live daemon with a DIFFERENT token: the client must
    # shut it down and spawn a fresh one, then still complete the job
    conn, hello = daemon._connect()
    pid1 = hello["pid"]
    conn.close()
    real_token = daemon.code_token
    try:
        daemon.code_token = lambda: "stale" + real_token()
        # in-process client call (monkeypatched token visible)
        rc = daemon.run_via_daemon(
            ["fastplong"] + args, spawn_wait=60.0)
    finally:
        daemon.code_token = real_token
    # the respawned daemon has the REAL token, so the stale-token client
    # keeps shutting it down until spawn_wait runs out -> rc None and it
    # would fall back in-process; pid1 must be gone either way
    deadline = time.time() + 10
    alive = True
    while time.time() < deadline:
        try:
            os.kill(pid1, 0)
        except OSError:
            alive = False
            break
        time.sleep(0.2)
    assert not alive, "stale daemon was not shut down"
    assert rc is None or rc == 0


def test_daemon_ineligible_argv_bypasses():
    from fastplong_tpu import daemon
    assert not daemon.eligible(["fastplong", "--stdin", "-o", "x"])
    assert not daemon.eligible(["fastplong", "-i", "a", "--stdout"])
    assert not daemon.eligible(["fastplong", "--num_hosts", "2"])
    assert daemon.eligible(["fastplong", "-i", "a", "-o", "b"])


def test_daemon_prefork_mode_parity(tmp_path, daemon_env, monkeypatch):
    """Prefork mode (single-use pre-warmed worker per job — the tunnel
    default): byte parity across two consecutive jobs, worker replaced
    between them."""
    monkeypatch.setenv("FASTPLONG_DAEMON_MODE", "prefork")
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=120,
                            min_len=30, max_len=500, seed=83,
                            adapter_start=START, adapter_prob=0.4)
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), ["-s", START])
    for tag in ("p1", "p2"):
        b = tmp_path / tag
        b.mkdir()
        r = _cli(["-i", fq, "-o", str(b / "out.fq"),
                  "--failed_out", str(b / "failed.fq"),
                  "-j", str(b / "r.json"), "-h", str(b / "r.html"),
                  "-s", START])
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        assert b"daemon unavailable" not in r.stderr
        assert _read(str(b / "out.fq")) == _read(out_a)
        assert _read(str(b / "failed.fq")) == _read(failed_a)
        assert (strip_command(open(str(b / "r.json")).read())
                == strip_command(open(json_a).read()))


def test_daemon_env_mismatch_falls_back(tmp_path, daemon_env,
                                        monkeypatch):
    """Import-time env differences must be rejected by the daemon (the
    client then runs in-process) — a daemon with different packing
    geometry would silently produce wrong-shaped work."""
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=40,
                            min_len=30, max_len=200, seed=79)
    b = tmp_path / "b"
    b.mkdir()
    args = ["-i", fq, "-o", str(b / "out.fq"), "-j", str(b / "r.json"),
            "-h", str(b / "r.html"), "-A"]
    r = _cli(args)
    assert r.returncode == 0
    env = dict(os.environ)
    env["FASTPLONG_TOKENS_PER_BATCH"] = "131072"  # differs from daemon
    r2 = subprocess.run(
        [sys.executable, "-m", "fastplong_tpu.main"] + args,
        capture_output=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r2.returncode == 0, r2.stderr.decode()[-2000:]
    assert b"daemon unavailable" in r2.stderr  # in-process fallback ran


def test_daemon_concurrent_clients(tmp_path, daemon_env):
    """Two clients racing one broker: the second queues at the hello and
    both jobs complete with correct outputs (the device is serialized
    either way, daemon._connect)."""
    import threading
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=120,
                            min_len=30, max_len=400, seed=101,
                            adapter_start=START, adapter_prob=0.3)
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), ["-s", START])
    # warm the daemon first so both racers hit a live broker
    w = tmp_path / "w"
    w.mkdir()
    r = _cli(["-i", fq, "-o", str(w / "out.fq"), "-j", str(w / "r.json"),
              "-h", str(w / "r.html"), "-s", START])
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    results = {}

    def run_one(tag):
        b = tmp_path / tag
        b.mkdir()
        results[tag] = (_cli(["-i", fq, "-o", str(b / "out.fq"),
                              "--failed_out", str(b / "failed.fq"),
                              "-j", str(b / "r.json"),
                              "-h", str(b / "r.html"), "-s", START]), b)

    ts = [threading.Thread(target=run_one, args=("c%d" % i,))
          for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    for tag, (r, b) in results.items():
        assert r.returncode == 0, (tag, r.stderr.decode()[-2000:])
        assert _read(str(b / "out.fq")) == _read(out_a), tag
        assert _read(str(b / "failed.fq")) == _read(failed_a), tag


def test_quiesce_pause_gate(tmp_path, monkeypatch):
    """_pause_while_quiesced blocks while the broker's flag is up,
    returns when it drops, and ignores a stale (dead-broker) flag."""
    import threading
    from fastplong_tpu import daemon

    d = tmp_path / "qd"
    d.mkdir()
    monkeypatch.setenv("FASTPLONG_DAEMON_DIR", str(d))
    q = daemon._quiesce_path()

    # no flag: returns immediately
    t0 = time.time()
    daemon._pause_while_quiesced()
    assert time.time() - t0 < 0.5

    # fresh flag: blocks until removed
    with open(q, "w") as f:
        f.write("1")
    threading.Timer(0.8, os.unlink, args=(q,)).start()
    t0 = time.time()
    daemon._pause_while_quiesced()
    waited = time.time() - t0
    assert 0.5 < waited < 5.0, waited

    # stale flag (mtime far in the past): ignored
    with open(q, "w") as f:
        f.write("1")
    os.utime(q, (time.time() - 900, time.time() - 900))
    t0 = time.time()
    daemon._pause_while_quiesced()
    assert time.time() - t0 < 0.5


def test_pool_spawns_serialized(monkeypatch):
    """ensure() starts at most one worker per call and none while
    another is still warming (round-5 contention fix)."""
    from fastplong_tpu import daemon

    spawned = []

    class FakeWorker:
        def __init__(self, argv):
            self.key = daemon.job_key(argv)
            self._ready = False
            spawned.append(self)

        def ready(self):
            return self._ready

        def alive(self):
            return True

        def kill(self):
            pass

    monkeypatch.setattr(daemon, "_Worker", FakeWorker)
    monkeypatch.setenv("FASTPLONG_DAEMON_POOL", "3")
    pool = daemon._WorkerPool()
    argv = ["x", "-i", "in.fq", "-o", "out.fq", "-s", "ACGT"]

    pool.ensure(argv)
    assert len(spawned) == 1
    pool.ensure(argv)          # first still warming: no new spawn
    assert len(spawned) == 1
    spawned[0]._ready = True
    pool.ensure(argv)          # warm: next one may start
    assert len(spawned) == 2
    spawned[1]._ready = True
    pool.ensure(argv)
    assert len(spawned) == 3
    pool.ensure(argv)          # at target: no spawn beyond 3
    spawned[2]._ready = True
    pool.ensure(argv)
    assert len(spawned) == 3


def test_pool_status_command(tmp_path, daemon_env):
    """The broker answers cmd=pool with ready/target without running a
    job, and tops the pool up for the given argv."""
    from fastplong_tpu import daemon

    fq = str(tmp_path / "in.fq")
    write_random_fastq(fq, n_reads=20, seed=5)
    out = tmp_path / "o"
    out.mkdir()
    # spawn the daemon via a real job
    r = _cli(["-i", fq, "-o", str(out / "out.fq"),
              "-j", str(out / "r.json"), "-h", str(out / "r.html"),
              "-s", START])
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    st = daemon.pool_status(["x", "-i", fq, "-o", str(out / "out.fq"),
                             "-s", START])
    assert st is not None and st.get("ok")
    assert "ready" in st and "target" in st
    assert st["ready"] <= max(st["target"], 0)
