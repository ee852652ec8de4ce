"""Driver contract of bench.py: it must ALWAYS print exactly one
well-formed JSON line with a numeric "value", whatever the device tunnel
is doing (the driver records this line as the round's benchmark).

These tests exercise the orchestrator's merge/fallback logic with the
child subprocesses and the device health probe faked out — no device, no
timed runs.
"""

import importlib.util
import json
import os
import subprocess
import sys
import types

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_under_test",
                                                  _BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # the orchestrator path must engage (multi-profile, not a child)
    monkeypatch.delenv("FASTPLONG_BENCH_CHILD", raising=False)
    # empty platform: no jax.config poking, but the health gate is active
    monkeypatch.setenv("JAX_PLATFORMS", "")
    return mod


def _last_json_line(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "bench printed nothing"
    return json.loads(out[-1])


def test_dead_tunnel_emits_wellformed_line(bench, monkeypatch, capsys):
    monkeypatch.setenv("FASTPLONG_BENCH_PROFILES", "plain,headline")
    monkeypatch.setenv("FASTPLONG_BENCH_DEADLINE", "1")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: False)
    bench.main()
    j = _last_json_line(capsys)
    assert j["error"] == "tpu_unreachable"
    assert j["value"] == 0.0
    assert j["metric"] == "bases_per_second_per_chip"
    assert j["unit"] == "bases/s"
    assert j["vs_baseline"] == 0.0


def _fake_run_factory(headline_values, plain_part):
    """subprocess.run stand-in: answers per-profile child invocations."""
    calls = {"headline": 0}

    def fake_run(cmd, env=None, cwd=None, capture_output=True, timeout=None):
        prof = env["FASTPLONG_BENCH_PROFILES"]
        if prof == "headline":
            i = min(calls["headline"], len(headline_values) - 1)
            calls["headline"] += 1
            part = {"value": headline_values[i],
                    "vs_baseline": headline_values[i] / 3e9,
                    "stage_seconds": {"which_run": i}}
        elif prof == "plain":
            part = dict(plain_part)
        else:
            part = {prof + "_bases_per_second": 1.0}
        r = types.SimpleNamespace()
        r.returncode = 0
        r.stdout = (json.dumps(part) + "\n").encode()
        r.stderr = b""
        return r

    return fake_run


def test_headline_best_of_n(bench, monkeypatch, capsys):
    monkeypatch.setenv("FASTPLONG_BENCH_PROFILES", "plain,headline,gz")
    monkeypatch.setenv("FASTPLONG_BENCH_HEADLINE_RUNS", "2")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)
    monkeypatch.setattr(
        subprocess, "run",
        _fake_run_factory([5.0, 9.0],
                          {"warm_run_bases_per_second": 2.0,
                           "device_step_bases_per_second": 100.0}))
    bench.main()
    j = _last_json_line(capsys)
    assert j["headline_runs"] == [5.0, 9.0]
    assert j["value"] == 9.0                       # best of the N runs
    assert j["stage_seconds"] == {"which_run": 1}  # ...and ITS breakdown
    assert j["device_step_bases_per_second"] == 100.0   # plain merged in
    assert j["gz_bases_per_second"] == 1.0
    assert j["metric"] == "bases_per_second_per_chip"


def test_value_falls_back_to_warm_run(bench, monkeypatch, capsys):
    monkeypatch.setenv("FASTPLONG_BENCH_PROFILES", "plain,gz")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)
    monkeypatch.setattr(
        subprocess, "run",
        _fake_run_factory([], {"warm_run_bases_per_second": 7.0}))
    bench.main()
    j = _last_json_line(capsys)
    assert j["value"] == 7.0
    assert j["vs_baseline"] == round(7.0 / 3e9, 4)


def test_stray_stdout_lines_do_not_crash(bench, monkeypatch, capsys):
    """A library banner on a child's stdout must not break the contract:
    the last PARSEABLE line wins."""
    monkeypatch.setenv("FASTPLONG_BENCH_PROFILES", "plain,headline")
    monkeypatch.setenv("FASTPLONG_BENCH_HEADLINE_RUNS", "1")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)

    def noisy_run(cmd, env=None, cwd=None, capture_output=True,
                  timeout=None):
        r = types.SimpleNamespace()
        r.returncode = 0
        r.stdout = (json.dumps({"value": 3.0}) +
                    "\nW0000 some runtime banner\xff\n").encode(
                        "utf-8", "replace")
        r.stderr = b""
        return r

    monkeypatch.setattr(subprocess, "run", noisy_run)
    bench.main()
    j = _last_json_line(capsys)
    assert j["value"] == 3.0


def test_garbage_stdout_child_is_an_error_not_a_crash(bench, monkeypatch,
                                                      capsys):
    monkeypatch.setenv("FASTPLONG_BENCH_PROFILES", "plain,headline")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)

    def garbage_run(cmd, env=None, cwd=None, capture_output=True,
                    timeout=None):
        r = types.SimpleNamespace()
        r.returncode = 0
        r.stdout = b"not json at all\nnor this\n"
        r.stderr = b""
        return r

    monkeypatch.setattr(subprocess, "run", garbage_run)
    bench.main()
    j = _last_json_line(capsys)
    assert j["value"] == 0.0
    assert "no JSON line" in j["plain_error"]


def test_children_get_scaling_suppressed_and_warm_flag(bench, monkeypatch,
                                                       capsys):
    """Non-plain children must run single-device even when the parent env
    carries a multi-device list, and must be told to self-warm when no
    plain child ran first."""
    monkeypatch.setenv("FASTPLONG_BENCH_PROFILES", "gz,short")
    monkeypatch.setenv("FASTPLONG_BENCH_DEVICES", "1,4,8")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)
    seen = {}

    def spy_run(cmd, env=None, cwd=None, capture_output=True, timeout=None):
        prof = env["FASTPLONG_BENCH_PROFILES"]
        seen[prof] = (env.get("FASTPLONG_BENCH_DEVICES"),
                      env.get("FASTPLONG_BENCH_NEED_WARM"))
        r = types.SimpleNamespace()
        r.returncode = 0
        r.stdout = json.dumps(
            {prof + "_bases_per_second": 4.0}).encode() + b"\n"
        r.stderr = b""
        return r

    monkeypatch.setattr(subprocess, "run", spy_run)
    bench.main()
    j = _last_json_line(capsys)
    assert seen["gz"] == ("1", "1")
    assert seen["short"] == ("1", "1")
    # all profiles succeeded: the fallback picks a real rate, no error
    assert j["value"] == 4.0
    assert j["value_source"] == "gz_bases_per_second"
    assert "error" not in j


def test_headline_median_reported(bench, monkeypatch, capsys):
    monkeypatch.setenv("FASTPLONG_BENCH_PROFILES", "headline,gz")
    monkeypatch.setenv("FASTPLONG_BENCH_HEADLINE_RUNS", "3")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)
    monkeypatch.setattr(subprocess, "run",
                        _fake_run_factory([5.0, 9.0, 6.0], {}))
    bench.main()
    j = _last_json_line(capsys)
    assert j["value"] == 9.0             # best-of-N stays the headline
    assert j["headline_median"] == 6.0   # ...median alongside it


def test_scaling_child_env(bench, monkeypatch, capsys):
    """The scaling profile must run on a virtual CPU mesh (weather-free),
    with the 1/2/4/8 device list and a bounded input."""
    monkeypatch.setenv("FASTPLONG_BENCH_PROFILES", "plain,scaling")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)
    seen = {}

    def spy_run(cmd, env=None, cwd=None, capture_output=True, timeout=None):
        prof = env["FASTPLONG_BENCH_PROFILES"]
        if prof == "scaling":
            seen["platforms"] = env.get("JAX_PLATFORMS")
            seen["devices"] = env.get("FASTPLONG_BENCH_DEVICES")
            seen["xla"] = env.get("XLA_FLAGS", "")
            part = {"scaling": {"1": {"bases_per_second": 1.0,
                                      "efficiency": 1.0}}}
        else:
            part = {"warm_run_bases_per_second": 2.0}
        r = types.SimpleNamespace()
        r.returncode = 0
        r.stdout = json.dumps(part).encode() + b"\n"
        r.stderr = b""
        return r

    monkeypatch.setattr(subprocess, "run", spy_run)
    bench.main()
    j = _last_json_line(capsys)
    assert seen["platforms"] == "cpu"
    assert seen["devices"] == "1,2,4,8"
    assert "host_platform_device_count" in seen["xla"]
    assert j["scaling"]["1"]["bases_per_second"] == 1.0


def test_all_children_dead_still_prints_value(bench, monkeypatch, capsys):
    monkeypatch.setenv("FASTPLONG_BENCH_PROFILES", "plain,headline")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)

    def dead_run(cmd, env=None, cwd=None, capture_output=True, timeout=None):
        r = types.SimpleNamespace()
        r.returncode = 1
        r.stdout = b""
        r.stderr = b"boom"
        return r

    monkeypatch.setattr(subprocess, "run", dead_run)
    bench.main()
    j = _last_json_line(capsys)
    assert j["value"] == 0.0
    assert j["error"] == "no_profile_completed"
    assert j["metric"] == "bases_per_second_per_chip"
    assert "boom" in j["plain_error"]
