"""Packaging: `pip install` must produce a working `fastplong` console
script runnable from any cwd — the parity analog of the reference's
installed binary (reference Makefile:46-47 install target)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def installed(tmp_path_factory):
    prefix = str(tmp_path_factory.mktemp("prefix"))
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-build-isolation", "--quiet", "--prefix", prefix, REPO],
        capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    site = os.path.join(prefix, "lib",
                        "python%d.%d" % sys.version_info[:2],
                        "site-packages")
    script = os.path.join(prefix, "bin", "fastplong")
    assert os.path.exists(script), "console script not installed"
    return script, site


def test_console_script_runs_from_any_cwd(installed, tmp_path):
    script, site = installed
    fq = tmp_path / "in.fq"
    fq.write_bytes(b"@r1\nACGTACGTACGTACGTACGTACGTACGT\n+\n"
                   b"IIIIIIIIIIIIIIIIIIIIIIIIIIII\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = site
    env.pop("FASTPLONG_DAEMON", None)
    r = subprocess.run(
        [script, "-i", str(fq), "-o", str(tmp_path / "out.fq"),
         "-j", str(tmp_path / "r.json"), "-h", str(tmp_path / "r.html"),
         "-A"],
        capture_output=True, timeout=300, env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    out = (tmp_path / "out.fq").read_bytes()
    assert out.startswith(b"@r1\nACGTACGTACGTACGTACGTACGTACGT\n")
    assert (tmp_path / "r.json").exists()


def test_version_flag(installed, tmp_path):
    script, site = installed
    env = dict(os.environ)
    env["PYTHONPATH"] = site
    r = subprocess.run([script, "--version"], capture_output=True,
                       timeout=120, env=env, cwd=str(tmp_path))
    assert r.returncode == 0
    assert b"fastplong 0.4.1" in r.stdout + r.stderr
