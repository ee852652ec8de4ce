"""--prewarm (TPU-native extension): warms a configuration on synthetic
input and exits cleanly, leaving no files in the cwd."""

import os

import pytest


@pytest.mark.slow
def test_prewarm_runs_and_cleans_up(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("FASTPLONG_DAEMON", raising=False)
    from fastplong_tpu.main import main
    rc = main(["fastplong", "--prewarm", "-s",
               "AATGTACTTCGTTCAGTTACGTATTGCT", "-x"])
    assert rc == 0
    # outputs went to a private temp dir, not the cwd
    assert os.listdir(str(tmp_path)) == []
