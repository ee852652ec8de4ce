"""Broker path-routing logic (daemon._PathScore): exploration order,
exploitation, hint deferral, staleness."""

import time

from fastplong_tpu.daemon import _PathScore, job_key


KEY = job_key(["fastplong", "-i", "a.fq", "-o", "b.fq", "-s", "ACGT"])


def test_explores_each_path_once_then_exploits():
    s = _PathScore()
    # cold daemon: no worker yet -> resident
    assert s.choose(KEY, False) == "resident"
    s.record(KEY, "resident", 10.0)
    # worker unsampled -> explore it
    assert s.choose(KEY, True) == "worker"
    s.record(KEY, "worker", 30.0)
    # both sampled, resident faster -> exploit resident
    for _ in range(5):
        assert s.choose(KEY, True) == "resident"


def test_worker_wins_when_faster():
    s = _PathScore()
    s.record(KEY, "resident", 20.0)
    s.record(KEY, "worker", 8.0)
    assert s.choose(KEY, True) == "worker"


def test_periodic_resample_of_loser():
    s = _PathScore()
    s.record(KEY, "resident", 5.0)
    s.record(KEY, "worker", 50.0)
    picks = [s.choose(KEY, True) for _ in range(s.RETRY_EVERY * 2)]
    assert "worker" in picks           # the loser gets re-sampled
    assert picks.count("resident") > picks.count("worker")


def test_hinted_jobs_carry_exploration():
    s = _PathScore()
    # the cold first job records its hint even with no worker ready
    assert s.choose(KEY, False, hint="warmup") == "resident"
    s.record(KEY, "resident", 10.0)
    # unhinted job defers exploration to hinted ones
    assert s.choose(KEY, True) == "resident"
    # the next hinted job explores the unsampled worker
    assert s.choose(KEY, True, hint="warmup") == "worker"
    s.record(KEY, "worker", 30.0)
    # hinted jobs re-sample the stalest path; unhinted ones exploit only
    assert s.choose(KEY, True) == "resident"
    assert s.choose(KEY, True, hint="warmup") == "resident"  # stalest
    s.record(KEY, "resident", 9.0)
    assert s.choose(KEY, True, hint="warmup") == "worker"    # now stalest
    # unhinted never re-samples while hints are fresh
    for _ in range(s.RETRY_EVERY * 2):
        assert s.choose(KEY, True) == "resident"


def test_stale_samples_expire():
    s = _PathScore()
    s.record(KEY, "resident", 10.0)
    s.record(KEY, "worker", 5.0)
    # age the worker sample beyond TTL
    t, w = s.walls[(KEY, "worker")]
    s.walls[(KEY, "worker")] = (t - s.TTL - 1, w)
    # worker looks unsampled again -> explored
    assert s.choose(KEY, True) == "worker"


def test_keys_isolate_configs():
    s = _PathScore()
    k2 = job_key(["fastplong", "-i", "a.fq", "-o", "b.fq", "-s", "TTTT"])
    assert KEY != k2
    s.record(KEY, "worker", 1.0)
    s.record(KEY, "resident", 9.0)
    # a different config has no samples: cold-start logic applies
    assert s.choose(k2, False) == "resident"


def test_job_key_blanks_paths():
    a = job_key(["fastplong", "-i", "x.fq", "-o", "y.fq", "-s", "ACGT"])
    b = job_key(["fastplong", "-i", "other.fq", "-o", "z.fq",
                 "-s", "ACGT"])
    assert a == b
    c = job_key(["fastplong", "-i", "x.fq", "-o", "y.fq", "-s", "ACGA"])
    assert a != c
