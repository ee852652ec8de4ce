"""Golden byte-parity for the monster-read path.

Buckets longer than FASTPLONG_STAT_DEVICE_CAP run the stats-free device
step and compute statistics on the host (pipeline/host_stats.py), matching
the reference's dynamically-grown per-cycle buffers (src/stats.cpp:75-119).
Test 1 lowers the cap so ordinary reads exercise the path cheaply (full
feature set, JSON checked — curves/kmer/medians all flow through it);
test 2 is the real thing: a multi-Mbp read through the default cap.
"""

import numpy as np
import pytest

from golden_util import assert_parity

START = "AATGTACTTCGTTCAGTTACGTATTGCT"
END = "AGCAATACGTAACTGAACGAAGT"

FULL = ["-s", START, "-e", END, "-5", "-3", "-x", "-y", "-b", "-N",
        "-f", "2", "-t", "1", "-m", "8", "--n_base_limit", "400000",
        "-l", "25", "--break_window_size", "40",
        "--break_mean_quality", "14", "--mask_window_size", "25",
        "--mask_mean_quality", "12", "-d", "0.3",
        "--trimming_extension", "5"]


def _write_mixed(path, rng, lens):
    bases = np.frombuffer(b"ACGT", np.uint8)
    with open(path, "wb") as f:
        for i, n in enumerate(lens):
            seq = bases[rng.integers(0, 4, n)].tobytes()
            if rng.random() < 0.5:
                seq = START.encode() + seq
            if rng.random() < 0.5:
                seq = seq + b"A" * int(rng.integers(3, 30))
            if rng.random() < 0.5:
                seq = seq + END.encode()
            # mixed quality segments so cut/break/mask all fire
            qual = []
            got = 0
            while got < len(seq):
                k = int(rng.integers(40, 4000))
                lo, hi = ((34, 45) if rng.random() < 0.3 else (48, 74))
                qual.append(rng.integers(lo, hi, k, dtype=np.uint8))
                got += k
            qual = np.concatenate(qual)[:len(seq)].tobytes()
            f.write(b"@m%d some desc\n" % i + seq + b"\n+\n" + qual + b"\n")
    return path


def test_monster_path_low_cap(tmp_path, monkeypatch):
    # cap far below the read lengths => several buckets take the host-stat
    # path while small reads stay on the device path, mixed in one run
    monkeypatch.setenv("FASTPLONG_STAT_DEVICE_CAP", "1024")
    rng = np.random.default_rng(515)
    lens = [int(rng.integers(30, 6000)) for _ in range(120)]
    fq = _write_mixed(str(tmp_path / "in.fq"), rng, lens)
    assert_parity(fq, str(tmp_path), FULL)


@pytest.mark.slow
def test_monster_2mbp_read(tmp_path):
    # the VERDICT bar: a multi-Mbp read passes without OOM, byte parity
    # incl. JSON curves; default 64Kbp device cap routes it to the host
    rng = np.random.default_rng(616)
    lens = [2_000_000] + [int(rng.integers(100, 3000)) for _ in range(25)]
    fq = _write_mixed(str(tmp_path / "in.fq"), rng, lens)
    assert_parity(fq, str(tmp_path), FULL)
