"""Golden byte-parity tests for --break, --mask, and middle-adapter
splitting (config 5 core semantics)."""

import numpy as np
import pytest

from golden_util import write_random_fastq, assert_parity

START = "AATGTACTTCGTTCAGTTACGTATTGCT"
END = "AGCAATACGTAACTGAACGAAGT"


def write_blocky_fastq(path, n_reads=300, seed=9, middle_adapter=False):
    """Reads with alternating high/low quality blocks (provokes regions)
    and optional middle adapters (provokes splitting)."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n_reads):
            n = int(rng.integers(80, 700))
            seq = "".join(rng.choice(list("ACGT"), size=n))
            if middle_adapter and rng.random() < 0.4:
                pos = int(rng.integers(0, len(seq)))
                ad = START if rng.random() < 0.5 else END
                seq = seq[:pos] + ad + seq[pos:]
            qual = []
            while len(qual) < len(seq):
                lo, hi = ((33 + 2, 33 + 11) if rng.random() < 0.4
                          else (33 + 25, 33 + 41))
                qual.extend(chr(int(q)) for q in
                            rng.integers(lo, hi, size=int(rng.integers(10, 80))))
            qual = "".join(qual[:len(seq)])
            f.write("@r%d\n%s\n+\n%s\n" % (i, seq, qual))
    return path


@pytest.fixture(scope="module")
def fq(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_bm")
    return write_blocky_fastq(str(d / "in.fq"))


@pytest.fixture(scope="module")
def fq_mid(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_bm2")
    return write_blocky_fastq(str(d / "in.fq"), middle_adapter=True)


def test_break(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-A", "-b"])


def test_break_custom(fq, tmp_path):
    assert_parity(fq, str(tmp_path),
                  ["-A", "-b", "--break_window_size", "30",
                   "--break_mean_quality", "18"])


def test_mask(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-A", "-N"])


def test_mask_custom(fq, tmp_path):
    assert_parity(fq, str(tmp_path),
                  ["-A", "-N", "--mask_window_size", "20",
                   "--mask_mean_quality", "20"])


def test_break_and_mask(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-A", "-b", "-N"])


def test_middle_adapter_split(fq_mid, tmp_path):
    assert_parity(fq_mid, str(tmp_path), ["-s", START, "-e", END])


def test_middle_split_break_mask(fq_mid, tmp_path):
    assert_parity(fq_mid, str(tmp_path),
                  ["-s", START, "-e", END, "-b", "-N", "-5", "-3", "-x"])
