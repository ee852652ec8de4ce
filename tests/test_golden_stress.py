"""Randomized full-feature golden stress: every stage enabled at once,
multiple seeds, mixed read lengths and qualities."""

import numpy as np
import pytest

from golden_util import assert_parity

START = "AATGTACTTCGTTCAGTTACGTATTGCT"
END = "AGCAATACGTAACTGAACGAAGT"


def write_stress_fastq(path, seed, n_reads=250):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n_reads):
            n = int(rng.integers(5, 800))
            p_n = rng.uniform(0, 0.1)
            pp = (1 - p_n) / 4
            seq = "".join(rng.choice(list("ACGTN"), size=n,
                                     p=[pp, pp, pp, pp, p_n]))
            if rng.random() < 0.5:
                cut = int(rng.integers(0, len(START)))
                seq = START[cut:] + seq
            if rng.random() < 0.3:
                pos = int(rng.integers(0, len(seq) + 1))
                seq = seq[:pos] + (START if rng.random() < 0.5 else END) + seq[pos:]
            if rng.random() < 0.5:
                seq = seq + "A" * int(rng.integers(3, 30))
            if rng.random() < 0.5:
                cut = int(rng.integers(0, len(END)))
                seq = seq + END[:len(END) - cut]
            qual = []
            while len(qual) < len(seq):
                lo, hi = ((33 + 1, 33 + 12) if rng.random() < 0.35
                          else (33 + 15, 33 + 42))
                qual.extend(chr(int(q)) for q in
                            rng.integers(lo, hi,
                                         size=int(rng.integers(5, 60))))
            f.write("@s%d d e s c\n%s\n+strand comment\n%s\n"
                    % (i, seq, "".join(qual[:len(seq)])))
    return path


FULL = ["-s", START, "-e", END, "-5", "-3", "-x", "-y", "-b", "-N",
        "-f", "2", "-t", "1", "-m", "8", "--n_base_limit", "40",
        "--length_limit", "700", "-l", "25",
        "--break_window_size", "40", "--break_mean_quality", "14",
        "--mask_window_size", "25", "--mask_mean_quality", "12",
        "-d", "0.3", "--trimming_extension", "5"]


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_full_feature_stress(tmp_path, seed):
    fq = write_stress_fastq(str(tmp_path / "in.fq"), seed)
    assert_parity(fq, str(tmp_path), FULL)


def test_full_feature_stress_with_fasta(tmp_path):
    fq = write_stress_fastq(str(tmp_path / "in.fq"), 404)
    fa = tmp_path / "a.fa"
    fa.write_text(">x\nTTGGACCACGTCGTAGC\n>y\nCCGGTTAACCGGTTAA\n")
    assert_parity(fq, str(tmp_path), FULL + ["-a", str(fa)])
