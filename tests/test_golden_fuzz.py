"""Randomized CONFIGURATION golden fuzz: sample random flag combinations
(within the reference's validated ranges, src/options.cpp:68-207) plus
random inputs, and require byte parity of out.fq / failed.fq / JSON
against the real reference binary.

test_golden_stress.py pins one everything-on config across seeds; this
module walks the config space itself — interactions between stages
(e.g. cut_tail feeding polyX feeding adapter verify, break + length
filters, disabled-stage combinations) are where parity bugs hide.
"""

import numpy as np
import pytest

from golden_util import assert_parity

START = "AATGTACTTCGTTCAGTTACGTATTGCT"
END = "AGCAATACGTAACTGAACGAAGT"


def write_fuzz_fastq(path, rng, n_reads=220):
    with open(path, "w") as f:
        for i in range(n_reads):
            n = int(rng.integers(5, 1200))
            p_n = rng.uniform(0, 0.08)
            pp = (1 - p_n) / 4
            seq = "".join(rng.choice(list("ACGTN"), size=n,
                                     p=[pp, pp, pp, pp, p_n]))
            if rng.random() < 0.5:
                cut = int(rng.integers(0, len(START)))
                seq = START[cut:] + seq
            if rng.random() < 0.25:
                pos = int(rng.integers(0, len(seq) + 1))
                mid = START if rng.random() < 0.5 else END
                seq = seq[:pos] + mid + seq[pos:]
            if rng.random() < 0.4:
                base = rng.choice(list("ACGT"))
                seq = seq + base * int(rng.integers(3, 35))
            if rng.random() < 0.5:
                cut = int(rng.integers(0, len(END)))
                seq = seq + END[:len(END) - cut]
            # quality: mixed-quality runs, occasionally very high (Q42+,
            # exercising the wide-layout fallback) or very low
            qual = []
            while len(qual) < len(seq):
                r = rng.random()
                if r < 0.30:
                    lo, hi = 33 + 1, 33 + 12
                elif r < 0.95:
                    lo, hi = 33 + 14, 33 + 41
                else:
                    lo, hi = 33 + 42, 33 + 60
                qual.extend(chr(int(q)) for q in
                            rng.integers(lo, hi,
                                         size=int(rng.integers(4, 70))))
            f.write("@f%d d e s c\n%s\n+\n%s\n"
                    % (i, seq, "".join(qual[:len(seq)])))
    return path


def sample_config(rng, tmp_path):
    """One random legal flag combination (reference validation ranges)."""
    args = []
    # adapter mode: explicit both / start only / end only / disabled /
    # FASTA / auto-detect
    mode = rng.choice(["both", "start", "end", "off", "fasta", "auto"],
                      p=[0.35, 0.1, 0.1, 0.1, 0.2, 0.15])
    if mode == "both":
        args += ["-s", START, "-e", END]
    elif mode == "start":
        args += ["-s", START, "-e", ""]
    elif mode == "end":
        args += ["-s", "", "-e", END]
    elif mode == "off":
        args += ["-A"]
    elif mode == "fasta":
        fa = tmp_path / "fuzz_adapters.fa"
        fa.write_text(">k1\n%s\n>k2\n%s\n>k3\nTTGGACCACGTCGTAGC\n"
                      % (START, END))
        args += ["-a", str(fa), "-s", "", "-e", ""]
    # mode == "auto": leave -s/-e at their "auto" defaults (evaluator path)
    if mode != "off":
        if rng.random() < 0.6:
            args += ["-d", "%.2f" % rng.uniform(0.05, 0.5)]
        if rng.random() < 0.6:
            args += ["--trimming_extension", str(int(rng.integers(0, 31)))]
    if rng.random() < 0.4:
        args += ["-f", str(int(rng.integers(1, 6)))]
    if rng.random() < 0.4:
        args += ["-t", str(int(rng.integers(1, 6)))]
    if rng.random() < 0.5:
        args += ["-x"]
        if rng.random() < 0.5:
            args += ["--poly_x_min_len", str(int(rng.integers(5, 31)))]
    if rng.random() < 0.6:
        if rng.random() < 0.7:
            args += ["-5"]
        if rng.random() < 0.7:
            args += ["-3"]
        if rng.random() < 0.6:
            args += ["-W", str(int(rng.integers(1, 41)))]
        if rng.random() < 0.6:
            args += ["-M", str(int(rng.integers(1, 31)))]
    if rng.random() < 0.35:
        args += ["-N", "--mask_window_size", str(int(rng.integers(5, 120))),
                 "--mask_mean_quality", str(int(rng.integers(5, 31)))]
    if rng.random() < 0.35:
        args += ["-b", "--break_window_size", str(int(rng.integers(5, 250))),
                 "--break_mean_quality", str(int(rng.integers(5, 31)))]
    if rng.random() < 0.15:
        args += ["-Q"]
    else:
        if rng.random() < 0.5:
            args += ["-q", str(int(rng.integers(1, 36)))]
        if rng.random() < 0.5:
            args += ["-u", str(int(rng.integers(0, 101)))]
        if rng.random() < 0.4:
            args += ["--n_base_limit", str(int(rng.integers(0, 60)))]
        if rng.random() < 0.4:
            args += ["-n", str(int(rng.integers(0, 101)))]
        if rng.random() < 0.4:
            args += ["-m", str(int(rng.integers(1, 31)))]
    if rng.random() < 0.15:
        args += ["-L"]
    else:
        if rng.random() < 0.6:
            args += ["-l", str(int(rng.integers(1, 120)))]
        if rng.random() < 0.3:
            args += ["--length_limit", str(int(rng.integers(200, 1300)))]
    if rng.random() < 0.4:
        args += ["-y"]
        if rng.random() < 0.5:
            args += ["-Y", str(int(rng.integers(5, 91)))]
    if rng.random() < 0.2:
        args += ["--reads_to_process", str(int(rng.integers(10, 200)))]
    return args


def _run_case(tmp_path, seed):
    rng = np.random.default_rng(seed)
    args = sample_config(rng, tmp_path)
    fq = write_fuzz_fastq(str(tmp_path / "in.fq"), rng)
    assert_parity(fq, str(tmp_path), args)


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
def test_config_fuzz(tmp_path, seed):
    _run_case(tmp_path, seed)


@pytest.mark.slow
@pytest.mark.parametrize("seed", list(range(100, 116)))
def test_config_fuzz_slow(tmp_path, seed):
    _run_case(tmp_path, seed)
