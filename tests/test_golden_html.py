"""Golden byte-parity for the HTML report (modulo timestamps).

Run single-threaded (-w 1): the reference's median-qual/length density plot
lists pairs in per-worker insertion order, which is thread-interleave
dependent for -w > 1.
"""

import pytest

from golden_util import write_random_fastq, assert_parity

START = "AATGTACTTCGTTCAGTTACGTATTGCT"


@pytest.fixture(scope="module")
def fq(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_html")
    return write_random_fastq(str(d / "in.fq"), n_reads=300, min_len=30,
                              max_len=500, seed=44, adapter_start=START,
                              adapter_prob=0.5, polya_prob=0.3)


def test_html_filters(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-A", "-w", "1"], check_html=True)


def test_html_full_features(fq, tmp_path):
    assert_parity(fq, str(tmp_path),
                  ["-s", START, "-5", "-3", "-x", "-y", "-w", "1"],
                  check_html=True)


def test_html_long_reads(tmp_path):
    # cycles > 300 triggers log-axis + position down-sampling
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=150,
                            min_len=200, max_len=2500, seed=45)
    assert_parity(fq, str(tmp_path), ["-A", "-w", "1"], check_html=True)
