"""Golden byte-parity tests vs the real reference binary (configs 1-2)."""

import pytest

from golden_util import write_random_fastq, assert_parity


@pytest.fixture(scope="module")
def fq(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    return write_random_fastq(str(d / "in.fq"), n_reads=400, min_len=10,
                              max_len=350, seed=11)


def test_filters_only(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-A"])


def test_filters_all(fq, tmp_path):
    assert_parity(fq, str(tmp_path),
                  ["-A", "-y", "-m", "12", "--n_base_limit", "5",
                   "--length_limit", "300", "-l", "30", "-q", "18", "-u", "30"])


def test_global_trim(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-A", "-f", "7", "-t", "4"])


def test_cut_front_tail(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-A", "-5", "-3"])


def test_cut_custom_windows(fq, tmp_path):
    assert_parity(fq, str(tmp_path),
                  ["-A", "-5", "-3", "--cut_front_window_size", "3",
                   "--cut_front_mean_quality", "25",
                   "--cut_tail_window_size", "7",
                   "--cut_tail_mean_quality", "12", "-f", "2", "-t", "1"])


def test_polyx(tmp_path):
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=300,
                            min_len=30, max_len=300, seed=5, polya_prob=0.5)
    assert_parity(fq, str(tmp_path), ["-A", "-x"])
    assert_parity(fq, str(tmp_path), ["-A", "-x", "--poly_x_min_len", "6"])


def test_disable_filters(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-A", "-Q", "-L"])
