"""Golden byte-parity tests for adapter trimming (config 3)."""

import numpy as np
import pytest

from golden_util import write_random_fastq, assert_parity

START = "AATGTACTTCGTTCAGTTACGTATTGCT"   # Nanopore ligation adapter-ish
END = "AGCAATACGTAACTGAACGAAGT"


@pytest.fixture(scope="module")
def fq(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_ad")
    return write_random_fastq(
        str(d / "in.fq"), n_reads=400, min_len=25, max_len=500, seed=21,
        adapter_start=START, adapter_end=END, adapter_prob=0.6)


def test_adapter_start_end(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-s", START, "-e", END])


def test_adapter_revcomp_default(fq, tmp_path):
    # end adapter defaults to revcomp(start) (main.cpp:138-140)
    assert_parity(fq, str(tmp_path), ["-s", START])


def test_adapter_distance_threshold(fq, tmp_path):
    assert_parity(fq, str(tmp_path),
                  ["-s", START, "-e", END, "-d", "0.4",
                   "--trimming_extension", "0"])


def test_adapter_with_cut_polyx(fq, tmp_path):
    assert_parity(fq, str(tmp_path),
                  ["-s", START, "-e", END, "-5", "-3", "-x"])


def test_adapter_fasta(fq, tmp_path):
    fa = tmp_path / "adapters.fa"
    fa.write_text(">a1\n%s\n>a2\n%s\nGG\n>short\nACGT\n" % (START, END))
    assert_parity(fq, str(tmp_path), ["-s", START, "-e", END,
                                      "-a", str(fa)])


def test_adapter_auto_not_detected(fq, tmp_path):
    # detection fails on random data: sequences stay the literal "auto"
    assert_parity(fq, str(tmp_path), [])
