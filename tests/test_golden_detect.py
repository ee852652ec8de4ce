"""Golden parity for adapter auto-detection (config 4): the evaluator's
k-mer histogram + consensus extension must detect the same adapter string
as the reference, and downstream trimming must match byte-for-byte."""

import numpy as np
import pytest

from golden_util import write_random_fastq, assert_parity, run_reference

START = "AATGTACTTCGTTCAGTTACGTATTGCT"
END = "AGCAATACGTAACTGAACGAAGT"


def write_detectable_fastq(path, n_reads=600, seed=3):
    """Most reads carry the full start adapter at the start and the end
    adapter at the end (few errors), like real library data."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n_reads):
            n = int(rng.integers(150, 900))
            seq = "".join(rng.choice(list("ACGT"), size=n))
            if rng.random() < 0.9:
                seq = START + seq
            if rng.random() < 0.9:
                seq = seq + END
            qual = "".join(chr(int(q))
                           for q in rng.integers(33 + 5, 33 + 40, size=len(seq)))
            f.write("@r%d\n%s\n+\n%s\n" % (i, seq, qual))
    return path


@pytest.fixture(scope="module")
def fq(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_det")
    return write_detectable_fastq(str(d / "in.fq"))


def test_detection_stderr_matches(fq, tmp_path):
    """Reference must actually detect adapters on this input; ours must
    detect the identical strings."""
    import io
    import contextlib
    _, _, _, ref_stderr = run_reference(fq, str(tmp_path), [])
    assert "Detected: " in ref_stderr, ref_stderr
    ref_detected = [l.split("Detected: ")[1].strip()
                    for l in ref_stderr.splitlines() if "Detected: " in l]

    from fastplong_tpu.config import Options
    from fastplong_tpu.evaluator import Evaluator
    opt = Options()
    opt.in_file = fq
    eva = Evaluator(opt)
    eva.evaluate_seq_len_and_check_rna()
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        eva.eval_adapter_and_read_num()
    ours = [opt.adapter.sequence_start, opt.adapter.sequence_end]
    ours = [a for a in ours if a != "auto"]
    assert ours == ref_detected, (ours, ref_detected, err.getvalue())


def test_auto_detection_full_parity(fq, tmp_path):
    assert_parity(fq, str(tmp_path), [])


def test_auto_detection_with_everything(fq, tmp_path):
    assert_parity(fq, str(tmp_path), ["-5", "-3", "-x", "-y"])
