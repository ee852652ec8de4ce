"""Golden parity on non-ACGTN sequence content: IUPAC ambiguity codes,
lowercase bases, and other printable bytes.  The reference treats sequence
bytes opaquely (stats bucket by &7, adapter compare by equality,
complexity by inequality), so we must too."""

import numpy as np

from golden_util import assert_parity

START = "AATGTACTTCGTTCAGTTACGTATTGCT"

ALPHABET = list("ACGTNacgtnRYKMSWBDHVryk.-*")


def _write(path, seed, n_reads=200):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n_reads):
            n = int(rng.integers(10, 600))
            # mostly ACGT with a sprinkle of everything else
            w = np.full(len(ALPHABET), 0.01)
            w[:4] = (1 - 0.01 * (len(ALPHABET) - 4)) / 4
            seq = "".join(rng.choice(ALPHABET, size=n, p=w / w.sum()))
            if rng.random() < 0.4:
                seq = START + seq
            if rng.random() < 0.4:
                seq = seq + "A" * int(rng.integers(3, 25))
            qual = "".join(chr(int(q))
                           for q in rng.integers(33, 74, size=len(seq)))
            f.write("@w%d desc\n%s\n+\n%s\n" % (i, seq, qual))
    return path


def test_weird_bytes_full_features(tmp_path):
    fq = _write(str(tmp_path / "in.fq"), 808)
    assert_parity(fq, str(tmp_path),
                  ["-s", START, "-x", "-5", "-3", "-y", "-b", "-N",
                   "--n_base_limit", "200", "-l", "20"])


def test_weird_bytes_host_stats(tmp_path, monkeypatch):
    monkeypatch.setenv("FASTPLONG_STATS", "host")
    fq = _write(str(tmp_path / "in.fq"), 909)
    assert_parity(fq, str(tmp_path),
                  ["-s", START, "-x", "-5", "-3"])
