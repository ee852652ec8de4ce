"""Golden parity for FASTA adapters far beyond one Myers block (the
reference supports patterns to 640bp via multi-block bit-parallelism and
falls back to DP beyond, src/editdistance.cpp:88-126; our device kernel
chains uint32 blocks up to MAX_DEVICE_PATTERN and block-scans beyond)."""

import numpy as np
import pytest

from golden_util import assert_parity


@pytest.mark.slow
def test_long_fasta_adapters(tmp_path):
    rng = np.random.default_rng(5)
    long_a = "".join(rng.choice(list("ACGT"), size=100))
    very_long = "".join(rng.choice(list("ACGT"), size=300))
    fa = tmp_path / "a.fa"
    fa.write_text(">l1\n%s\n>l2\n%s\n" % (long_a, very_long))
    fq = str(tmp_path / "in.fq")
    with open(fq, "w") as f:
        for i in range(80):
            n = int(rng.integers(50, 900))
            seq = "".join(rng.choice(list("ACGT"), size=n))
            if rng.random() < 0.4:
                seq = long_a[int(rng.integers(0, 40)):] + seq
            if rng.random() < 0.3:
                seq = seq + very_long[:int(rng.integers(40, 300))]
            q = "".join(chr(int(x))
                        for x in rng.integers(40, 74, size=len(seq)))
            f.write("@L%d\n%s\n+\n%s\n" % (i, seq, q))
    assert_parity(fq, str(tmp_path), ["-a", str(fa)])


@pytest.mark.slow
@pytest.mark.parametrize("alen", [640, 704])
def test_fasta_adapter_at_device_boundary(tmp_path, alen):
    """The MAX_DEVICE_PATTERN=640 boundary (reference editdistance.cpp
    switches Myers->DP there): byte parity on either side.  Adapters this
    long exceed WINDOW, so only the partial 16-mer path can trim — the
    golden pins that the full-match path stays structurally inert."""
    rng = np.random.default_rng(640 + alen)
    adapter = "".join(rng.choice(list("ACGT"), size=alen))
    fa = tmp_path / "a.fa"
    fa.write_text(">huge\n%s\n" % adapter)
    fq = str(tmp_path / "in.fq")
    with open(fq, "w") as f:
        for i in range(50):
            n = int(rng.integers(100, 1200))
            seq = "".join(rng.choice(list("ACGT"), size=n))
            r = rng.random()
            if r < 0.3:   # adapter tail at read start (start-trim target)
                seq = adapter[int(rng.integers(alen - 190, alen - 20)):] + seq
            elif r < 0.6:  # adapter head at read end (end-trim target)
                seq = seq + adapter[:int(rng.integers(20, 190))]
            q = "".join(chr(int(x))
                        for x in rng.integers(40, 74, size=len(seq)))
            f.write("@B%d\n%s\n+\n%s\n" % (i, seq, q))
    assert_parity(fq, str(tmp_path), ["-a", str(fa)])


@pytest.mark.slow
def test_long_start_adapter_middle_search(tmp_path):
    """A 704bp -s adapter exercises the middle-adapter global search with
    a full-length pattern beyond MAX_DEVICE_PATTERN (the block-scan Myers
    kernel) — the one path that needs full-length edit distance."""
    rng = np.random.default_rng(99)
    adapter = "".join(rng.choice(list("ACGT"), size=704))
    fq = str(tmp_path / "in.fq")
    with open(fq, "w") as f:
        for i in range(30):
            n = int(rng.integers(400, 1500))
            seq = "".join(rng.choice(list("ACGT"), size=n))
            r = rng.random()
            if r < 0.3:  # embed the full adapter mid-read (split target)
                cut = int(rng.integers(100, max(101, n - 100)))
                seq = seq[:cut] + adapter + seq[cut:]
            elif r < 0.5:
                seq = adapter[int(rng.integers(550, 690)):] + seq
            q = "".join(chr(int(x))
                        for x in rng.integers(40, 74, size=len(seq)))
            f.write("@M%d\n%s\n+\n%s\n" % (i, seq, q))
    assert_parity(fq, str(tmp_path), ["-s", adapter])
