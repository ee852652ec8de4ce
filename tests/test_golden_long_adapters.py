"""Golden parity for FASTA adapters far beyond one Myers block (the
reference supports patterns to 640bp via multi-block bit-parallelism,
src/editdistance.cpp:88-126; our device kernel chains uint32 blocks)."""

import numpy as np

from golden_util import assert_parity


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
