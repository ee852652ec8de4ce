import numpy as np
import pytest

import jax.numpy as jnp

from fastplong_tpu.ops.qualcut import trim_and_cut
from reference_oracle import trim_and_cut as oracle_trim_and_cut

RNG = np.random.default_rng(42)


def random_read(min_len=1, max_len=120):
    n = int(RNG.integers(min_len, max_len + 1))
    seq = "".join(RNG.choice(list("ACGTN"), size=n, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
    qual = "".join(chr(int(q)) for q in RNG.integers(33, 33 + 42, size=n))
    return seq, qual


def pack(reads, L=160):
    B = len(reads)
    bases = np.zeros((B, L), np.uint8)
    quals = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, (s, q) in enumerate(reads):
        bases[i, :len(s)] = np.frombuffer(s.encode(), np.uint8)
        quals[i, :len(q)] = np.frombuffer(q.encode(), np.uint8)
        lens[i] = len(s)
    return jnp.asarray(bases), jnp.asarray(quals), jnp.asarray(lens)


import functools
import jax


@functools.lru_cache(maxsize=None)
def _jitted(front, tail, **opt):
    return jax.jit(functools.partial(trim_and_cut, front=front, tail=tail, **opt))


def run_case(reads, front, tail, opt):
    bases, quals, lens = pack(reads)
    lo, hi, null = _jitted(front, tail, **opt)(bases, quals, lens)
    lo, hi, null = np.asarray(lo), np.asarray(hi), np.asarray(null)
    for i, (s, q) in enumerate(reads):
        expected = oracle_trim_and_cut(s, q, front, tail, opt)
        got = None if null[i] else (s[lo[i]:hi[i]], q[lo[i]:hi[i]], int(lo[i]))
        if expected is None:
            assert null[i], f"read {i}: expected NULL, got {got} seq={s} qual={q}"
        else:
            assert not null[i], f"read {i}: expected {expected}, got NULL seq={s} qual={q}"
            assert got == expected, f"read {i}: {got} != {expected} seq={s} qual={q}"


def test_reference_vector():
    # reference test/filter_test.cpp:5-22
    seq = "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTT"
    qual = "/////CCCCCCCCCCCC////CCCCCCCCCCCCCC////E"
    opt = dict(enabled_front=True, enabled_tail=True,
               window_front=4, quality_front=20,
               window_tail=4, quality_tail=20)
    bases, quals, lens = pack([(seq, qual)])
    lo, hi, null = trim_and_cut(bases, quals, lens, 0, 1, **opt)
    assert not bool(null[0])
    s = seq[int(lo[0]):int(hi[0])]
    q = qual[int(lo[0]):int(hi[0])]
    assert s == "CCCCCCCCCCCCCCCCCCCCCCCCCCCC"
    assert q == "CCCCCCCCCCC////CCCCCCCCCCCCC"


@pytest.mark.parametrize("ef,et", [(False, False), (True, False),
                                   (False, True), (True, True)])
@pytest.mark.parametrize("front,tail", [(0, 0), (3, 0), (0, 2), (5, 4)])
def test_random_vs_oracle(ef, et, front, tail):
    opt = dict(enabled_front=ef, enabled_tail=et,
               window_front=4, quality_front=20,
               window_tail=5, quality_tail=18)
    reads = [random_read() for _ in range(64)]
    run_case(reads, front, tail, opt)


def test_window_sizes():
    for wf, wt in [(1, 1), (2, 7), (10, 3)]:
        opt = dict(enabled_front=True, enabled_tail=True,
                   window_front=wf, quality_front=15,
                   window_tail=wt, quality_tail=25)
        reads = [random_read() for _ in range(48)]
        run_case(reads, 0, 0, opt)


def test_tiny_reads():
    opt = dict(enabled_front=True, enabled_tail=True,
               window_front=4, quality_front=20,
               window_tail=4, quality_tail=20)
    reads = [random_read(1, 12) for _ in range(64)]
    run_case(reads, 0, 0, opt)
    run_case(reads, 2, 3, opt)


def test_all_n_reads():
    opt = dict(enabled_front=True, enabled_tail=True,
               window_front=4, quality_front=20,
               window_tail=4, quality_tail=20)
    reads = [("N" * 30, "I" * 30), ("N" * 30, "!" * 30),
             ("ACGT" + "N" * 26, "I" * 30), ("N" * 26 + "ACGT", "I" * 30)]
    run_case(reads, 0, 0, opt)
