import functools

import numpy as np
import jax
import jax.numpy as jnp

from fastplong_tpu.ops.filters import pass_filter
from fastplong_tpu.ops.polyx import trim_polyx
from reference_oracle import pass_filter as oracle_pass_filter
from reference_oracle import trim_polyx as oracle_trim_polyx

RNG = np.random.default_rng(7)


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


def random_read(min_len=0, max_len=100, n_prob=0.06):
    n = int(RNG.integers(min_len, max_len + 1))
    p = (1 - n_prob) / 4
    seq = "".join(RNG.choice(list("ACGTN"), size=n, p=[p, p, p, p, n_prob]))
    qual = "".join(chr(int(q)) for q in RNG.integers(33, 33 + 42, size=n))
    return seq, qual


@functools.lru_cache(maxsize=None)
def _jit_filter(**opt):
    return jax.jit(functools.partial(pass_filter, **opt))


def check_filters(reads, opt, spans=None):
    bases, quals, lens = pack(reads)
    if spans is None:
        lo = jnp.zeros(len(reads), jnp.int32)
        hi = lens
    else:
        lo = jnp.asarray([s[0] for s in spans], jnp.int32)
        hi = jnp.asarray([s[1] for s in spans], jnp.int32)
    codes = np.asarray(_jit_filter(**opt)(bases, quals, lo, hi, lens))
    for i, (s, q) in enumerate(reads):
        a, b = (0, len(s)) if spans is None else spans[i]
        exp = oracle_pass_filter(s[a:b], q[a:b], opt)
        assert codes[i] == exp, (
            f"read {i}: got {codes[i]}, expected {exp}; seq={s[a:b]} qual={q[a:b]}")


BASE_OPT = dict(
    qual_enabled=True, qualified_qual=ord("0"), unqualified_percent_limit=40,
    n_base_limit=1000000, n_base_percent_limit=10, avg_qual_req=0,
    length_enabled=True, required_length=20, max_length=0,
    complexity_enabled=False, complexity_threshold_pct=30)


def test_filters_defaults():
    reads = [random_read() for _ in range(128)]
    check_filters(reads, BASE_OPT)


def test_filters_all_features():
    opt = dict(BASE_OPT, avg_qual_req=15, n_base_limit=3, max_length=80,
               complexity_enabled=True)
    reads = [random_read() for _ in range(128)]
    check_filters(reads, opt)


def test_filters_low_complexity():
    opt = dict(BASE_OPT, complexity_enabled=True)
    reads = [("A" * 50, "I" * 50), ("AC" * 25, "I" * 50),
             ("AAAACAAAAC" * 5, "I" * 50), ("", ""), ("A", "I")]
    check_filters(reads, opt)


def test_filters_on_spans():
    opt = dict(BASE_OPT, complexity_enabled=True, avg_qual_req=12)
    reads = [random_read(10, 100) for _ in range(64)]
    spans = []
    for s, _ in reads:
        a = int(RNG.integers(0, max(1, len(s) // 2)))
        b = int(RNG.integers(a, len(s) + 1))
        spans.append((a, b))
    check_filters(reads, opt, spans)


def test_filters_disabled():
    opt = dict(BASE_OPT, qual_enabled=False, length_enabled=False)
    reads = [random_read() for _ in range(32)]
    check_filters(reads, opt)


# ---------------------------------------------------------------- polyX


@functools.lru_cache(maxsize=None)
def _jit_polyx(compare_req):
    return jax.jit(functools.partial(trim_polyx, compare_req=compare_req))


def check_polyx(reads, compare_req=10, spans=None):
    bases, quals, lens = pack(reads)
    if spans is None:
        lo = jnp.zeros(len(reads), jnp.int32)
        hi = lens
    else:
        lo = jnp.asarray([s[0] for s in spans], jnp.int32)
        hi = jnp.asarray([s[1] for s in spans], jnp.int32)
    new_hi, poly, trimmed = (np.asarray(x) for x in
                             _jit_polyx(compare_req)(bases, lo, hi))
    for i, (s, q) in enumerate(reads):
        a, b = (0, len(s)) if spans is None else spans[i]
        new_len, exp_poly, exp_trim = oracle_trim_polyx(s[a:b], compare_req)
        assert new_hi[i] - a == new_len, (
            f"read {i}: len {new_hi[i]-a} != {new_len} seq={s[a:b]}")
        exp_poly_idx = -1 if exp_poly is None else exp_poly
        assert poly[i] == exp_poly_idx, f"read {i}: poly {poly[i]} != {exp_poly_idx} seq={s[a:b]}"
        assert trimmed[i] == exp_trim, f"read {i}: trim {trimmed[i]} != {exp_trim} seq={s[a:b]}"


def test_polyx_reference_vector():
    # reference test/polyx_test.cpp:4-17
    seq = "ATTTTAAAAAAAAAATAAAAAAAAAAAAACAAAAAAAAAAAAAAAAAAAAAAAAAT"
    bases, quals, lens = pack([(seq, "I" * len(seq))])
    new_hi, poly, trimmed = trim_polyx(
        bases, jnp.zeros(1, jnp.int32), lens, compare_req=10)
    assert seq[:int(new_hi[0])] == "ATTTT"
    assert int(trimmed[0]) == 51
    assert int(poly[0]) == 0  # A


def test_polyx_random():
    reads = []
    for _ in range(96):
        s, q = random_read(1, 60)
        tail_base = RNG.choice(list("ACGTN"))
        tail_len = int(RNG.integers(0, 30))
        s = s + "".join(RNG.choice([tail_base, "A", "C"], p=[0.9, 0.05, 0.05])
                        for _ in range(tail_len))
        reads.append((s, "I" * len(s)))
    check_polyx(reads)


def test_polyx_pure_tails():
    reads = [("ACGTACGTAC" + "G" * 20, "I" * 30),
             ("G" * 30, "I" * 30),
             ("N" * 30, "I" * 30),
             ("ACGT", "IIII"),
             ("ACGTACGTACGTN" + "T" * 9, "I" * 22)]
    check_polyx(reads)
    check_polyx(reads, compare_req=5)
    check_polyx(reads, compare_req=25)


def test_polyx_on_spans():
    reads = [random_read(10, 80) for _ in range(48)]
    spans = []
    for s, _ in reads:
        a = int(RNG.integers(0, max(1, len(s) // 3)))
        b = int(RNG.integers(a, len(s) + 1))
        spans.append((a, b))
    check_polyx(reads, spans=spans)


def test_kmer_device_histogram_matches_numpy():
    """Device rolling-key scatter-add (ops/kmer.py) == the numpy oracle in
    evaluator._kmer_histogram, both sides, including invalid bases."""
    import os
    import numpy as np
    from fastplong_tpu.config import Options
    from fastplong_tpu.evaluator import Evaluator
    rng = np.random.default_rng(12)
    seqs = []
    for _ in range(80):
        n = int(rng.integers(5, 400))
        s = bytes(rng.choice(np.frombuffer(b"ACGTNA", np.uint8), size=n))
        seqs.append(s)
    lens = np.array([len(s) for s in seqs], np.int64)
    ev = Evaluator(Options())
    for end_side in (False, True):
        os.environ["FASTPLONG_KMER_DEVICE"] = "1"
        c1, p1, t1 = ev._kmer_histogram(seqs, lens, 1, end_side)
        os.environ["FASTPLONG_KMER_DEVICE"] = "0"
        c0, p0, t0 = ev._kmer_histogram(seqs, lens, 1, end_side)
        os.environ.pop("FASTPLONG_KMER_DEVICE")
        assert t1 == t0
        assert np.array_equal(np.asarray(c1, np.int64),
                              np.asarray(c0, np.int64))
        assert np.array_equal(np.asarray(p1, np.uint64),
                              np.asarray(p0, np.uint64))
