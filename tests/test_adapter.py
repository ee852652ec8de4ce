import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastplong_tpu.ops.adapter import (
    AdapterSpec, trim_by_sequence_start, trim_by_sequence_end,
    find_middle_adapters, search_global)
from reference_oracle import (
    trim_by_sequence_start as o_start, trim_by_sequence_end as o_end,
    find_middle_adapters as o_middle, search_adapter as o_search)

RNG = np.random.default_rng(99)

ADAPTER = "GCGCATACTTTTCCACGGGGATACTACTG"


def pack(reads, L=320):
    B = len(reads)
    bases = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(reads):
        bases[i, :len(s)] = np.frombuffer(s.encode(), np.uint8)
        lens[i] = len(s)
    return jnp.asarray(bases), jnp.asarray(lens)


def random_reads(n, min_len=5, max_len=280, adapter=ADAPTER, mode="start"):
    reads = []
    for _ in range(n):
        ln = int(RNG.integers(min_len, max_len))
        seq = "".join(RNG.choice(list("ACGT"), size=ln))
        r = RNG.random()
        a = mutate(adapter) if RNG.random() < 0.7 else adapter
        if r < 0.4:
            cut = int(RNG.integers(0, len(a)))
            if mode == "start":
                seq = a[cut:] + seq
            elif mode == "end":
                seq = seq + a[:len(a) - cut]
            else:
                pos = int(RNG.integers(0, max(1, len(seq))))
                seq = seq[:pos] + a + seq[pos:]
        reads.append(seq)
    return reads


def mutate(a):
    out = list(a)
    for _ in range(int(RNG.integers(0, 5))):
        op = RNG.random()
        pos = int(RNG.integers(0, len(out)))
        if op < 0.5:
            out[pos] = str(RNG.choice(list("ACGT")))
        elif op < 0.75 and len(out) > 2:
            del out[pos]
        else:
            out.insert(pos, str(RNG.choice(list("ACGT"))))
    return "".join(out)


@functools.lru_cache(maxsize=None)
def _jit_start(seq, ed_max, ext):
    spec = AdapterSpec(seq, ed_max)
    return jax.jit(functools.partial(trim_by_sequence_start, spec=spec, ext=ext))


@functools.lru_cache(maxsize=None)
def _jit_end(seq, ed_max, ext):
    spec = AdapterSpec(seq, ed_max)
    return jax.jit(functools.partial(trim_by_sequence_end, spec=spec, ext=ext))


@functools.lru_cache(maxsize=None)
def _jit_global(seq, ed_max):
    spec = AdapterSpec(seq, ed_max)
    return jax.jit(functools.partial(search_global, spec=spec))


@functools.lru_cache(maxsize=None)
def _jit_middle(s_seq, e_seq, ed_max, ext):
    s_spec = AdapterSpec(s_seq, ed_max)
    e_spec = AdapterSpec(e_seq, ed_max)
    return jax.jit(functools.partial(
        find_middle_adapters, start_spec=s_spec, end_spec=e_spec, ext=ext))


def check_start(reads, adapter, ed_max=0.25, ext=10, lo0=0):
    bases, lens = pack([("X" * lo0) + r for r in reads])
    lo = jnp.full(len(reads), lo0, jnp.int32)
    new_lo, ret, rec = (np.asarray(x) for x in
                        _jit_start(adapter, ed_max, ext)(bases, lo, lens))
    for i, s in enumerate(reads):
        t, off, recorded = o_start(s, adapter, ed_max, ext)
        assert new_lo[i] - lo0 == off, (
            f"read {i}: lo {new_lo[i]-lo0} != {off}; seq={s}")
        assert ret[i] == t, f"read {i}: ret {ret[i]} != {t}; seq={s}"
        exp_rec = 0 if recorded is None else len(recorded)
        assert rec[i] == exp_rec, f"read {i}: rec {rec[i]} != {exp_rec}; seq={s}"


def check_end(reads, adapter, ed_max=0.25, ext=10, lo0=0):
    bases, lens = pack([("X" * lo0) + r for r in reads])
    lo = jnp.full(len(reads), lo0, jnp.int32)
    new_hi, ret, rec = (np.asarray(x) for x in
                        _jit_end(adapter, ed_max, ext)(bases, lo, lens))
    for i, s in enumerate(reads):
        t, new_len, recorded = o_end(s, adapter, ed_max, ext)
        assert new_hi[i] - lo0 == new_len, (
            f"read {i}: len {new_hi[i]-lo0} != {new_len}; seq={s}")
        assert ret[i] == t, f"read {i}: ret {ret[i]} != {t}; seq={s}"
        exp_rec = 0 if recorded is None else len(recorded)
        assert rec[i] == exp_rec, f"read {i}: rec {rec[i]} != {exp_rec}; seq={s}"


def test_reference_vectors():
    # reference test/adaptertrimmer_test.cpp:4-33
    r1 = ("AGGTGCTGCGCATACTTTTCCACGGGGATACTACTGGGTGTTACCGTGGGAATGAATCC"
          "TTTTAACCTTAGCAATACGTAAAGGTGCT")
    bases, lens = pack([r1])
    new_lo, ret, rec = _jit_start(ADAPTER, 0.3, 0)(
        bases, jnp.zeros(1, jnp.int32), lens)
    assert r1[int(new_lo[0]):] == ("GGTGTTACCGTGGGAATGAATCCTTTTAACCTTAGCAAT"
                                   "ACGTAAAGGTGCT")

    r2 = "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAAGCGCATACTTTTCCACGGGGA"
    bases, lens = pack([r2])
    new_hi, ret, rec = _jit_end(ADAPTER, 0.3, 0)(
        bases, jnp.zeros(1, jnp.int32), lens)
    assert r2[:int(new_hi[0])] == "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAA"


def test_search_policies_vs_oracle():
    read = ("TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAATTTTCCCCGGGGAAATTT"
            "CCCGGGAAATTTCCCGGGATCGATCGATCGATCGAATTCC")
    for adapter in ["TTTT", "AACC", "ATCGATCG"]:
        bases, lens = pack([read])
        pos = int(_jit_global(adapter, 0.3)(
            bases, jnp.zeros(1, jnp.int32), lens)[0])
        exp = o_search(read, adapter, 0.3)
        assert pos == exp, f"{adapter}: {pos} != {exp}"


def test_start_random():
    reads = random_reads(100, mode="start")
    check_start(reads, ADAPTER)


def test_start_random_offsets():
    reads = random_reads(60, mode="start")
    check_start(reads, ADAPTER, lo0=13)


def test_start_short_adapter():
    reads = random_reads(80, adapter="ACGTACGTTG", mode="start")
    check_start(reads, "ACGTACGTTG", ed_max=0.3, ext=3)


def test_start_long_adapter():
    adapter = "".join(np.random.default_rng(1).choice(list("ACGT"), size=60))
    reads = random_reads(60, adapter=adapter, mode="start")
    check_start(reads, adapter)


def test_end_random():
    reads = random_reads(100, mode="end")
    check_end(reads, ADAPTER)


def test_end_random_offsets():
    reads = random_reads(60, mode="end")
    check_end(reads, ADAPTER, lo0=7)


def test_end_short_reads():
    reads = random_reads(60, min_len=1, max_len=40, mode="end")
    check_end(reads, ADAPTER)
    check_start(reads, ADAPTER)


def test_middle_random():
    start_a = ADAPTER
    end_a = "TTGGACCACGTCGTAGCAATCCGT"
    reads = random_reads(60, mode="middle") + random_reads(
        30, adapter=end_a, mode="middle")
    bases, lens = pack(reads)
    found, start, length = (np.asarray(x) for x in _jit_middle(
        start_a, end_a, 0.25, 10)(
        bases, jnp.zeros(len(reads), jnp.int32), lens))
    for i, s in enumerate(reads):
        exp = o_middle(s, start_a, end_a, 0.25, 10)
        if exp is None:
            assert not found[i], f"read {i}: found {start[i]},{length[i]}; seq={s}"
        else:
            assert found[i], f"read {i}: not found, expected {exp}; seq={s}"
            assert (start[i], length[i]) == exp, (
                f"read {i}: ({start[i]},{length[i]}) != {exp}; seq={s}")


def test_myers_blockscan_matches_unrolled_and_host_dp():
    """The >MAX_DEVICE_PATTERN kernel (block-scan Myers) == the unrolled
    kernel == the host DP oracle, across the 640bp policy boundary."""
    from fastplong_tpu.ops.myers import (
        build_pattern_masks, build_pattern_table, myers_distance_unrolled,
        myers_distance_blockscan, edit_distance_host, MAX_DEVICE_PATTERN)
    rng = np.random.default_rng(640)
    for plen_max in (33, 257, MAX_DEVICE_PATTERN, MAX_DEVICE_PATTERN + 64):
        pat = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                               size=plen_max))
        masks, K = build_pattern_masks(pat)
        tbl = build_pattern_table(pat)
        B, T = 6, plen_max + 20
        texts = np.zeros((B, T), np.uint8)
        tlens = np.zeros(B, np.int32)
        plens = np.zeros(B, np.int32)
        for i in range(B):
            # mutated copies of random pattern prefixes, plus pure noise
            pl = int(rng.integers(1, plen_max + 1))
            plens[i] = pl
            if i % 2 == 0:
                t = bytearray(pat[:pl])
                for _ in range(int(rng.integers(0, pl // 4 + 1))):
                    t[int(rng.integers(0, len(t)))] = rng.choice(
                        np.frombuffer(b"ACGT", np.uint8))
            else:
                t = bytearray(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                         size=int(rng.integers(1, T))))
            tlens[i] = len(t)
            texts[i, :len(t)] = np.frombuffer(bytes(t), np.uint8)
        un = np.asarray(myers_distance_unrolled(
            masks, K, jnp.asarray(plens), jnp.asarray(texts),
            jnp.asarray(tlens)))
        bs = np.asarray(myers_distance_blockscan(
            tbl, jnp.asarray(plens), jnp.asarray(texts), jnp.asarray(tlens)))
        assert np.array_equal(un, bs), (plen_max, un, bs)
        for i in range(B):
            want = edit_distance_host(pat[:plens[i]],
                                      bytes(texts[i, :tlens[i]]))
            assert un[i] == want, (plen_max, i, un[i], want)
