import numpy as np
import jax.numpy as jnp

from fastplong_tpu.ops.regions import detect_regions
from reference_oracle import detect_low_quality_regions

RNG = np.random.default_rng(17)


def pack_quals(quals_list, L=640):
    B = len(quals_list)
    quals = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, q in enumerate(quals_list):
        quals[i, :len(q)] = np.frombuffer(q.encode(), np.uint8)
        lens[i] = len(q)
    return jnp.asarray(quals), jnp.asarray(lens)


def check(quals_list, w, q, lo0=0):
    quals, lens = pack_quals([("~" * lo0) + s for s in quals_list])
    lo = jnp.full(len(quals_list), lo0, jnp.int32)
    hi = lens
    res = detect_regions(quals, lens, lo, hi, w, q)
    ws1 = np.asarray(res["ws1"])
    last_end = np.asarray(res["last_end"])
    count = np.asarray(res["count"])
    for i, s in enumerate(quals_list):
        regions = detect_low_quality_regions(s, w, q)
        if not regions:
            assert count[i] == 0 and ws1[i] == -1, (
                f"read {i}: expected none, got ws1={ws1[i]} count={count[i]}")
        else:
            # verify contiguity assumption + summary
            for (a1, b1), (a2, b2) in zip(regions, regions[1:]):
                assert a2 == b1 + 1, f"read {i}: non-adjacent regions {regions}"
            assert ws1[i] == regions[0][0], (
                f"read {i}: ws1 {ws1[i]} != {regions[0][0]} ({regions})")
            assert last_end[i] == regions[-1][1], (
                f"read {i}: last_end {last_end[i]} != {regions[-1][1]} ({regions})")
            assert count[i] == len(regions), (
                f"read {i}: count {count[i]} != {len(regions)} ({regions})")


def random_qual(n, lo=33, hi=75):
    return "".join(chr(int(q)) for q in RNG.integers(lo, hi, size=n))


def blocky_qual(n):
    """Alternating high/low quality blocks - provokes multiple regions."""
    out = []
    while len(out) < n:
        level = (33 + 2, 33 + 12) if RNG.random() < 0.5 else (33 + 30, 33 + 41)
        blk = int(RNG.integers(5, 60))
        out.extend(chr(int(q)) for q in RNG.integers(*level, size=blk))
    return "".join(out[:n])


def test_random():
    quals = [random_qual(int(RNG.integers(0, 280))) for _ in range(64)]
    check(quals, 20, 15)
    check(quals, 7, 20)
    check(quals, 1, 10)


def test_blocky_multi_region():
    quals = [blocky_qual(int(RNG.integers(50, 280))) for _ in range(64)]
    check(quals, 20, 15)
    check(quals, 10, 25)
    check(quals, 50, 10)


def test_high_quality_many_regions():
    # high-quality data where S(e+1) - S(start) >= T can trigger repeatedly
    quals = []
    for _ in range(32)  :
        parts = []
        for _ in range(10):
            parts.append("~" * int(RNG.integers(10, 30)))   # very high qual
            parts.append("#" * int(RNG.integers(10, 30)))   # very low
        quals.append("".join(parts))
    check(quals, 10, 10)
    check(quals, 5, 5)


def test_with_offset():
    quals = [blocky_qual(200) for _ in range(16)]
    check(quals, 20, 15, lo0=11)
