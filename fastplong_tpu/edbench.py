"""Edit-distance micro-benchmark.

Counterpart of the reference's built-in self-benchmark
(src/editdistance.cpp:141-172): verifies the three reference test vectors
and times batched evaluations.  Run: python -m fastplong_tpu.edbench
"""

import sys
import time

import numpy as np

STR1 = [
    "CCTATCAGGGAGCTGTGGGCCAGCCAGGAGGCAGCACATGCCCAATCCCAGGCCCCTCCCGTTGTAAGT"
    "TCCCGTTCTACCCGACAGGGACCTGCTGACAAAAGACAGGGCTGGAGAGCCAGCCTGAAGGCCCTGGGA"
    "CCCTTCTATCCAC",
    "ACTTATGTTTTTAAATGAGGATTATTGATAGTACTCTTGGTTTTTATACCATTCAGATCACTGAATTTA"
    "TAAAGTACCCATCTAGTACTTCAAAAAGTAAAGTGTTCTGCCAGATCTTAGGTATAGAGGACCCTAACA"
    "CAGTAAGATCGGA",
    "TAGGGGTATGAGTAGAGCTGAGCTGGGGGAAAAGAGGGAAATTCCCAGGGGTGGAGGAAGAGTCAAGTC"
    "CCCCTCTACACCTAGAGGATGAACTTAAGGAAGGAGTGAAGGTCATATGTGTTGTTCCTGAGGAAAAGG"
    "CCGCTGTAGAAAA",
]
STR2 = [
    STR1[0],
    "ACTTATGTTTTTAAATGAGGATTATTGATAGTACTCTTGGTTTTTATACCATTCAGATCACTGAATTTA"
    "TAAAGTACCCATCTAGTACTTGAAAAAGTAAAGTGTTCTGCCAGATCTTAGGTATAGAGGACCCTAACA"
    "CAGTAAGATCGGA",
    "CCTGGGCCTGGCCCTTGTCTAAAACTGACTCTTTTGAGGGTGATTTTGGATGTTCTTAGTAGAGTCTCT"
    "CACCTGTACTTTCCTTGCCTAAGGTGCTGTCTTCTCTTGCAGGTTGCCTACACGTTCCTCACATGCCCT"
    "AAGAACCATGGGA",
]
EXPECTED = [0, 1, 90]


def main():
    import jax
    import jax.numpy as jnp
    from .ops.myers import build_pattern_masks, myers_distance_unrolled

    n_calls = 100000
    for i in range(3):
        a, b = STR1[i], STR2[i]
        masks, K = build_pattern_masks(a.encode())
        B = 8192  # lanes per device call
        text = np.zeros((B, len(b)), np.uint8)
        text[:] = np.frombuffer(b.encode(), np.uint8)[None, :]
        plen = jnp.full(B, len(a), jnp.int32)
        tlen = jnp.full(B, len(b), jnp.int32)
        f = jax.jit(lambda t: myers_distance_unrolled(masks, K, plen, t, tlen))
        d = f(jnp.asarray(text))
        jax.block_until_ready(d)
        t0 = time.time()
        reps = max(1, n_calls // B)
        for _ in range(reps):
            d = f(jnp.asarray(text))
        jax.block_until_ready(d)
        dt = time.time() - t0
        total = reps * B
        print("test %d edit_distance calls, takes %d ms (%.1f M calls/s)"
              % (total, int(dt * 1000), total / dt / 1e6))
        ret = int(np.asarray(d)[0])
        if ret != EXPECTED[i]:
            print("Fail: (edit_distance), expect %d, but got %d:\n%s\n%s"
                  % (EXPECTED[i], ret, STR1[i], STR2[i]))
            return 1
    print("all edit_distance vectors passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
