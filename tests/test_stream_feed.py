"""Stream feed (device.build_stream / unpack_stream): the on-device
rebuild must reproduce the padded b5 batch BIT FOR BIT — the kernel chain
must not be able to tell the feeds apart — and end-to-end output must be
byte-identical with the feed forced on."""

import numpy as np
import jax.numpy as jnp

from golden_util import run_ours, strip_command, write_random_fastq

from fastplong_tpu.pipeline.device import (build_stream, unpack_stream,
                                           pack_input_b5, stream_quantum)


def _rand_b5(rng, B, L, fills=(0.2, 1.0)):
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L))
    quals = rng.integers(33 + 2, 33 + 41, size=(B, L)).astype(np.uint8)
    lo = max(1, int(L * fills[0]))
    lens = rng.integers(lo, int(L * fills[1]) + 1, size=B).astype(np.int32)
    mask = np.ones(B, bool)
    # a couple of padding rows and a zero-length read
    lens[-1] = 0
    mask[-1] = False
    if B > 3:
        lens[B // 2] = 0  # real read of length 0
    return pack_input_b5(bases, quals, lens, mask)


def test_stream_roundtrip_bitexact():
    rng = np.random.default_rng(5)
    # payloads above the 1MB quantization floor (smaller batches decline)
    for B, L, fills in ((2048, 4096, (0.2, 0.9)), (1, 1 << 20, (0.3, 0.8)),
                        (512, 16384, (0.5, 1.0))):
        packed = _rand_b5(rng, B, L, fills)
        stream = build_stream(packed, L)
        assert stream is not None, (B, L)
        assert stream.nbytes % stream_quantum(B, L) == 0
        assert stream.nbytes < packed.nbytes
        out = np.asarray(unpack_stream(jnp.asarray(stream), L, B))
        assert np.array_equal(out, packed), (B, L)
    # tiny batches must decline (quantization floor)
    assert build_stream(_rand_b5(rng, 16, 256), 256) is None


def test_stream_declines_when_not_smaller():
    rng = np.random.default_rng(7)
    packed = _rand_b5(rng, 8, 512, fills=(0.99, 1.0))
    # near-full rows: quantized stream >= padded size -> decline
    s = build_stream(packed, 512)
    if s is not None:
        assert s.nbytes < packed.nbytes
    # wide layout always declines
    wide = np.zeros((8, 2 * 512 + 8), np.uint8)
    assert build_stream(wide, 512) is None


def test_stream_feed_reference_golden(tmp_path, monkeypatch):
    """Stream feed forced, compared against the REAL reference binary
    (not just the direct-feed A/B)."""
    from golden_util import assert_parity
    monkeypatch.setenv("FASTPLONG_STREAM_FEED", "1")
    monkeypatch.setenv("FASTPLONG_STREAM_QUANTUM", "1024")
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=350,
                            min_len=30, max_len=900, seed=97,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.4, polya_prob=0.3)
    assert_parity(fq, str(tmp_path),
                  ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-x",
                   "--cut_front", "--cut_tail"])


def test_stream_feed_end_to_end_parity(tmp_path, monkeypatch):
    """Force the stream feed on: output must stay byte-identical."""
    monkeypatch.setenv("FASTPLONG_STREAM_FEED", "1")
    # the tests' tiny batches sit under the 1MB quantization floor;
    # lower it so the dispatch path genuinely streams here
    monkeypatch.setenv("FASTPLONG_STREAM_QUANTUM", "1024")
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=300,
                            min_len=30, max_len=900, seed=91,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.4, polya_prob=0.2)
    args = ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-x", "-5", "-3"]
    a = tmp_path / "a"
    a.mkdir()
    out_a, failed_a, json_a = run_ours(fq, str(a), args)
    monkeypatch.setenv("FASTPLONG_STREAM_FEED", "0")
    b = tmp_path / "b"
    b.mkdir()
    out_b, failed_b, json_b = run_ours(fq, str(b), args)

    def rd(p):
        with open(p, "rb") as f:
            return f.read()

    assert rd(out_a) == rd(out_b)
    assert rd(failed_a) == rd(failed_b)
    assert (strip_command(open(json_a).read())
            == strip_command(open(json_b).read()))
