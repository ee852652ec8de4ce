"""The backend-free numpy host step (pipeline/host_step.py, ops/npshim.py)
must be bit-identical to the jitted stats-free device step: it is the
fetch-watchdog fallback's compute path on hosts with no JAX CPU backend
(the round-3 bench environment), so any divergence breaks the fallback's
byte-parity guarantee."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastplong_tpu.main import build_parser, options_from_args
from fastplong_tpu.pipeline.device import (get_fast_step, out_fields,
                                           pack_input_b5, pack_input)
from fastplong_tpu.pipeline.host_step import host_rows

START = "AATGTACTTCGTTCAGTTACGTATTGCT"
END = "AGCAATACGTAACTGAACGAAGT"


def _opt(extra):
    argv = ["fastplong", "-i", "in.fq", "-o", "out.fq"] + list(extra)
    args = build_parser().parse_args(argv[1:])
    opt = options_from_args(args, argv)
    return opt


def _rand_batch(rng, B, L, plant=()):
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L),
                       p=[.24, .24, .24, .24, .04])
    quals = rng.integers(33 + 2, 33 + 41, size=(B, L)).astype(np.uint8)
    lens = rng.integers(min(25, L), L + 1, size=B).astype(np.int32)
    mask = np.ones(B, bool)
    mask[rng.integers(0, B)] = False  # one padding row
    for i in range(B):
        for seq in plant:
            if rng.random() < 0.5:
                a = np.frombuffer(seq.encode(), np.uint8)
                if lens[i] > len(a) + 2:
                    p = int(rng.integers(0, lens[i] - len(a)))
                    bases[i, p:p + len(a)] = a
    return bases, quals, lens, mask


CONFIGS = [
    ("filters_only", ["-A"]),
    ("adapters", ["-s", START, "-e", END]),
    ("everything", ["-s", START, "-e", END, "-5", "-3", "-x", "-y",
                    "-f", "2", "-t", "1", "-m", "8"]),
    ("break_mask", ["-s", START, "-b", "--break_window_size", "20",
                    "--break_mean_quality", "22", "-N",
                    "--mask_window_size", "15", "--mask_mean_quality",
                    "20"]),
    ("cut_only", ["-A", "-5", "-3", "-W", "7", "-M", "25"]),
    ("start_only_polyx", ["-s", START, "-x", "--poly_x_min_len", "8",
                          "--trimming_extension", "3"]),
]


@pytest.mark.parametrize("name,extra", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_host_step_matches_device(name, extra):
    opt = _opt(extra)
    F = out_fields(opt)
    step, _ = get_fast_step(opt, with_stats=False)
    rng = np.random.default_rng(hash(name) % (2 ** 31))
    for L in (128, 1024):
        B = 24
        bases, quals, lens, mask = _rand_batch(
            rng, B, L, plant=(START, END))
        for packer in (pack_input_b5, pack_input):
            packed = packer(bases, quals, lens, mask)
            outbuf = jnp.zeros((1, B, F), jnp.int32)
            dev = np.asarray(step(outbuf, np.int32(0),
                                  jnp.asarray(packed), L))[0]
            host = host_rows(opt, packed, L, F)
            assert np.array_equal(dev, host), (
                "%s L=%d %s: first diff %r" % (
                    name, L, packer.__name__,
                    np.argwhere(dev != host)[:5]))


@pytest.mark.slow
def test_host_step_long_adapter_blockscan():
    """Adapters beyond MAX_DEVICE_PATTERN take the block-scan Myers path;
    the npshim must reproduce it too (middle-adapter split decisions)."""
    rng = np.random.default_rng(7)
    long_a = "".join(rng.choice(list("ACGT"), size=700))
    opt = _opt(["-s", long_a, "-e", END])
    F = out_fields(opt)
    step, _ = get_fast_step(opt, with_stats=False)
    L = 2048
    B = 8
    bases, quals, lens, mask = _rand_batch(rng, B, L, plant=(long_a,))
    packed = pack_input_b5(bases, quals, lens, mask)
    dev = np.asarray(step(jnp.zeros((1, B, F), jnp.int32), np.int32(0),
                          jnp.asarray(packed), L))[0]
    host = host_rows(opt, packed, L, F)
    assert np.array_equal(dev, host)
