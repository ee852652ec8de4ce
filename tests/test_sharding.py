"""Multi-chip sharded step: psum-merged stats must equal single-device
results, and per-read verdicts must be unchanged by sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from fastplong_tpu.config import Options
from fastplong_tpu.pipeline.device import build_step
from fastplong_tpu.pipeline.sharding import make_mesh, build_sharded_step


def _opts():
    opt = Options()
    opt.adapter.sequence_start = "AATGTACTTCGTTCAGTTACGTATTGCT"
    opt.adapter.sequence_end = "AGCAATACGTAACTGAACGAAGT"
    opt.quality_cut.enabled_front = True
    opt.quality_cut.enabled_tail = True
    opt.polyx_trim.enabled = True
    return opt


def _batch(B, L, seed=0):
    rng = np.random.default_rng(seed)
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L))
    quals = rng.integers(33 + 2, 33 + 41, size=(B, L)).astype(np.uint8)
    lens = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    mask = np.ones(B, bool)
    return bases, quals, lens, mask


def test_sharded_equals_single():
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual CPU devices"
    opt = _opts()
    step, _ = build_step(opt)
    mesh = make_mesh(jax.devices()[:8])
    sharded, _ = build_sharded_step(opt, mesh)

    B, L = 64, 256
    bases, quals, lens, mask = _batch(B, L)
    ref = jax.tree.map(np.asarray, step(
        jnp.asarray(bases), jnp.asarray(quals), jnp.asarray(lens),
        jnp.asarray(mask)))

    sh = NamedSharding(mesh, P("data"))
    args = tuple(jax.device_put(jnp.asarray(a), sh)
                 for a in (bases, quals, lens, mask))
    got = jax.tree.map(np.asarray, sharded(*args))

    # per-read verdicts identical
    for k in ("lo", "hi", "null", "code", "passed", "out_lo", "out_hi",
              "poly", "poly_trim", "adapter_trimmed"):
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)

    # psum-merged stats equal the single-device totals
    for k in ("cycle_q20", "cycle_content", "cycle_total_base",
              "base_qual_hist", "kmer", "reads", "bases"):
        np.testing.assert_array_equal(ref["pre"][k], got["pre"][k],
                                      err_msg="pre." + k)
        for ci in range(len(ref["posts"])):
            np.testing.assert_array_equal(
                ref["posts"][ci][k], got["posts"][ci][k],
                err_msg="post%d.%s" % (ci, k))


# -------------------------------------------- end-to-end mesh-mode pipeline

def _write_input(path, n=500, seed=3):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            ln = int(rng.integers(40, 900))
            seq = "".join(rng.choice(list("ACGTN"), size=ln,
                                     p=[0.245] * 4 + [0.02]))
            qual = "".join(chr(int(q)) for q in rng.integers(35, 74, size=ln))
            f.write("@r%d d\n%s\n+\n%s\n" % (i, seq, qual))


def test_mesh_pipeline_end_to_end_parity(tmp_path):
    """The PRODUCTION runner on an 8-device mesh writes byte-identical
    out.fq / failed.fq / JSON to the single-device run — the mesh analog of
    the reference's N-worker invariant (seprocessor.cpp:79-121)."""
    import re
    from fastplong_tpu.main import main

    in_fq = str(tmp_path / "in.fq")
    _write_input(in_fq)

    def run(devices, tag):
        argv = ["fastplong", "-i", in_fq,
                "-o", str(tmp_path / ("out_%s.fq" % tag)),
                "--failed_out", str(tmp_path / ("failed_%s.fq" % tag)),
                "-j", str(tmp_path / ("r_%s.json" % tag)),
                "-h", str(tmp_path / ("r_%s.html" % tag)),
                "-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-5", "-3", "-x",
                "--devices", str(devices)]
        main(argv)

    run(1, "d1")
    run(8, "d8")
    for name in ("out", "failed"):
        a = (tmp_path / ("%s_d1.fq" % name)).read_bytes()
        b = (tmp_path / ("%s_d8.fq" % name)).read_bytes()
        assert a == b, "%s.fq differs between 1 and 8 devices" % name
    strip = lambda s: re.sub(r'"command": ".*"', '', s)
    assert (strip((tmp_path / "r_d1.json").read_text())
            == strip((tmp_path / "r_d8.json").read_text()))


def test_mesh_pipeline_break_mask_parity(tmp_path):
    """Mesh parity for the other device-output shape: break/mask span
    emission (variable output cardinality per read)."""
    import re
    from fastplong_tpu.main import main

    in_fq = str(tmp_path / "in.fq")
    _write_input(in_fq, n=400, seed=9)

    def run(devices, tag):
        argv = ["fastplong", "-i", in_fq,
                "-o", str(tmp_path / ("out_%s.fq" % tag)),
                "--failed_out", str(tmp_path / ("failed_%s.fq" % tag)),
                "-j", str(tmp_path / ("r_%s.json" % tag)),
                "-h", str(tmp_path / ("r_%s.html" % tag)),
                "-e", "AGCAATACGTAACTGAACGAAGT", "-b", "-x",
                "--devices", str(devices)]
        main(argv)

    run(1, "d1")
    run(8, "d8")
    for name in ("out", "failed"):
        a = (tmp_path / ("%s_d1.fq" % name)).read_bytes()
        b = (tmp_path / ("%s_d8.fq" % name)).read_bytes()
        assert a == b, "%s.fq differs between 1 and 8 devices" % name
    strip = lambda s: re.sub(r'"command": ".*"', '', s)
    assert (strip((tmp_path / "r_d1.json").read_text())
            == strip((tmp_path / "r_d8.json").read_text()))


def test_mesh_host_stats_backend_parity(tmp_path):
    """--stats_backend host under --devices (first-class mesh mode, r2
    VERDICT #3): the sharded stats-free step + per-shard host statRead
    must write byte-identical outputs and JSON to the single-device
    device-stats run."""
    import re
    from fastplong_tpu.main import main

    in_fq = str(tmp_path / "in.fq")
    _write_input(in_fq, n=300, seed=17)

    def run(devices, backend, tag):
        argv = ["fastplong", "-i", in_fq,
                "-o", str(tmp_path / ("out_%s.fq" % tag)),
                "--failed_out", str(tmp_path / ("failed_%s.fq" % tag)),
                "-j", str(tmp_path / ("r_%s.json" % tag)),
                "-h", str(tmp_path / ("r_%s.html" % tag)),
                "-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-5", "-3", "-x",
                "--stats_backend", backend, "--devices", str(devices)]
        main(argv)

    run(1, "device", "d1dev")
    run(8, "host", "d8host")
    for name in ("out", "failed"):
        a = (tmp_path / ("%s_d1dev.fq" % name)).read_bytes()
        b = (tmp_path / ("%s_d8host.fq" % name)).read_bytes()
        assert a == b, "%s.fq differs: 1-dev device-stats vs 8-dev host-stats" % name
    strip = lambda s: re.sub(r'"command": ".*"', '', s)
    assert (strip((tmp_path / "r_d1dev.json").read_text())
            == strip((tmp_path / "r_d8host.json").read_text()))
