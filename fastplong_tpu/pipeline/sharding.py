"""Multi-chip execution: data-parallel sharding over the read-batch axis.

The reference's parallelism is N worker threads with private stats merged
at end-of-run (src/seprocessor.cpp:108-121, threadconfig.cpp:9-14).  The
TPU-native equivalent shards the padded [B, L] batch across a device mesh
with shard_map; per-read verdicts stay sharded (each host writes its own
records), while statistic partials are reduced with jax.lax.psum over the
ICI so every device holds the merged totals — the collective replacement
for Stats::merge.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

import functools

from jax.sharding import NamedSharding

from .device import build_step, kernel_params, adapter_stages, \
    make_fast_fn, zero_stats_state


def make_mesh(devices=None, axis="data"):
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices, dtype=object).reshape(-1), (axis,))


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def build_fast_sharded_step(opt, mesh, axis="data", with_stats=True):
    """The production fast step over a device mesh.

    Same contract as device.build_fast_step — (state, outbuf, slot,
    packed_in, L) -> (state', outbuf'), trailing L static — but
    data-parallel over the read axis:
      * packed_in [B, L+8] (base5) or [B, 2L+8] (wide)
                             sharded over rows (B/n per device)
      * outbuf  [K, B, F]    sharded over dim 1 (each device writes its rows)
      * state                leaves carry a leading [n_dev] axis; every
                             device accumulates a private partial (the
                             reference's per-thread Stats, merged at drain)
      * slot                 replicated scalar
    No collectives run in the hot path — reads are independent; the only
    cross-device reduction is the host-side sum at stat-drain time.

    with_stats=False is the host-statistics-mode variant: no state carry,
    (outbuf, slot, packed_in, L) -> outbuf' (statRead runs on the host
    per shard-local batch, pipeline/host_stats.py)."""
    fast, stages = make_fast_fn(opt, with_stats)
    dp = P(axis)

    if not with_stats:
        in_specs_ns = (P(None, axis), P(), dp)

        def step_ns(outbuf, slot, packed_in, L):
            fn = _shard_map(
                lambda o, sl, p: fast(o, sl, p, L),
                mesh, in_specs_ns, P(None, axis))
            return fn(outbuf, slot, packed_in)

        return jax.jit(step_ns, static_argnums=3), stages

    in_specs = (dp, P(None, axis), P(), dp)
    out_specs = (dp, P(None, axis))

    def step(state, outbuf, slot, packed_in, L):
        # L is consumed before shard_map (static under the outer jit)
        fn = _shard_map(
            lambda s, o, sl, p: fast(s, o, sl, p, L),
            mesh, in_specs, out_specs)
        return fn(state, outbuf, slot, packed_in)

    return jax.jit(step, static_argnums=4, donate_argnums=0), stages


@functools.lru_cache(maxsize=None)
def _sharded_init_fn(L, mesh, axis):
    sh = NamedSharding(mesh, P(axis))
    n = mesh.devices.size
    return jax.jit(functools.partial(zero_stats_state, L, n),
                   out_shardings=sh)


class MeshPlacement:
    """Host-side placement helper for mesh mode: shardings for the packed
    input, the output ring buffer, and the per-device stat accumulators."""

    def __init__(self, mesh, axis="data"):
        self.mesh = mesh
        self.axis = axis
        self.n = int(mesh.devices.size)
        self.in_sharding = NamedSharding(mesh, P(axis))
        self.buf_sharding = NamedSharding(mesh, P(None, axis))

    def init_state(self, L):
        return _sharded_init_fn(L, self.mesh, self.axis)()

    def put_outbuf(self, arr):
        return jax.device_put(arr, self.buf_sharding)

    def put_input(self, arr):
        return jax.device_put(arr, self.in_sharding)


def build_sharded_step(opt, mesh, axis="data"):
    """Returns a jitted step sharded over `axis`.

    Per-read outputs are sharded over the batch axis; the `pre`/`posts`
    statistic partials are psum-merged across the mesh (replicated out).
    """
    inner_jit, stages = build_step(opt)
    # the un-jitted pure function is what we shard
    inner = inner_jit.__wrapped__

    stat_keys = ("cycle_q20", "cycle_q30", "cycle_content", "cycle_qual",
                 "cycle_total_base", "cycle_total_qual", "base_qual_hist",
                 "kmer", "reads", "bases")

    def reduce_stats(d):
        out = dict(d)
        for k in stat_keys:
            out[k] = jax.lax.psum(d[k], axis)
        return out

    def sharded(bases, quals, lens, read_mask):
        out = inner(bases, quals, lens, read_mask)
        out["pre"] = reduce_stats(out["pre"])
        out["posts"] = [reduce_stats(p) for p in out["posts"]]
        return out

    dp = P(axis)
    rep = P()

    # derive the out_specs pytree from the traced output structure:
    # psum-reduced stats tensors are replicated, everything else sharded
    B = 8 * mesh.devices.size
    dummy = (jax.ShapeDtypeStruct((B, 128), jnp.uint8),
             jax.ShapeDtypeStruct((B, 128), jnp.uint8),
             jax.ShapeDtypeStruct((B,), jnp.int32),
             jax.ShapeDtypeStruct((B,), jnp.bool_))
    out_sd = jax.eval_shape(inner, *dummy)

    def spec_of(path, _leaf):
        keys = [getattr(k, "key", None) for k in path]
        if ("pre" in keys or "posts" in keys) and keys[-1] in stat_keys:
            return rep
        return dp

    out_specs = jax.tree_util.tree_map_with_path(spec_of, out_sd)

    try:
        fn = shard_map(sharded, mesh=mesh, in_specs=(dp, dp, dp, dp),
                       out_specs=out_specs, check_vma=False)
    except TypeError:
        fn = shard_map(sharded, mesh=mesh, in_specs=(dp, dp, dp, dp),
                       out_specs=out_specs, check_rep=False)
    return jax.jit(fn), stages
