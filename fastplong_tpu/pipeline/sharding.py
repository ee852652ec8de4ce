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

from .device import build_step, kernel_params, adapter_stages


def make_mesh(devices=None, axis="data"):
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices, dtype=object).reshape(-1), (axis,))


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
