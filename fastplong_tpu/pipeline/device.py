"""The per-batch device computation.

Builds a single jit-compiled function that runs the full per-read kernel
chain over a padded [B, L] batch — the TPU-native replacement for the
reference's per-read worker loop (src/seprocessor.cpp:180-329):

  pre-stats -> trimAndCut -> polyX -> adapter trims (start/end/FASTA) ->
  middle-adapter split -> break by low-quality regions -> N-mask ->
  filters -> post-stats

Adapter sequences are static (fixed at startup, exactly like the reference),
so their bitmask tables and thresholds are baked into the compiled graph.
Returns per-read span/verdict vectors (applied host-side to the original
bytes) plus per-batch statistic partials.

Out-reads: middle-adapter splitting can produce 2 children per read
(breakByGap, read.cpp:192-215), and region-breaking can split each of
those into a head and tail fragment (breakByRegions, read.cpp:227-262 —
see ops/regions.py for why at most 2 fragments are possible).  The step
emits up to 4 span slots, each with a split-tag code (0 plain / 1
split-left / 2 split-right), a region number for the "rN-" name prefix
(0 = none), and an N-mask span.
"""

import os as _os

import jax
import jax.numpy as jnp

# Persistent compilation cache: first-compile of a bucket shape costs
# seconds (2-20s through the device tunnel); cached executables make every
# later process start warm.  Tests set JAX_COMPILATION_CACHE_DIR
# themselves.  Per-user path: a fixed /tmp name would collide (mode 0700)
# between users on a shared machine.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import tempfile
    _cache = _os.path.join(
        tempfile.gettempdir(),
        "jax_cache_fastplong_%d" % (_os.getuid()
                                    if hasattr(_os, "getuid") else 0))
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from ..common import PASS_FILTER
from ..ops.qualcut import trim_and_cut
from ..ops.polyx import trim_polyx
from ..ops.filters import pass_filter
from ..ops.stats_kernels import stat_batch
from ..ops.primitives import qual_cumsum
from ..ops.regions import detect_regions_summary
from ..ops.adapter import (AdapterSpec, trim_by_sequence_start,
                           trim_by_sequence_end, find_middle_adapters,
                           _mismatch_full)

TAG_NONE = 0
TAG_SPLIT_LEFT = 1
TAG_SPLIT_RIGHT = 2

N_CHAR = ord("N")


def kernel_params(opt):
    """Extract the static (hashable) kernel parameters from Options."""
    qc = opt.quality_cut
    qf = opt.qualfilter
    lf = opt.length_filter
    cf = opt.complexity_filter
    ad = opt.adapter
    return dict(
        trim_front=opt.trim.front,
        trim_tail=opt.trim.tail,
        cut=dict(
            enabled_front=qc.enabled_front, enabled_tail=qc.enabled_tail,
            window_front=qc.window_size_front, quality_front=qc.quality_front,
            window_tail=qc.window_size_tail, quality_tail=qc.quality_tail),
        polyx_enabled=opt.polyx_trim.enabled,
        polyx_min_len=opt.polyx_trim.min_len,
        adapter_enabled=ad.enabled,
        start_seq=ad.sequence_start,
        end_seq=ad.sequence_end,
        fasta_seqs=tuple(ad.seqs_in_fasta),
        ed_max=ad.ed_max,
        ext=ad.trimming_extension,
        break_enabled=opt.break_opt.enabled,
        break_window=opt.break_opt.window_size,
        break_quality=opt.break_opt.quality,
        mask_enabled=opt.mask.enabled,
        mask_window=opt.mask.window_size,
        mask_quality=opt.mask.quality,
        filt=dict(
            qual_enabled=qf.enabled,
            qualified_qual=qf.qualified_qual,
            unqualified_percent_limit=qf.unqualified_percent_limit,
            n_base_limit=qf.n_base_limit,
            n_base_percent_limit=qf.n_base_percent_limit,
            avg_qual_req=qf.avg_qual_req,
            length_enabled=lf.enabled,
            required_length=lf.required_length,
            max_length=lf.max_length,
            complexity_enabled=cf.enabled,
            complexity_threshold_pct=int(round(cf.threshold * 100))),
    )


def adapter_stages(p):
    """Static list of (adapter_seq, side) trim stages, reference order
    (seprocessor.cpp:205-213)."""
    stages = []
    if p["adapter_enabled"]:
        if p["start_seq"]:
            stages.append((p["start_seq"], "start"))
        if p["end_seq"]:
            stages.append((p["end_seq"], "end"))
        for seq in p["fasta_seqs"]:
            stages.append((seq, "start"))
            stages.append((seq, "end"))
    return stages


def out_cap(opt):
    p = kernel_params(opt)
    cap = 2 if p["adapter_enabled"] else 1
    if p["break_enabled"]:
        cap *= 2
    return cap


class _Slot:
    """One out-read candidate during trace time."""

    __slots__ = ("lo", "hi", "active", "tag", "region_no", "is_parent")

    def __init__(self, lo, hi, active, tag, region_no, is_parent):
        self.lo = lo
        self.hi = hi
        self.active = active
        self.tag = tag
        self.region_no = region_no
        self.is_parent = is_parent


def build_step(opt, with_stats=True):
    """Returns (jitted step fn, adapter stage list).

    with_stats=False omits the statistics reductions (monster-read buckets
    compute stats on the host, pipeline/host_stats.py): "pre"/"posts" come
    back as None and medians are not available.
    """
    p = kernel_params(opt)
    stages = adapter_stages(p)
    specs = [AdapterSpec(seq, p["ed_max"]) for seq, _ in stages]
    middle_specs = None
    if p["adapter_enabled"]:
        middle_specs = (AdapterSpec(p["start_seq"], p["ed_max"]),
                        AdapterSpec(p["end_seq"], p["ed_max"]))

    def step(bases, quals, lens, read_mask):
        B = lens.shape[0]
        lens = jnp.where(read_mask, lens, 0)
        pre = stat_batch(bases, quals, jnp.zeros_like(lens), lens,
                         read_mask, zero_lo=True) if with_stats else None

        lo, hi, null = trim_and_cut(
            bases, quals, lens, p["trim_front"], p["trim_tail"], **p["cut"])
        null = null | ~read_mask
        lo = jnp.where(null, 0, lo)
        hi = jnp.where(null, 0, hi)

        poly = jnp.full((B,), -1, jnp.int32)
        poly_trim = jnp.zeros((B,), jnp.int32)
        if p["polyx_enabled"]:
            new_hi, poly_b, ptrim = trim_polyx(bases, lo, hi,
                                               p["polyx_min_len"])
            hi = jnp.where(null, hi, new_hi)
            poly = jnp.where(null, -1, poly_b)
            poly_trim = jnp.where(null, 0, ptrim)

        # ---- adapter trimming (each stage mutates the span sequentially);
        # the raw-position mismatch scan depends only on (bases, adapter),
        # so it is computed once per distinct adapter and shared across
        # stages and the middle-adapter search
        mm_cache = {}

        def mm_for(sp_):
            if sp_.data not in mm_cache and sp_.alen > 0:
                mm_cache[sp_.data] = _mismatch_full(bases, sp_.data)
            return mm_cache.get(sp_.data)

        trimmed_total = jnp.zeros((B,), jnp.int32)
        recs = []
        for spec, (seq, side) in zip(specs, stages):
            if side == "start":
                new_lo, t, rec = trim_by_sequence_start(
                    bases, lo, hi, spec, p["ext"], mm=mm_for(spec))
                lo = jnp.where(null, lo, new_lo)
            else:
                new_hi, t, rec = trim_by_sequence_end(
                    bases, lo, hi, spec, p["ext"], mm=mm_for(spec))
                hi = jnp.where(null, hi, new_hi)
            t = jnp.where(null, 0, t)
            rec = jnp.where(null, 0, rec)
            trimmed_total = trimmed_total + t
            recs.append(rec)

        zero = jnp.zeros((B,), jnp.int32)
        false = jnp.zeros((B,), bool)
        true = jnp.ones((B,), bool)

        # ---- middle adapter split (breakByGap)
        if middle_specs is not None:
            found, mstart, mlen = find_middle_adapters(
                bases, lo, hi, middle_specs[0], middle_specs[1], p["ext"],
                mm_start=mm_for(middle_specs[0]),
                mm_end=mm_for(middle_specs[1]))
            found = found & ~null
            len1 = mstart
            len2 = (hi - lo) - mstart - mlen
            has_left = found & (len1 > 0)
            has_right = found & (len2 > 0)
            s0_is_parent = ~found
            s0_is_left = found & has_left
            s0_lo = jnp.where(s0_is_parent, lo,
                              jnp.where(s0_is_left, lo, lo + mstart + mlen))
            s0_hi = jnp.where(s0_is_parent, hi,
                              jnp.where(s0_is_left, lo + len1, hi))
            s0_tag = jnp.where(s0_is_parent, TAG_NONE,
                               jnp.where(s0_is_left, TAG_SPLIT_LEFT,
                                         TAG_SPLIT_RIGHT))
            slots = [
                _Slot(s0_lo, s0_hi,
                      ~null & (~found | has_left | has_right),
                      s0_tag, zero, s0_is_parent),
                _Slot(lo + mstart + mlen, hi, has_left & has_right,
                      jnp.full((B,), TAG_SPLIT_RIGHT, jnp.int32), zero,
                      false),
            ]
        else:
            slots = [_Slot(lo, hi, ~null, zero, zero, true)]

        cq = None
        if p["break_enabled"] or p["mask_enabled"]:
            cq = qual_cumsum(quals, lens)

        # ---- break by low-quality regions (per slot -> head/tail fragments)
        if p["break_enabled"]:
            Tb = (33 + p["break_quality"]) * p["break_window"]
            new_slots = []
            for s in slots:
                ws1, last_end, count = detect_regions_summary(
                    cq, s.lo, jnp.where(s.active, s.hi, s.lo),
                    p["break_window"], Tb)
                has = s.active & (count > 0)
                rlen = s.hi - s.lo
                head_ex = has & (ws1 > 0)
                tail_ex = has & (last_end < rlen - 1)
                # slot A: original (no regions) / head / tail
                a_lo = jnp.where(head_ex, s.lo,
                                 jnp.where(tail_ex, s.lo + last_end + 1, s.lo))
                a_hi = jnp.where(head_ex, s.lo + ws1,
                                 jnp.where(tail_ex, s.hi, s.hi))
                a_active = s.active & (~has | head_ex | tail_ex)
                a_region = jnp.where(head_ex, 1,
                                     jnp.where(tail_ex, count + 1, 0))
                a_is_parent = s.is_parent & ~has
                new_slots.append(_Slot(
                    jnp.where(has, a_lo, s.lo), jnp.where(has, a_hi, s.hi),
                    a_active, s.tag, jnp.where(has, a_region, 0),
                    a_is_parent))
                # slot B: tail fragment when both head and tail exist
                b_active = head_ex & tail_ex
                new_slots.append(_Slot(
                    s.lo + last_end + 1, s.hi, b_active, s.tag, count + 1,
                    false))
            slots = new_slots

        # ---- N-mask low-quality regions (per final slot)
        bases_eff = bases
        mask_lo = [zero for _ in slots]
        mask_hi = [zero for _ in slots]
        if p["mask_enabled"]:
            Tm = (33 + p["mask_quality"]) * p["mask_window"]
            idx = jnp.arange(bases.shape[1], dtype=jnp.int32)[None, :]
            masked = jnp.zeros(bases.shape, bool)
            for ci, s in enumerate(slots):
                ws1, last_end, count = detect_regions_summary(
                    cq, s.lo, jnp.where(s.active, s.hi, s.lo),
                    p["mask_window"], Tm)
                has = s.active & (count > 0)
                m_lo = jnp.where(has, s.lo + ws1, 0)
                m_hi = jnp.where(has, s.lo + last_end + 1, 0)
                mask_lo[ci] = m_lo
                mask_hi[ci] = m_hi
                masked = masked | ((idx >= m_lo[:, None])
                                   & (idx < m_hi[:, None]) & has[:, None])
            bases_eff = jnp.where(masked, jnp.uint8(N_CHAR), bases)

        # ---- filters + post-stats per out-read slot
        codes = []
        passed = []
        posts = []
        for s in slots:
            code_c = pass_filter(bases_eff, quals, s.lo, s.hi, lens,
                                 **p["filt"])
            pass_c = (code_c == PASS_FILTER) & s.active
            codes.append(code_c)
            passed.append(pass_c)
            posts.append(stat_batch(bases_eff, quals, s.lo, s.hi, pass_c)
                         if with_stats else None)

        active = jnp.stack([s.active for s in slots], axis=1)
        n_out = jnp.sum(active.astype(jnp.int32), axis=1)
        return {
            "lo": lo, "hi": hi, "null": null,
            "out_lo": jnp.stack([s.lo for s in slots], axis=1),
            "out_hi": jnp.stack([s.hi for s in slots], axis=1),
            "out_tag": jnp.stack([jnp.broadcast_to(s.tag, (B,))
                                  for s in slots], axis=1),
            "region_no": jnp.stack([jnp.broadcast_to(s.region_no, (B,))
                                    for s in slots], axis=1),
            "is_parent": jnp.stack([jnp.broadcast_to(s.is_parent, (B,))
                                    for s in slots], axis=1),
            "mask_lo": jnp.stack(mask_lo, axis=1),
            "mask_hi": jnp.stack(mask_hi, axis=1),
            "active": active, "n_out": n_out,
            "code": jnp.stack(codes, axis=1),
            "passed": jnp.stack(passed, axis=1),
            "poly": poly, "poly_trim": poly_trim,
            "adapter_trimmed": trimmed_total,
            "adapter_recs": jnp.stack(recs, axis=1) if recs
                            else jnp.zeros((B, 0), jnp.int32),
            "pre": pre, "posts": posts,
        }

    return jax.jit(step), stages


# --------------------------------------------------------------------------
# Transfer-optimized variant: device-resident stat accumulators (donated
# carry, fetched once at end of run) + ONE packed int32 per-read output
# array per batch.  Device<->host traffic per batch drops from ~15MB across
# ~40 arrays to one ~8MB input and one sub-MB output — essential because
# d2h transfers cost ~30-60ms each on this interconnect and collapse
# entirely above ~8MB per array.
# --------------------------------------------------------------------------

_STAT_KEYS = ("cycle_q20", "cycle_q30", "cycle_content", "cycle_qual",
              "cycle_total_base", "cycle_total_qual", "base_qual_hist",
              "kmer")

# Each statistic side lives on device as ONE flat int32 vector (layout
# below): the end-of-run drain then costs one d2h transfer total (every
# fetch pays a large fixed RTT through the interconnect, and its bandwidth
# is at times catastrophic, so BYTES FETCHED is the currency).  The
# per-(base,cycle) Q20/Q30 arrays are reduced to per-base totals ON DEVICE
# — nothing downstream reads them at cycle resolution (stats.py:137-138
# only ever sums them), which cuts the drain volume by ~47%.  The cycle
# block is POSITION-MAJOR ([L, 18]: 18 stat values per cycle) so the drain
# can be trimmed to the longest read actually seen — cycles beyond it are
# provably zero.
#   [0, 18L)      cycle block [L, 18] = per cycle:
#                   [0:8]  content per base bucket
#                   [8:16] quality sum per base bucket
#                   [16]   total bases   [17] total quality
#   [18L, +8)     q20_totals [8]   (per-base totals)
#   [+8, +16)     q30_totals [8]
#   [+16, +144)   base_qual_hist [128]
#   [+144, +1168) kmer [1024]
_FLAT_EXTRA = 8 + 8 + 128 + 1024
_FLAT_PER_L = 18


def flat_side_len(L):
    return _FLAT_PER_L * L + _FLAT_EXTRA


def global_stat_len():
    """The shared stat length: the largest bucket at or under the device
    stat cap.  Every bucket's partials are padded to this, so the whole
    run keeps ONE [2, F] accumulator regardless of bucket mix."""
    from ..common import stat_device_cap
    from .batches import _BUCKETS
    cap = stat_device_cap()
    ls = [b for b in _BUCKETS if b <= cap]
    return ls[-1] if ls else _BUCKETS[0]


def unflatten_side(flat, L):
    """Split one fetched flat side vector into the named numpy arrays.
    L is the cycle count of the (possibly trimmed) cycle block."""
    out = {}
    cyc = flat[:18 * L].reshape(L, 18)
    out["cycle_content"] = cyc[:, 0:8].T.copy()
    out["cycle_qual"] = cyc[:, 8:16].T.copy()
    out["cycle_total_base"] = cyc[:, 16].copy()
    out["cycle_total_qual"] = cyc[:, 17].copy()
    o = 18 * L
    out["q20_totals"] = flat[o:o + 8]
    o += 8
    out["q30_totals"] = flat[o:o + 8]
    o += 8
    out["base_qual_hist"] = flat[o:o + 128]
    o += 128
    out["kmer"] = flat[o:o + 1024]
    return out


import functools


def zero_stats_state(L, n_dev=None):
    """Zeroed accumulator: ONE [2, F] int32 array per bucket (row 0 = pre,
    row 1 = post) so the end-of-run drain is a single d2h per bucket.
    n_dev adds a leading per-device axis (sharded mesh mode — each device
    accumulates its own partial, the host sums at drain, mirroring the
    reference's per-thread Stats merged at end, seprocessor.cpp:108-121)."""
    shape = (2, flat_side_len(L))
    if n_dev is not None:
        shape = (n_dev,) + shape
    return jnp.zeros(shape, jnp.int32)


@functools.partial(jax.jit, static_argnums=0)
def init_stats_state(L):
    """Zeroed device-resident accumulators for one bucket length.

    Jitted as ONE executable per L: an eager build would cost extra tiny
    compiles+dispatches through the device link."""
    return zero_stats_state(L)


def _flat_partial(partial, stat_L):
    """One batch partial (dict of arrays) as a flat [F] vector in the
    drain layout (position-major cycle block; q20/q30 reduced to per-base
    totals on device).

    The cycle block is zero-padded from the batch's bucket length L to the
    GLOBAL stat length stat_L so every bucket accumulates into one shared
    [2, F] state — drained with a single end-of-run fetch instead of one
    per bucket (halves the d2h volume again: bucket lengths sum to ~2x
    the longest)."""
    L = partial["cycle_total_base"].shape[0]
    cyc = jnp.concatenate([
        partial["cycle_content"].T,            # [L, 8]
        partial["cycle_qual"].T,               # [L, 8]
        partial["cycle_total_base"][:, None],
        partial["cycle_total_qual"][:, None],
    ], axis=1)                                 # [L, 18]
    cyc = jnp.pad(cyc, ((0, stat_L - L), (0, 0)))
    return jnp.concatenate([
        cyc.ravel(),
        jnp.sum(partial["cycle_q20"], axis=1),
        jnp.sum(partial["cycle_q30"], axis=1),
        partial["base_qual_hist"],
        partial["kmer"],
    ])


def packed_fields(opt):
    """(n_fixed, cap, n_stages) describing the packed per-read layout."""
    p = kernel_params(opt)
    cap = out_cap(opt)
    n_stages = len(adapter_stages(p))
    return 5, cap, n_stages


def pack_input(bases, quals, lens, read_mask):
    """Host-side wide layout: one [B, 2L+8] uint8 array =
    bases||quals||lens(le)||mask.  A single h2d transfer per batch (each
    extra array costs an RTT).  The production path uses the 1-byte-per-
    base base5 layout (pack_input_b5 / pipeline/batches.py); wide is the
    fallback for rows outside the base5 alphabet."""
    import numpy as np
    B, L = bases.shape
    out = np.empty((B, 2 * L + 8), np.uint8)
    out[:, :L] = bases
    out[:, L:2 * L] = quals
    out[:, 2 * L:2 * L + 4] = lens.astype("<i4").view(np.uint8).reshape(B, 4)
    out[:, 2 * L + 4] = read_mask.astype(np.uint8)
    out[:, 2 * L + 5:] = 0
    return out


def pack_input_b5(bases, quals, lens, read_mask):
    """Host-side base5 layout: one [B, L+8] uint8 array, one byte per base
    (code + 5*(qual-33); 255 = padding) followed by lens(le)||mask.

    Requires bases in {A,C,G,T,N} and qual chars 33..83; raises ValueError
    otherwise (production packing falls back to the wide layout instead,
    pipeline/batches.BatchBuilder)."""
    import numpy as np
    from .batches import _B5_CODE, _B5_QMUL
    B, L = bases.shape
    v16 = _B5_CODE[bases] + _B5_QMUL[quals]
    valid_cols = np.arange(L)[None, :] < np.asarray(lens).reshape(B, 1)
    valid_cols &= np.asarray(read_mask).reshape(B, 1)
    if (v16[valid_cols] > 254).any():
        raise ValueError("input outside the base5 alphabet")
    out = np.empty((B, L + 8), np.uint8)
    out[:, :L] = np.where(valid_cols, v16.astype(np.uint8), 255)
    out[:, L:L + 4] = lens.astype("<i4").view(np.uint8).reshape(B, 4)
    out[:, L + 4] = read_mask.astype(np.uint8)
    out[:, L + 5:] = 0
    return out


import numpy as _np
# numpy constant, converted per trace — a cached jnp array created inside
# one jit trace would leak that trace's tracer into every later trace
_B5_BASE_LUT = _np.frombuffer(b"ACGTN", _np.uint8)


def unpack_on_device(packed_in, L):
    """Split one packed batch into (bases, quals, lens, read_mask) on
    device.  Layout inferred from the row stride: L+8 = base5 (decode
    one byte per base), 2L+8 = wide (verbatim).  base5 decode reproduces
    the wide bytes EXACTLY (padding 255 -> base 0, qual 0), so the kernel
    chain behaves identically for either feed."""
    W = packed_in.shape[1]
    if W == L + 8:
        x = packed_in[:, :L]
        q5 = x // jnp.uint8(5)
        pad = x == jnp.uint8(255)
        bases = jnp.where(pad, jnp.uint8(0),
                          jnp.take(jnp.asarray(_B5_BASE_LUT),
                                   x - q5 * jnp.uint8(5)))
        quals = jnp.where(pad, jnp.uint8(0), q5 + jnp.uint8(33))
        meta = packed_in[:, L:]
    elif W == 2 * L + 8:
        bases = packed_in[:, :L]
        quals = packed_in[:, L:2 * L]
        meta = packed_in[:, 2 * L:]
    else:
        raise ValueError("packed width %d does not match L=%d" % (W, L))
    lb = meta[:, :4].astype(jnp.int32)
    lens = lb[:, 0] | (lb[:, 1] << 8) | (lb[:, 2] << 16) | (lb[:, 3] << 24)
    read_mask = meta[:, 4] != 0
    return bases, quals, lens, read_mask


# --------------------------------------------------------------------------
# Stream feed: ship exactly the used payload bytes (1.03 bytes/base) and
# rebuild the padded [B, L+8] b5 batch ON DEVICE.  Padding is a first-
# order h2d cost in the degraded-transfer regime a resident daemon lives
# in (~20-38 MB/s measured); the device-side gather rebuild costs ~0.04ms
# per [1024, 8192] batch (measured).  The stream length is quantized so
# the executable set stays small; each (L, B, w) shape is a tiny program.
# Exactness: unpack_stream(build_stream(packed)) == packed, bit for bit
# (pinned by tests/test_stream_feed.py) — so the kernel chain cannot tell
# the feeds apart.
# --------------------------------------------------------------------------

def stream_quantum(B, L):
    """w quantization step: eighths of the padded payload, >=1MB (the
    floor keeps tiny batches on the direct feed; tests lower it via
    FASTPLONG_STREAM_QUANTUM to drive the stream path on small shapes)."""
    floor = int(_os.environ.get("FASTPLONG_STREAM_QUANTUM", 1 << 20))
    return max(floor, (B * L) // 8)


def build_stream(packed, L):
    """Concatenate a full b5 batch's used payload + meta into one flat
    uint8 feed (255-padded to the quantized length); None when the
    stream would not be smaller than the padded batch."""
    import numpy as np
    B = packed.shape[0]
    if packed.shape[1] != L + 8:
        return None   # wide layout rows cannot stream
    lens = packed[:, L:L + 4].copy().view("<i4").ravel()
    step = stream_quantum(B, L)
    used = int(lens.sum())
    s = used + 8 * B
    w = -(-s // step) * step
    if w >= B * (L + 8):
        return None
    buf = np.full(w, 255, np.uint8)
    # per-row prefix copies (memcpy) — 15x faster than a boolean-mask
    # gather over the padded cells (measured 10ms vs 154ms per
    # [2048, 16K] batch); this runs on the dispatcher thread per batch
    off = 0
    for i in range(B):
        n = int(lens[i])
        if n:
            buf[off:off + n] = packed[i, :n]
            off += n
    buf[w - 8 * B:] = packed[:, L:].ravel()
    return buf


@functools.partial(jax.jit, static_argnums=(1, 2))
def unpack_stream(stream, L, B):
    """Rebuild the padded [B, L+8] b5 batch from a flat stream feed."""
    w = stream.shape[0]
    meta = stream[w - 8 * B:].reshape(B, 8)
    lb = meta[:, :4].astype(jnp.int32)
    lens = lb[:, 0] | (lb[:, 1] << 8) | (lb[:, 2] << 16) | (lb[:, 3] << 24)
    cum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(lens, dtype=jnp.int32)])
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = cum[:-1, None] + j
    valid = j < lens[:, None]
    payload = jnp.where(
        valid, jnp.take(stream, jnp.where(valid, src, 0)), jnp.uint8(255))
    return jnp.concatenate([payload, meta], axis=1)


def make_fast_fn(opt, with_stats=True):
    """Returns (raw python fn(state, outbuf, slot, packed_in, L) ->
    (state', outbuf'), stages) — unjitted, so the mesh path can wrap the
    same function in shard_map (pipeline/sharding.py).  L is the bucket
    length (static under jit): the packed row stride alone cannot
    distinguish the base5 layout of one bucket from the wide layout of
    another.

    The function is shape-polymorphic over a leading per-device axis on the
    state leaves: accumulation broadcasts the [8, L]-shaped batch partial
    against state of either [8, L] (single device) or [1, 8, L] (the
    per-device shard seen inside shard_map).

    packed_in: [B, L+8] uint8 (base5, pipeline/batches.py) or [B, 2L+8]
      (wide fallback, pack_input()).
    outbuf: [K, B, F] int32 ring buffer of per-batch packed outputs; the
      step writes this batch's rows at index `slot` (host-managed counter
      mod K).  The host fetches the whole buffer once per K batches —
      one mid-size d2h transfer instead of K small ones, because small
      fetches pay a large fixed interconnect latency.
    packed row layout ([B, F] int32):
      0: lo   1: hi
      2: flags = null | n_out<<1 | (poly+1)<<4 | pre_median<<8
      3: poly_trim   4: adapter_trimmed
      5 + c*6 ... : per slot (out_lo, out_hi, mask_lo, mask_hi, misc,
                    region_no) where misc = code | tag<<6 | passed<<8 |
                    is_parent<<9 | active<<10 | post_median<<11
      5 + cap*6 ...: adapter_recs per stage
    """
    inner_jit, stages = build_step(opt, with_stats)
    inner = inner_jit.__wrapped__
    cap = out_cap(opt)
    n_stages = len(stages)

    def core(outbuf, slot, packed_in, L):
        B = packed_in.shape[0]
        bases, quals, lens, read_mask = unpack_on_device(packed_in, L)
        out = inner(bases, quals, lens, read_mask)

        zero = jnp.zeros((B,), jnp.int32)
        pre_median = (out["pre"]["median"].astype(jnp.int32)
                      if with_stats else zero)
        cols = [out["lo"], out["hi"]]
        flags = (out["null"].astype(jnp.int32)
                 | (out["n_out"] << 1)
                 | ((out["poly"] + 1) << 4)
                 | (pre_median << 8))
        # adapter_trimmed can be NEGATIVE (the reference's partial-path
        # arithmetic underflows for adapters longer than the read,
        # adaptertrimmer.cpp:229-234); the accounting gate is `> 0`
        # either way, so clamp BEFORE the ring cast — a negative value
        # must not wrap to ~65k in a uint16 ring
        cols += [flags, out["poly_trim"],
                 jnp.maximum(out["adapter_trimmed"], 0)]
        for c in range(cap):
            post_median = (out["posts"][c]["median"].astype(jnp.int32)
                           if with_stats else zero)
            misc = (out["code"][:, c]
                    | (out["out_tag"][:, c] << 6)
                    | (out["passed"][:, c].astype(jnp.int32) << 8)
                    | (out["is_parent"][:, c].astype(jnp.int32) << 9)
                    | (out["active"][:, c].astype(jnp.int32) << 10)
                    | (post_median << 11))
            cols += [out["out_lo"][:, c], out["out_hi"][:, c],
                     out["mask_lo"][:, c], out["mask_hi"][:, c],
                     misc, out["region_no"][:, c]]
        for si in range(n_stages):
            cols.append(out["adapter_recs"][:, si])
        packed_out = jnp.stack(cols, axis=1)
        # the ring buffer's dtype drives the packed width: stats-free
        # buckets under 32Kbp use uint16 rings (every packed value — spans,
        # flag words without medians, mismatch records — fits 16 bits),
        # halving the fetched bytes
        if outbuf.dtype != packed_out.dtype:
            packed_out = packed_out.astype(outbuf.dtype)
        # outbuf is NOT donated: XLA materializes a fresh copy per call, so
        # the previous group's buffer stays fetchable while the next batch
        # dispatches (device-side copy of ~1-2MB is negligible)
        outbuf = jax.lax.dynamic_update_slice(
            outbuf, packed_out[None], (slot, jnp.int32(0), jnp.int32(0)))
        return out, outbuf

    if not with_stats:
        def fast_nostats(outbuf, slot, packed_in, L):
            _, outbuf = core(outbuf, slot, packed_in, L)
            return outbuf
        return fast_nostats, stages

    SL = global_stat_len()

    def fast(state, outbuf, slot, packed_in, L):
        out, outbuf = core(outbuf, slot, packed_in, L)
        post = _flat_partial(out["posts"][0], SL)
        for p in out["posts"][1:]:
            post = post + _flat_partial(p, SL)
        # stack broadcasts against state of [2, F] (single device) or
        # [1, 2, F] (the per-device shard seen inside shard_map)
        state = state + jnp.stack([_flat_partial(out["pre"], SL), post])
        return state, outbuf

    return fast, stages


def build_fast_step(opt, with_stats=True):
    """Single-device jitted fast step (see make_fast_fn for the contract).
    The trailing L argument is static."""
    fast, stages = make_fast_fn(opt, with_stats)
    if not with_stats:
        return jax.jit(fast, static_argnums=3), stages
    return jax.jit(fast, static_argnums=4, donate_argnums=0), stages


def out_fields(opt):
    """Number of int32 columns per read in the packed output row."""
    cap = out_cap(opt)
    return 5 + cap * 6 + len(adapter_stages(kernel_params(opt)))


def out_dtype(L, with_stats):
    """Ring-buffer dtype for one bucket.  Stats-free rows carry no median
    bytes (the host fills them), so for buckets <= 32Kbp every column fits
    uint16: spans/trims <= L, flags/misc < 2^11, region counts <= L/2,
    adapter records <= 640.  With-stats rows embed 8-bit medians at bit
    offsets 8/11 and need int32."""
    import numpy as np
    return np.uint16 if (not with_stats and L <= (1 << 15)) else np.int32


# --------------------------------------------------------------------------
# Process-wide step cache.  jax.jit instances created per-Runner would each
# re-trace and re-compile every bucket shape (2-20s per shape through the
# device tunnel); the kernel graph depends only on the static kernel params,
# so compiled steps are shared across Runner instances keyed by them.
# --------------------------------------------------------------------------

def _freeze(v):
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


_step_cache = {}
import threading as _threading
_step_cache_lock = _threading.Lock()


def get_fast_step(opt, mesh=None, with_stats=True):
    """Cached build_fast_step (or its sharded variant when mesh is given).
    with_stats=False is the stats-free variant (monster batches, host-
    statistics mode) — no state carry; available for both paths."""
    key = (_freeze(kernel_params(opt)), mesh, with_stats, global_stat_len())
    with _step_cache_lock:   # runner prewarm threads race the main thread
        if key not in _step_cache:
            if mesh is None:
                _step_cache[key] = build_fast_step(opt, with_stats)
            else:
                from .sharding import build_fast_sharded_step
                _step_cache[key] = build_fast_sharded_step(
                    opt, mesh, with_stats=with_stats)
        return _step_cache[key]
