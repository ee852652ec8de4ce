"""Single-file processing pipeline: host IO around the device kernel chain.

Replaces the reference's thread pipeline (1 reader + N workers + writers,
src/seprocessor.cpp:65-172) with:

    host stream-parse -> padded batches -> jitted device step -> host apply

Output records are reconstructed from the ORIGINAL record bytes using the
device-computed spans — bases never round-trip through the device, so
output equality with the reference is structural, not numeric.
"""

import sys
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FuturesTimeout

import numpy as np
import jax

from ..common import PASS_FILTER, FAILED_TYPES, stat_device_cap
from ..io.fastq import FastqStreamReader
from ..io.writer import make_output_writer
from ..stats import Stats
from ..filter_result import FilterResult
from ..common import FETCH_GROUP
from ..util import loginfo, DaemonExecutor
from .batches import BatchBuilder, bucket_groups
from .device import get_fast_step, out_cap, out_fields, TAG_NONE, \
    TAG_SPLIT_LEFT, TAG_SPLIT_RIGHT
from .fast_runner import PackedResults, DeviceStats


class StageTimer:
    """Wall-time accounting per pipeline stage (main thread only).

    The reference has no per-stage timing at all (main.cpp:298-303 is one
    end-to-end clock); this exists to make the host side of the pipeline
    diagnosable — bench.py publishes the breakdown.
    """

    def __init__(self):
        import threading
        self.seconds = {}
        self.counts = {}
        self._lock = threading.Lock()  # worker threads report too

    def add(self, stage, dt, n=1):
        with self._lock:
            self.seconds[stage] = self.seconds.get(stage, 0.0) + dt
            self.counts[stage] = self.counts.get(stage, 0) + n

    def report(self):
        return {k: round(v, 4) for k, v in sorted(self.seconds.items())}

_NL = b"\n"
_TAG_BYTES = {TAG_SPLIT_LEFT: b"split-by-adapter-left-",
              TAG_SPLIT_RIGHT: b"split-by-adapter-right-"}

import os as _os

# buckets already warm in THIS process (resident daemon: loads are
# per-process and survive across jobs) — see _prewarm_bucket
_PROCESS_WARMED = set()

# (L, B, w) stream-feed unpack shapes already loaded in this process:
# _feed_input streams a batch through an UNwarmed shape only when shapes
# amortize (daemon-resident) — a one-shot run falls back to the padded
# feed for it instead of stalling on an on-demand program load
_WARM_STREAM_SHAPES = set()

# True once THIS process has performed a device->host fetch (the
# permanent per-process first-d2h regime flip has been paid).  Purely
# diagnostic: eager post-flip drains were tried and measured WORSE (see
# the note in pipeline/link.py — the tunnel serializes directions), so
# the deferred-EOF schedule applies regardless.
_PROCESS_FLIPPED = [False]
_EMIT_FALLBACK = _os.environ.get("FASTPLONG_EMIT_FALLBACK", "") == "1"

_SLOT_FIELDS = ("out_lo", "out_hi", "out_tag", "region_no", "is_parent",
                "mask_lo", "mask_hi", "code", "passed")


def _fetch_np(arr, slice_bytes=12 << 20):
    """d2h with very-large transfers sliced — tunneled links collapse
    above ~16MB per transfer, so stay under the policy's slice size while
    minimizing fetch count (fast links pass an effectively-unbounded
    slice, LinkPolicy.fetch_slice)."""
    nbytes = arr.size * arr.dtype.itemsize
    if nbytes <= slice_bytes:
        return np.asarray(arr)
    flat = arr.reshape(-1)
    step = slice_bytes // arr.dtype.itemsize
    out = np.concatenate([np.asarray(flat[i:i + step])
                          for i in range(0, flat.shape[0], step)])
    return out.reshape(arr.shape)


class BlockResults:
    """Per-record result arrays for one RecordBlock."""

    def __init__(self, n, cap):
        self.cap = cap
        self.lo = np.zeros(n, np.int32)
        self.hi = np.zeros(n, np.int32)
        self.null = np.zeros(n, bool)
        self.n_out = np.zeros(n, np.int32)
        self.out_lo = np.zeros((n, cap), np.int32)
        self.out_hi = np.zeros((n, cap), np.int32)
        self.out_tag = np.zeros((n, cap), np.int32)
        self.region_no = np.zeros((n, cap), np.int32)
        self.is_parent = np.zeros((n, cap), bool)
        self.mask_lo = np.zeros((n, cap), np.int32)
        self.mask_hi = np.zeros((n, cap), np.int32)
        self.active = np.zeros((n, cap), bool)
        self.code = np.zeros((n, cap), np.int32)
        self.passed = np.zeros((n, cap), bool)

    def scatter_rows(self, indices, out, rows):
        """Scatter batch rows `rows` into block records `indices`."""
        for name in ("lo", "hi", "null", "n_out", "active") + _SLOT_FIELDS:
            getattr(self, name)[indices] = getattr(out, name)[rows]


class SingleEndRunner:
    # pipeline depth overrides (class-level so stress tests can pin them);
    # None = the probed/adaptive LinkPolicy decides (pipeline/link.py):
    # combined fetches allowed in flight; held-block low watermark (kick a
    # background fetch) and high watermark (block until drained); batches
    # pending before the first early fetch.  On tunneled interconnects
    # the watermarks are deep (the FIRST d2h permanently degrades dispatch
    # latency ~25x there, so deferring it as long as host memory allows
    # keeps the whole dispatch phase fast); on direct-attached links they
    # are shallow and fetches are eager.  Env pins (FASTPLONG_FLUSH_BLOCKS
    # etc.) live in LinkPolicy.
    MAX_IN_FLIGHT = None
    FLUSH_BLOCKS = None
    MAX_BLOCKS_PENDING = None
    EARLY_FETCH_BYTES = None

    def __init__(self, opt, mesh=None):
        self.opt = opt
        self.pre_stats = Stats(is_rna=opt.is_rna)
        self.post_stats = Stats(is_rna=opt.is_rna)
        self.filter_result = FilterResult()
        if mesh is None and getattr(opt, "devices", 1) > 1:
            from .sharding import make_mesh
            devs = jax.devices()
            if len(devs) < opt.devices:
                from ..util import error_exit
                error_exit("--devices %d requested but only %d device(s) "
                           "available" % (opt.devices, len(devs)))
            mesh = make_mesh(devs[:opt.devices])
        self.mesh = mesh
        if mesh is not None:
            from .sharding import MeshPlacement
            self.placement = MeshPlacement(mesh)
        else:
            self.placement = None
        self.step, self.stages = get_fast_step(opt, mesh)
        self.n_fields = out_fields(opt)
        self.cap = out_cap(opt)
        self.mask_enabled = opt.mask.enabled
        self.device_stats = DeviceStats(self.placement)
        # monster-read path: buckets beyond the device stat cap run a
        # stats-free step (their stats are computed on the host from the
        # original bytes — reference analog: dynamically-grown per-cycle
        # buffers, stats.cpp:75-119)
        self.stat_cap = stat_device_cap()
        self._nostats_step = {}
        from .host_stats import HostStatAccumulator
        self._host_pre = HostStatAccumulator()
        self._host_post = HostStatAccumulator()
        # host-statistics mode (--stats_backend host): every bucket runs
        # the stats-free device step; statRead happens here in one native
        # pass per batch.  Pays ~10ms/batch of host time to avoid shipping
        # the stat accumulators over the device link — the right trade on
        # hosts with weak links (single-device only; the mesh path keeps
        # per-device partials).
        backend = getattr(opt, "stats_backend", "auto")
        tunneled = None
        if backend == "auto":
            # host statRead wins when device results cross a weak tunneled
            # link (the stat accumulators are ~87% of fetched bytes);
            # device accumulators win on directly-attached hardware where
            # d2h is PCIe and host CPU is the scarcer resource.
            tunneled = self._sniff_tunneled()
            backend = "host" if tunneled else "device"
        self.host_stats_mode = backend == "host"
        # interconnect policy: watermark depths / early-fetch / d2h slice
        # come from the probed+adaptive LinkPolicy; when the platform is
        # not known yet (forced stats backend: nothing has touched jax),
        # the sniff runs on the prewarm pool below so backend init never
        # blocks the reader
        from .link import LinkPolicy
        self.link = LinkPolicy(tunneled)
        # fetch watchdog: if a device->host result fetch stalls beyond
        # FASTPLONG_FETCH_TIMEOUT seconds (0 disables; the dev tunnel's
        # documented worst weather wedges d2h for tens of minutes), the
        # runner permanently falls back to computing batches on the host
        # — bounded completion under ANY interconnect state, byte-
        # identical output (the kernels are integer-exact on every
        # backend).  Armed in EVERY mode: when statistics state lives on
        # the now-unreachable device (device-stats or mesh mode), its
        # contributions are recomputed on the host from a re-read of the
        # input (_recover_device_stats); a non-re-readable stream input
        # in that situation fail-louds instead (the reference's bar:
        # error_exit, never an uncontrolled crash or hang, util.h:270).
        # 300s default: a COLD first fetch can legitimately sit behind
        # several 3-17s program loads plus a degraded-mode transfer (the
        # round-4 bench saw a healthy 176s cold pass tripped at 120s);
        # a real wedge still resolves in bounded time
        self.fetch_timeout = float(
            _os.environ.get("FASTPLONG_FETCH_TIMEOUT", "300"))
        self._fallback = False
        self._watchdog = self.fetch_timeout > 0
        # per-batch global read indices whose statistics live ONLY in the
        # device-resident accumulator (appended at dispatch; consulted by
        # the watchdog recovery) — device-stats modes only
        self._dev_statted = []
        # async dispatch: h2d transfer + device step dispatch run on a
        # single dedicated thread (reference analog: the reader thread
        # hands packs off and keeps reading, seprocessor.cpp:331-429), so
        # the main thread's parse/pack/emit overlaps the link.  One worker
        # keeps ring-slot order; flushes synchronize before slicing rings.
        self._disp_futs = deque()    # (future, batch) since last sync
        self._bucket_submits = {}    # bucket L -> submits since last flush
        self._disp_lock = threading.Lock()
        self._disp_sealed = False    # set by the watchdog fallback
        if self.host_stats_mode:
            self._init_host_stats()
        self.out_writer = None
        self.failed_writer = None
        self.timer = StageTimer()
        # transfer accounting (bench.py publishes these so regressions can
        # be separated from link weather): bytes moved each way + the
        # first-call wall per bucket shape (executable load time)
        self.bytes_h2d = 0
        self.bytes_d2h = 0
        self.load_seconds = {}
        # per-drain-part log: (bytes, slice_s, queue_wait_s, transfer_s)
        self._fetch_log = []
        # executable prewarm: the first call per bucket shape costs
        # seconds through a tunneled interconnect (compile-cache load +
        # device program load), so a thread pool warms each bucket's step
        # on throwaway device-resident buffers as soon as the bucket is
        # first seen — the dominant bucket's load still blocks its own
        # first dispatch, but every other bucket's load hides behind it.
        # NOTE deliberately NO eager d2h warm-up: measured on the tunnel,
        # a d2h at t=0 degrades the process's transfer mode before the
        # program loads run (15s vs 3s for the first load); the tunnel
        # schedule defers the first fetch to the EOF drain entirely
        # (LinkPolicy.early_fetch_bytes), where the background fetcher
        # absorbs the first-d2h penalty.
        self._warm_pool = None
        self._warmed = set()
        # process-global warm memo key: which loaded executables this
        # config's buckets resolve to (see _prewarm_bucket)
        from .device import kernel_params, _freeze
        self._warm_memo_key = (_freeze(kernel_params(opt)),
                               self.host_stats_mode)
        if (_os.environ.get("FASTPLONG_PREWARM", "1") == "1"
                and self.placement is None):
            # daemon workers: a load wedged inside a dead tunnel must not
            # hang interpreter exit (util.DaemonExecutor)
            self._warm_pool = DaemonExecutor(6, "prewarm")
            # the platform gate runs ON the pool: jax.devices() triggers
            # backend init (1.5-4.5s through a tunnel) and must not block
            # the reader; prewarm tasks wait on it and no-op on CPU
            self._warm_gate = self._warm_pool.submit(self._platform_ok)
        if tunneled is None:
            if self._warm_pool is not None:
                self._warm_pool.submit(
                    lambda: self.link.set_tunneled(self._sniff_tunneled()))
            else:
                self.link.set_tunneled(self._sniff_tunneled())

    def _init_host_stats(self):
        """Host-statistics accumulators + the pre-statRead worker.  Called
        at init in host-stats mode, or mid-run when the watchdog fallback
        abandons device-resident statistics state."""
        from .host_stats import BatchStatAccumulator
        from .device import global_stat_len
        # sized to the LARGEST non-monster bucket: spans up to that
        # length are fed to the native pass (which also clamps)
        SL = global_stat_len()
        self._batch_pre = BatchStatAccumulator(SL)
        self._batch_post = BatchStatAccumulator(SL)
        # the pre-statRead pass runs on its own worker: it owns
        # _batch_pre exclusively (post owns _batch_post on the main
        # thread) and the native call releases the GIL, so the two
        # passes genuinely overlap; pre_medians become futures
        self._stats_pool = ThreadPoolExecutor(max_workers=1)

    @staticmethod
    def _platform_ok():
        try:
            return jax.devices()[0].platform != "cpu"
        except Exception:
            return False

    @staticmethod
    def _sniff_tunneled():
        """True when the device is reached through a tunneled interconnect
        (the axon plugin's devices report platform 'tpu'; the plugin name
        only shows in the client's platform_version string)."""
        try:
            ver = getattr(jax.devices()[0].client, "platform_version", "")
        except Exception:
            ver = ""
        return "axon" in ver

    # ---- pipeline depth knobs: class-attr override (tests) else policy
    def _kn_max_in_flight(self):
        c = type(self).MAX_IN_FLIGHT
        return c if c is not None else self.link.max_in_flight

    def _kn_flush_blocks(self):
        c = type(self).FLUSH_BLOCKS
        v = c if c is not None else self.link.flush_blocks
        # host-stats mode retains packed feeds (~2x the block's parsed
        # bytes) until drain, so the same memory budget covers ~1/3 as
        # many blocks
        return max(2, v // 3) if self.host_stats_mode else v

    def _kn_max_blocks_pending(self):
        c = type(self).MAX_BLOCKS_PENDING
        v = c if c is not None else self.link.max_blocks_pending
        return max(3, v // 3) if self.host_stats_mode else v

    def _kn_early_fetch_bytes(self):
        c = type(self).EARLY_FETCH_BYTES
        return c if c is not None else self.link.early_fetch_bytes

    def _prewarm_bucket(self, L):
        """Load (compile-cache hit) the step executable for bucket L by
        running it once on device-resident zeros; runs on a warm-pool
        thread, concurrent with other loads and with host parsing.

        Process-global memo: device program loads are per-process, so a
        resident daemon's 2nd+ jobs would otherwise re-dispatch a warm-up
        step per bucket per job — pure device-queue waste (measured
        0.03-9s each through the tunnel)."""
        key = (self._warm_memo_key, L, self.link.stream_feed)
        if key in _PROCESS_WARMED:
            return
        try:
            if not self._warm_gate.result():
                return
            import jax.numpy as jnp
            from .batches import batch_rows
            from .device import init_stats_state, global_stat_len, out_dtype
            from ..common import FETCH_GROUP
            t0 = time.perf_counter()
            monster = L > self.stat_cap
            nostats = monster or self.host_stats_mode
            B = batch_rows(L)
            outbuf = jnp.zeros((FETCH_GROUP, B, self.n_fields),
                               out_dtype(L, not nostats))
            packed = jnp.zeros((B, L + 8), jnp.uint8)
            if self.link.stream_feed:
                # warm the likely stream-feed shapes too (w quantized to
                # eighths of the payload; FULL batches land on 5/8..8/8
                # since bucket growth bounds fill ≥ 2/3) — each is a tiny
                # program, loaded off-clock
                from .device import unpack_stream, stream_quantum
                stp = stream_quantum(B, L)
                for k in range(1, 9):
                    # ALL quantized widths, not just the 5/8..8/8 a full
                    # batch lands on: EOF partials quantize to any k, and
                    # an unwarmed shape either stalls the feed on a
                    # 0.5-9s on-demand program load (daemon children,
                    # which stream unconditionally) or falls back to the
                    # padded feed (resident runs) — each k is a tiny
                    # program, loaded off-clock here
                    w = k * stp
                    if w < B * (L + 8):
                        jax.block_until_ready(unpack_stream(
                            jnp.zeros(w, jnp.uint8), L, B))
                        _WARM_STREAM_SHAPES.add((L, B, w))
            if nostats:
                r = self._get_nostats_step()(outbuf, np.int32(0), packed, L)
            else:
                state = init_stats_state(global_stat_len())
                r = self.step(state, outbuf, np.int32(0), packed, L)
            jax.block_until_ready(r)
            dt = time.perf_counter() - t0
            self.load_seconds[L] = round(dt, 3)
            self.link.observe_load(dt)
            _PROCESS_WARMED.add(key)
        except Exception:
            pass

    def _get_nostats_step(self, mesh=None):
        """Stats-free step; mesh=None is the single-device variant used
        by monster batches even in mesh mode."""
        key = mesh is not None
        if self._nostats_step.get(key) is None:
            self._nostats_step[key] = get_fast_step(
                self.opt, mesh=mesh, with_stats=False)[0]
        return self._nostats_step[key]

    # ------------------------------------------------------------------ run

    def run(self):
        opt = self.opt
        if opt.split.enabled:
            # split mode: per-thread rotating writers, no failed_out
            # (reference skips initOutput, seprocessor.cpp:66-67)
            from .split import SplitWriterSet
            self.split_set = SplitWriterSet(opt)
        else:
            self.split_set = None
            if opt.failed_out:
                self.failed_writer = make_output_writer(
                    opt.failed_out, opt.compression,
                    buffer_size=opt.writer_buffer_size)
            if opt.out or opt.output_to_stdout:
                self.out_writer = make_output_writer(
                    opt.out, opt.compression,
                    stdout=opt.output_to_stdout,
                    buffer_size=opt.writer_buffer_size)

        reader = FastqStreamReader(
            "/dev/stdin" if opt.input_from_stdin and not opt.in_file
            else opt.in_file,
            byte_range=getattr(opt, "byte_range", None))
        if opt.verbose:
            loginfo("start to load data")

        processed = 0
        last_reported = 0
        # cross-block batching: builders accumulate reads per length bucket
        # until a batch fills; per-block completion tracking keeps output in
        # input order even though batches mix blocks
        self._builders = {}
        self._block_queue = []   # [block, BlockResults, outstanding_reads]
        self._in_flight = []     # (batches_of_group, future of [K,B,F])
        self._pending_batches = 0
        self._pending_feed_bytes = 0
        # a single fetch thread pulls results to host in the background so
        # d2h transfers overlap packing/dispatch on the main thread; daemon
        # worker so a fetch wedged in a dead tunnel (watchdog fired and
        # abandoned it) cannot hang interpreter exit
        self._fetcher = DaemonExecutor(1, "fetcher")
        # ...and a single dispatch thread pushes feeds to the device so
        # h2d transfers + per-op dispatch latency overlap parse/pack/emit
        self._dispatcher = DaemonExecutor(1, "dispatcher")
        timer = self.timer
        t_run0 = time.perf_counter()
        while True:
            t0 = time.perf_counter()
            block = reader.next_block()
            timer.add("read_parse", time.perf_counter() - t0)
            if block is None:
                break
            if opt.reads_to_process > 0:
                remaining = opt.reads_to_process - processed
                if remaining <= 0:
                    break
                if block.n > remaining:
                    block = _truncate_block(block, remaining)
            processed += block.n
            if opt.verbose and processed >= last_reported + 1000000:
                last_reported = processed
                loginfo("loaded %dM reads" % (last_reported // 1000000))
            # surface writer-thread failures (disk full) promptly instead of
            # on the next write, which may be minutes away
            if self.out_writer is not None:
                self.out_writer.check()
            if self.failed_writer is not None:
                self.failed_writer.check()
            self._block_queue.append(
                [block, BlockResults(block.n, self.cap), block.n])
            for L, take in bucket_groups(block):
                if L not in self._warmed:
                    self._warmed.add(L)
                    if self._warm_pool is not None:
                        self._warm_pool.submit(self._prewarm_bucket, L)
                # monster buckets bypass the mesh (single-device stats-free
                # step), so they don't need shard-divisible row counts.
                # NOT setdefault(L, BatchBuilder(L)): that would construct
                # (and memset) a full padded buffer per block even on hits
                b = self._builders.get(L)
                if b is None:
                    b = self._builders[L] = BatchBuilder(
                        L, self.placement.n
                        if self.placement and L <= self.stat_cap else 1)
                pos = 0
                while pos < len(take):
                    k = min(b.space, len(take) - pos)
                    t0 = time.perf_counter()
                    b.add(block, take[pos:pos + k])
                    timer.add("pack", time.perf_counter() - t0, k)
                    pos += k
                    if b.full:
                        self._dispatch(b.take_batch())
            # opportunistic drain (fast links only): a completed
            # background fetch is consumed NOW (non-blocking) so
            # accumulate/emit/writes stream through the run — otherwise a
            # single in-flight group can sit fetched-but-unconsumed until
            # EOF and the whole output bunches into writer_close
            # (observed: 4s of serial disk writes at close on a 128MB
            # output).  NOT on tunnels: repeated early d2h flips the
            # process into the degraded-dispatch mode (~30ms/op, ~3MB/s
            # effective h2d — measured 37s of dispatch_wait vs 0.1s)
            while (self.link.eager_drain and self._in_flight
                   and self._in_flight[0][1][-1].done()
                   and not self._fallback):
                self._drain_one()
            # held-block watermarks bound host memory while keeping d2h
            # round trips rare and big: at the LOW mark kick one combined
            # background fetch (overlaps further parsing); at the HIGH
            # mark block until everything drains and emits.  Read from
            # the LinkPolicy each iteration — observed fetch bandwidth
            # adapts the depths mid-run.
            if (len(self._block_queue) >= self._kn_flush_blocks()
                    and not self._in_flight):
                self._flush_pending_groups()
            if len(self._block_queue) > self._kn_max_blocks_pending():
                while self._in_flight:
                    self._drain_one()
                if len(self._block_queue) > self._kn_max_blocks_pending():
                    self._flush_pending_groups()
                    while self._in_flight:
                        self._drain_one()
                if len(self._block_queue) > self._kn_max_blocks_pending():
                    # reads stuck in partially-filled builders (sparse
                    # length buckets) head-of-line-block the queue:
                    # dispatch the partial batches so their blocks can
                    # complete — padding waste beats unbounded memory
                    for b in self._builders.values():
                        if b.count:
                            self._dispatch(b.take_batch())
                    self._flush_pending_groups()
                    while self._in_flight:
                        self._drain_one()
        for b in self._builders.values():
            if b.count:
                self._dispatch(b.take_batch())
        self._flush_pending_groups(final=True)
        while self._in_flight:
            self._drain_one()
        assert not self._block_queue, "incomplete blocks at EOF"
        # after a watchdog fallback the fetch/dispatch workers may be
        # wedged inside the device plugin — don't wait on them (daemon
        # threads, process can exit regardless)
        self._fetcher.shutdown(wait=not self._fallback)
        self._dispatcher.shutdown(wait=not self._fallback)
        if self._warm_pool is not None:
            self._warm_pool.shutdown(wait=False)
        reader.close()
        timer.add("total_loop", time.perf_counter() - t_run0, processed)

        t0 = time.perf_counter()
        if self.split_set is not None:
            self.split_set.close()
        if self.out_writer:
            self.out_writer.close()
        if self.failed_writer:
            self.failed_writer.close()
        timer.add("writer_close", time.perf_counter() - t0)

        t0 = time.perf_counter()
        ds = self.device_stats
        if (self._watchdog and not self._fallback and ds.state is not None
                and ds.stat_batches):
            # mesh mode drains its per-device stat partials here (single-
            # device mode rode them along in the final combined drain):
            # bound this last fetch too — a wedge at the finish line must
            # not hang the run (the recovery recomputes everything)
            fin = DaemonExecutor(1, "finish-drain")
            fut = fin.submit(ds.finish)
            try:
                pre_parts, post_parts = fut.result(
                    timeout=self.fetch_timeout)
            except FuturesTimeout:
                self._enter_fallback([], reason="statistics drain")
                pre_parts, post_parts = ds.finish()
            fin.shutdown(wait=not self._fallback)
        else:
            pre_parts, post_parts = ds.finish()
        for part in pre_parts:
            self.pre_stats.add_device_partial(part)
        for part in post_parts:
            self.post_stats.add_device_partial(part)
        if self._host_pre.partial() is not None:
            self.pre_stats.add_device_partial(self._host_pre.partial())
        if self._host_post.partial() is not None:
            self.post_stats.add_device_partial(self._host_post.partial())
        if self.host_stats_mode:
            self._stats_pool.shutdown(wait=True)
            p = self._batch_pre.partial()
            if p is not None:
                self.pre_stats.add_device_partial(p)
            p = self._batch_post.partial()
            if p is not None:
                self.post_stats.add_device_partial(p)

        self.pre_stats.summarize()
        self.pre_stats.calc_length_histogram()
        self.post_stats.summarize()
        self.post_stats.calc_length_histogram()
        self.timer.add("stats_finish", time.perf_counter() - t0)
        if opt.verbose:
            loginfo("stage seconds: %s" % self.timer.report())
        return self.pre_stats, self.post_stats, self.filter_result

    # ---------------------------------------------------------------- block

    def _maybe_trim_partial(self, batch):
        """Row-trim a partially-filled batch to a quantized prefix (fast
        links only): the step otherwise computes the bucket's FULL padded
        rows, which dominates small runs and EOF tails — measured on the
        CPU backend, untrimmed EOF partials tripled the work of a
        16-Mbase input.  Not on tunnels: every new (L, rows) shape costs
        a 0.5-17s device program load there (LinkPolicy.trim_partials)."""
        if not self.link.partial_trim_ok():
            return
        n = int(batch.read_mask.sum())
        full = batch.packed.shape[0]
        q = 64
        while q < n:
            q *= 2
        if self.placement is not None and batch.L <= self.stat_cap:
            ns = self.placement.n
            q = ((q + ns - 1) // ns) * ns
        if q >= full:
            return
        batch.packed = batch.packed[:q]
        batch.lens = batch.lens[:q]
        batch.read_mask = batch.read_mask[:q]

    def _dispatch(self, batch):
        if self._fallback:
            self._maybe_trim_partial(batch)
            return self._dispatch_fallback(batch)
        self._maybe_trim_partial(batch)
        t0 = time.perf_counter()
        monster = batch.L > self.stat_cap
        self.bytes_h2d += batch.packed.nbytes
        if self.host_stats_mode and not monster:
            # pre-statRead in one native pass on the stats worker,
            # overlapped with the async device dispatch AND with this
            # thread's packing; packed stays alive for the post pass at
            # drain time
            batch.pre_medians = self._stats_pool.submit(
                self._timed_pre_rows, batch)
        self._disp_futs.append(
            (self._dispatcher.submit(self._device_dispatch, batch), batch))
        self._pending_batches += 1
        self._pending_feed_bytes += batch.packed.nbytes
        k = self._bucket_submits.get(batch.L, 0) + 1
        self._bucket_submits[batch.L] = k
        self.timer.add("dispatch_submit", time.perf_counter() - t0)
        if k >= FETCH_GROUP:
            # a full ring forces a drain; take every bucket's pending
            # batches along in the same single transfer (fetch count is
            # the scarce resource, not bytes)
            self._flush_pending_groups()
        elif (not self._in_flight
              and self._pending_feed_bytes >= self._kn_early_fetch_bytes()):
            # byte-based trigger: the first d2h flips a tunneled process
            # into its degraded-dispatch mode, so it is deferred until a
            # fixed VOLUME has dispatched (not a batch count — smaller
            # buckets would fire it early and extend the degraded phase)
            self._flush_pending_groups()
        while len(self._in_flight) > self._kn_max_in_flight():
            self._drain_one()

    def _device_dispatch(self, batch):
        """Runs on the single dispatcher thread: h2d transfer + device
        step dispatch, serialized (ring-slot order) but overlapped with
        the main thread's parse/pack/emit.  Returns True once the batch
        is queued on its bucket's ring; False if the watchdog sealed the
        run first — the batch then belongs to the fallback replay set
        (_enter_fallback)."""
        if self._fallback:
            return False
        t0 = time.perf_counter()
        monster = batch.L > self.stat_cap
        nostats = monster or self.host_stats_mode
        sharded = self.placement is not None and not monster
        bs = self.device_stats.bucket(batch.L, batch.full_rows,
                                      self.n_fields, with_stats=not nostats,
                                      sharded=sharded)
        slot = np.int32(len(bs.pending))
        if nostats:
            # stats-free device step: monster buckets (stats per-read on
            # host) and host-statistics mode (stats per-batch at drain);
            # monster batches also bypass the mesh — 1-few rows would
            # waste N-1 shards
            if sharded:
                xin = self.placement.put_input(batch.packed)
                step = self._get_nostats_step(self.mesh)
            else:
                xin = self._feed_input(batch)
                step = self._get_nostats_step()
            bs.outbuf = step(bs.outbuf, slot, xin, batch.L)
        else:
            xin = (self.placement.put_input(batch.packed) if self.placement
                   else self._feed_input(batch))
            state = self.device_stats.ensure_state()
            state, bs.outbuf = self.step(state, bs.outbuf, slot, xin,
                                         batch.L)
            self.device_stats.state = state
            # record which reads this put into the device-resident
            # accumulator: on a watchdog trip that state is unreachable
            # and these contributions are recomputed host-side
            # (_recover_device_stats; replayed batches are subtracted)
            self._dev_statted.append(np.concatenate(
                [seg.block.first_index + np.asarray(seg.indices, np.int64)
                 for seg in batch.segments]))
            self.device_stats.note_batch(batch.L, int(batch.lens.max()))
        if not (self.host_stats_mode and not monster):
            batch.packed = None  # release the host-side feed buffer
        with self._disp_lock:
            # seal check + append must be atomic: a dispatch that
            # unwedges AFTER the fallback replayed the pending lists must
            # not add to them (it would be processed twice).  The _queued
            # flag is set IN the same critical section: _enter_fallback
            # classifies replay candidates by it (a future can lag its
            # task's append, so fut.done() would double-count the batch —
            # once replayed, once drained from bs.pending).
            if self._disp_sealed:
                return False
            batch._queued = True
            bs.pending.append(batch)
        self.timer.add("dispatch", time.perf_counter() - t0)
        return True

    def _feed_input(self, batch):
        """Device-resident packed feed for one non-mesh batch: the
        stream feed (exact payload bytes, rebuilt to padded rows on
        device — device.build_stream/unpack_stream) when the policy
        enables it and the batch qualifies (b5 layout — padding rows
        carry len 0, so partial batches stream exactly like full ones),
        else a direct h2d of the padded rows."""
        if self.link.stream_feed and batch.layout == "b5":
            from .device import build_stream, unpack_stream
            stream = build_stream(batch.packed, batch.L)
            if stream is not None and (
                    (batch.L, batch.packed.shape[0], stream.shape[0])
                    in _WARM_STREAM_SHAPES
                    or _os.environ.get("FASTPLONG_DAEMON_CHILD") == "1"):
                # stream only through an already-loaded unpack shape
                # (prewarm covers every full-batch shape); a process
                # where shapes amortize (daemon-resident) streams
                # everything — an unwarmed shape's on-demand program
                # load would otherwise stall a one-shot run's EOF
                # partials for 0.5-9s each
                self.bytes_h2d += stream.nbytes - batch.packed.nbytes
                return unpack_stream(jax.numpy.asarray(stream), batch.L,
                                     batch.packed.shape[0])
        return jax.numpy.asarray(batch.packed)

    def _sync_dispatch(self):
        """Block until every submitted device dispatch has executed —
        ring slots and pending lists are then consistent for a flush.
        Re-raises dispatcher-task exceptions.  After a watchdog fallback
        the futures may never complete (wedged plugin) and their batches
        were already claimed for replay — skip them.

        With the watchdog armed the wait is BOUNDED: a wedge inside
        h2d/dispatch (not just d2h) enters the host fallback instead of
        hanging the run forever, mirroring _drain_one."""
        if not self._disp_futs:
            return
        t0 = time.perf_counter()
        while self._disp_futs:
            if self._fallback:
                self._disp_futs.popleft()
                continue
            # peek, don't pop: on a watchdog trip _enter_fallback must
            # still see this batch to classify it for replay
            fut, _ = self._disp_futs[0]
            try:
                fut.result(timeout=self.fetch_timeout
                           if self._watchdog else None)
            except FuturesTimeout:
                self.timer.add("dispatch_wait", time.perf_counter() - t0)
                self._enter_fallback([t for t, _ in self._in_flight],
                                     reason="device dispatch")
                return
            if self._disp_futs and self._disp_futs[0][0] is fut:
                self._disp_futs.popleft()
        self.timer.add("dispatch_wait", time.perf_counter() - t0)

    def _flush_pending_groups(self, final=False):
        """Flush every bucket's pending batches as one drain EVENT.

        Each part is a ring slice quantized to power-of-2 slot and row
        counts: exact-size slices would mint a new slice executable per
        distinct (slots, rows) pair — each costing a 0.5-2s program load
        through a tunneled interconnect — while quantization keeps the
        shape set tiny and persistent-cache-stable at <= 2x the optimal
        bytes.  The fetcher thread then pulls the parts back-to-back (no
        device-side concatenation: that too would compile per shape
        combination).  The end-of-input drain (final=True) rides the
        statistics state along as one more part."""
        self._sync_dispatch()
        self._bucket_submits.clear()
        t_flush0 = time.perf_counter()
        groups = []   # (tag, device_array) pairs, fetched in order
        nbytes = 0

        def q2(v, cap):
            p = 1
            while p < v:
                p *= 2
            return min(p, cap)

        for bs in self.device_stats.buckets.values():
            if not bs.pending:
                continue
            pending, bs.pending = bs.pending, []
            n = len(pending)
            buf = bs.outbuf
            K, B = buf.shape[0], buf.shape[1]
            used = 0
            for b in pending:
                ends = [s.row_start + len(s.indices) for s in b.segments]
                total = sum(len(s.indices) for s in b.segments)
                # BatchBuilder fills rows as a contiguous prefix from row
                # 0; _consume_batch's trim relies on it (ADVICE r2)
                assert max(ends) == total, "batch rows are not a prefix"
                used = max(used, min(B, total))
            if getattr(self.link, "fetch_full_ring", False):
                # stable-slice drain: power-of-2 slot count x FULL rows.
                # The slice shape set per bucket is then just the 5 kq
                # values, all pre-loaded during a pool worker's warm-up
                # (daemon._pretrace) so no program load lands on the job
                # clock.  Full rows cost nothing extra on full slots and
                # only pad the EOF-tail slot; d2h bytes stay near the
                # exact-slice amount (unlike a whole-ring fetch, which
                # 8x'd the drain and stalled in degraded-d2h weather).
                kq = q2(n, K)
                groups.append((pending, (buf, kq, B, K, B)))
                nbytes += kq * B * buf.shape[2] * buf.dtype.itemsize
                continue
            kq = q2(n, K)
            if bs.sharded:
                # mesh ring: quantize rows to whole shards so the slice
                # keeps the sharding (no reshard collective, no data
                # movement — slot trimming already cut the bulk)
                sr = max(1, B // self.placement.n)
                uq = min(B, ((used + sr - 1) // sr) * sr)
            else:
                uq = q2(used, B)
            # the slice itself happens on the FETCHER thread: a first-seen
            # (kq, uq) shape's slice executable costs a program load on
            # tunneled links, which must not block the dispatch loop
            groups.append((pending, (buf, kq, uq, K, B)))
            nbytes += kq * uq * buf.shape[2] * buf.dtype.itemsize
        ds = self.device_stats
        if (final and ds.placement is None and ds.state is not None
                and ds.stat_batches):
            st = ds.trimmed_state()
            groups.append(("stats", st))
            nbytes += st.size * st.dtype.itemsize
            ds.state = None
            ds.stat_batches = 0
        self._pending_batches = 0
        self._pending_feed_bytes = 0
        if not groups:
            return
        self.bytes_d2h += nbytes

        slice_bytes = self.link.fetch_slice

        def fetch_one(p):
            t0 = time.perf_counter()
            if isinstance(p, tuple):
                buf, kq, uq, K, B = p
                p = buf if (kq >= K and uq >= B) else buf[:kq, :uq]
            t1 = time.perf_counter()
            jax.block_until_ready(p)   # device queue ahead of the slice
            t2 = time.perf_counter()
            out = _fetch_np(p, slice_bytes)
            t3 = time.perf_counter()
            _PROCESS_FLIPPED[0] = True
            # observed bandwidth feeds the adaptive policy (watermark
            # depths + slice size for LATER flushes)
            self.link.observe_fetch(out.nbytes, t3 - t2)
            self._fetch_log.append(
                (out.nbytes, round(t1 - t0, 3), round(t2 - t1, 3),
                 round(t3 - t2, 3)))
            return out

        # ONE FUTURE PER PART on the single fetcher worker: the drain
        # consumes part k (accumulate + emit + enqueue writes) while
        # part k+1 transfers — the EOF tail streams instead of
        # serializing fetch-everything -> emit-everything -> write
        self._in_flight.append(
            ([g[0] for g in groups],
             [self._fetcher.submit(fetch_one, g[1]) for g in groups]))
        self.timer.add("flush", time.perf_counter() - t_flush0)

    def _drain_one(self):
        tags, futs = self._in_flight.pop(0)
        for i, (batches, fut) in enumerate(zip(tags, futs)):
            t0 = time.perf_counter()
            try:
                group = fut.result(timeout=self.fetch_timeout
                                   if self._watchdog else None)
            except FuturesTimeout:
                self.timer.add("fetch_wait", time.perf_counter() - t0)
                self._enter_fallback(
                    [tags[i:]] + [t for t, _ in self._in_flight])
                return
            self.timer.add("fetch_wait", time.perf_counter() - t0)
            t0 = time.perf_counter()
            if isinstance(batches, str):   # "stats"
                self.device_stats.consume_flat(group.astype(np.int64))
                self.timer.add("accumulate", time.perf_counter() - t0)
                continue
            # the ring slice may carry quantized extra slots/rows beyond
            # the pending batches — iterate only the real ones; stale rows
            # within a slot are masked out by each batch's read_mask
            for j, batch in enumerate(batches):
                self._consume_batch(group[j], batch)
            self.timer.add("accumulate", time.perf_counter() - t0)
            # emit per part: writes stream while the NEXT part transfers
            self._emit_ready()

    def _emit_ready(self):
        """Emit completed blocks from the head (input order)."""
        while self._block_queue and self._block_queue[0][2] == 0:
            block, res, _ = self._block_queue.pop(0)
            t0 = time.perf_counter()
            self._emit(block, res)
            self.timer.add("emit", time.perf_counter() - t0, block.n)

    # ------------------------------------------------- host CPU fallback

    def _enter_fallback(self, tag_groups, reason="device result fetch"):
        """The watchdog fired: a device fetch (or dispatch) stalled beyond
        fetch_timeout.  Flip permanently to the host backend —
        recompute every already-dispatched batch (the in-flight fetch
        groups plus the not-yet-flushed ring pendings) from its retained
        or rebuilt packed feed, and compute all future batches on the host
        at dispatch.  The stuck fetch is abandoned on its daemon thread;
        the kernels are integer-exact on every backend, so output bytes
        are identical either way."""
        self._fallback = True
        self._in_flight = []
        self._pending_batches = 0
        self._pending_feed_bytes = 0
        sys.stderr.write(
            "WARNING: %s stalled > %.0fs — "
            "recomputing on the host (set "
            "FASTPLONG_FETCH_TIMEOUT=0 to wait forever)\n"
            % (reason, self.fetch_timeout))
        t0 = time.perf_counter()
        # bounded-wait the in-progress device dispatch (queued tasks see
        # _fallback and no-op), then seal: a dispatch that unwedges later
        # must not append to pending lists this replay is about to drain
        deadline = time.monotonic() + min(30.0, max(1.0, self.fetch_timeout))
        for fut, _ in list(self._disp_futs):
            try:
                fut.result(timeout=max(0.05, deadline - time.monotonic()))
            except Exception:
                pass  # timeout or task error: counted as not-queued below
        with self._disp_lock:
            self._disp_sealed = True
            # classify by the _queued flag (set atomically with the
            # bs.pending append): a dispatcher task can append BEFORE its
            # future is marked done, and such a batch must not be both
            # replayed here and drained from bs.pending below
            replay = [b for _, b in self._disp_futs
                      if not getattr(b, "_queued", False)]
        self._disp_futs.clear()
        batches = list(replay)
        for tags in tag_groups:
            for group in tags:
                if isinstance(group, str):
                    # an in-flight statistics-state fetch: abandoned; its
                    # content is recomputed by _recover_device_stats below
                    continue
                batches.extend(group)
        for bs in self.device_stats.buckets.values():
            pending, bs.pending = bs.pending, []
            batches.extend(pending)
        # device-resident statistics state (device-stats or mesh mode) is
        # now unreachable: discard every device-side contribution — the
        # periodically-drained host partials included, so the recompute
        # can't double-count — and flip to host-statistics mode for the
        # rest of the run
        self.device_stats.seal()
        stats_recovery = bool(self._dev_statted)
        if stats_recovery and not self.host_stats_mode:
            in_path = ("/dev/stdin" if self.opt.input_from_stdin
                       and not self.opt.in_file else self.opt.in_file)
            if in_path == "/dev/stdin" or not _os.path.isfile(in_path):
                from ..util import error_exit
                error_exit(
                    "device link stalled with statistics state resident "
                    "on the unreachable device, and the input is a "
                    "stream that cannot be re-read for recovery — rerun "
                    "with --stats_backend host (stream-safe) or "
                    "FASTPLONG_FETCH_TIMEOUT=0 to wait forever")
            self._init_host_stats()
            self.host_stats_mode = True
        if self.host_stats_mode:
            # replayed batches now take the host-statistics path: they
            # need their packed feed (released at dispatch in device-
            # stats mode) and a pre-statRead pass
            for batch in batches:
                if batch.L <= self.stat_cap:
                    if batch.packed is None:
                        batch.packed = self._rebuild_packed(batch)
                    if batch.pre_medians is None:
                        batch.pre_medians = self._stats_pool.submit(
                            self._timed_pre_rows, batch)
        for batch in batches:
            self._consume_batch(self._cpu_rows(batch), batch)
        if stats_recovery:
            replay_ids = [
                seg.block.first_index + np.asarray(seg.indices, np.int64)
                for b in batches for seg in b.segments]
            self._recover_device_stats(replay_ids)
        self.timer.add("fallback_recover", time.perf_counter() - t0,
                       len(batches))
        self._emit_ready()

    def _recover_device_stats(self, replay_ids):
        """Recompute, host-side, the statistics contributions that were
        resident in the abandoned device accumulator: re-read the input
        (deterministic block/index assignment), select exactly the reads
        recorded in _dev_statted minus the ones the fallback replay just
        re-statted, and run the host statRead passes over their recomputed
        spans.  Reference analog: per-thread Stats merged at end
        (seprocessor.cpp:108-121) — no state is ever unrecoverable."""
        if not self._dev_statted:
            return
        t0 = time.perf_counter()
        need = np.unique(np.concatenate(self._dev_statted))
        self._dev_statted = []
        if replay_ids:
            need = np.setdiff1d(
                need, np.concatenate(replay_ids), assume_unique=False)
        if need.size == 0:
            return
        from .fast_runner import PackedResults
        reader = FastqStreamReader(
            self.opt.in_file, byte_range=getattr(self.opt, "byte_range",
                                                 None))
        max_id = int(need[-1])
        builders = {}

        def stat_one(b):
            batch = b.take_batch()
            batch.pre_medians = self._stats_pool.submit(
                self._timed_pre_rows, batch)
            rows = self._cpu_rows(batch)
            out = PackedResults(rows, self.cap, len(self.stages))
            batch.pre_medians = batch.pre_medians.result()
            self._host_post_batch(out, batch)

        n_rec = 0
        while True:
            block = reader.next_block()
            if block is None or block.first_index > max_id:
                break
            a = np.searchsorted(need, block.first_index)
            z = np.searchsorted(need, block.first_index + block.n)
            if a == z:
                continue
            sel = need[a:z] - block.first_index
            n_rec += len(sel)
            for L, take in bucket_groups(block):
                # monster buckets were host-statted from the start
                if L > self.stat_cap:
                    continue
                take_needed = np.intersect1d(take, sel)
                if not len(take_needed):
                    continue
                b = builders.get(L)
                if b is None:
                    b = builders[L] = BatchBuilder(L)
                pos = 0
                while pos < len(take_needed):
                    k = min(b.space, len(take_needed) - pos)
                    b.add(block, take_needed[pos:pos + k])
                    pos += k
                    if b.full:
                        stat_one(b)
        for b in builders.values():
            if b.count:
                stat_one(b)
        reader.close()
        self.timer.add("fallback_stat_recover",
                       time.perf_counter() - t0, n_rec)

    def _dispatch_fallback(self, batch):
        """Post-watchdog dispatch: compute the batch on the CPU backend
        and consume it synchronously (no device, no fetch)."""
        t0 = time.perf_counter()
        monster = batch.L > self.stat_cap
        if self.host_stats_mode and not monster:
            batch.pre_medians = self._stats_pool.submit(
                self._timed_pre_rows, batch)
        rows = self._cpu_rows(batch)
        self.timer.add("fallback_step", time.perf_counter() - t0)
        self._consume_batch(rows, batch)
        self._emit_ready()

    def _cpu_rows(self, batch):
        """Run the stats-free step for one batch on the host; returns the
        decoded [B, F] int32 result rows.

        Layered: the JAX CPU backend when one exists (vectorized, XLA-
        compiled), else the backend-free numpy host step (pipeline/
        host_step.py) — both bit-identical to the device step.  The
        round-3 bench TPU shipped NO CPU backend (only the device
        plugin), so this rescue path must never require one.
        FASTPLONG_FALLBACK_BACKEND=numpy|jax|auto forces a layer."""
        packed = batch.packed
        if packed is None:
            packed = self._rebuild_packed(batch)
        mode = _os.environ.get("FASTPLONG_FALLBACK_BACKEND", "auto")
        if mode != "numpy":
            cpu = self._cpu_backend()
            if cpu is not None:
                try:
                    import jax.numpy as jnp
                    step = self._get_nostats_step()
                    with jax.default_device(cpu):
                        outbuf = jnp.zeros(
                            (1, packed.shape[0], self.n_fields), jnp.int32)
                        out = step(outbuf, np.int32(0), jnp.asarray(packed),
                                   batch.L)
                    return np.asarray(out[0])
                except Exception as e:
                    if mode == "jax":
                        raise
                    sys.stderr.write(
                        "WARNING: JAX CPU fallback failed (%s: %s) — "
                        "using the numpy host step\n"
                        % (type(e).__name__, e))
                    self._cpu_dev = None  # don't retry per batch
            elif mode == "jax":
                raise RuntimeError("no JAX CPU backend available")
        from .host_step import host_rows
        return host_rows(self.opt, packed, batch.L, self.n_fields)

    def _cpu_backend(self):
        """The JAX CPU device, or None when the install has no CPU
        backend (probed once)."""
        if not hasattr(self, "_cpu_dev"):
            try:
                self._cpu_dev = jax.devices("cpu")[0]
            except Exception:
                self._cpu_dev = None
        return self._cpu_dev

    def _rebuild_packed(self, batch):
        """Recreate a dispatched batch's packed feed from its source
        blocks (monster batches release theirs at dispatch; blocks stay
        alive in _block_queue until every read is consumed)."""
        b = BatchBuilder(batch.L)
        for seg in batch.segments:
            assert b.count == seg.row_start, "segment rows not a prefix"
            b.add(seg.block, seg.indices)
        assert b.packed.shape[0] >= len(batch.lens), \
            "rebuilt batch geometry diverged"
        return b.packed[:len(batch.lens)]  # row-trimmed partials

    def _consume_batch(self, rows, batch):
        """Decode one batch's packed rows and route the results."""
        if batch.pre_medians is not None and not isinstance(
                batch.pre_medians, np.ndarray):
            batch.pre_medians = batch.pre_medians.result()  # stats worker
        if rows.shape[0] > len(batch.lens):
            # the ring slice is sized by the LARGEST batch in the flush;
            # a row-trimmed partial batch only owns a prefix of it (rows
            # beyond are stale bytes from other batches in the slot)
            rows = rows[:len(batch.lens)]
        if rows.shape[0] < len(batch.lens):
            # row-trimmed drain (partial batch): used rows are a contiguous
            # prefix, so the batch-side arrays narrow to match — everything
            # beyond is padding (read_mask False, no segment reaches it)
            n = rows.shape[0]
            batch.lens = batch.lens[:n]
            batch.read_mask = batch.read_mask[:n]
            if batch.pre_medians is not None:
                batch.pre_medians = batch.pre_medians[:n]
            if batch.packed is not None:
                batch.packed = batch.packed[:n]
        out = PackedResults(rows, self.cap, len(self.stages))
        if batch.L > self.stat_cap:
            self._host_stat_batch(out, batch)
        elif self.host_stats_mode:
            self._host_post_batch(out, batch)
        order = np.full(len(batch.lens), 1 << 60, np.int64)
        for seg in batch.segments:
            order[seg.row_start:seg.row_start + len(seg.indices)] = (
                seg.block.first_index + seg.indices)
        self._accumulate(out, batch, order)
        for seg in batch.segments:
            rows_sl = slice(seg.row_start, seg.row_start + len(seg.indices))
            entry = self._find_block(seg.block)
            entry[1].scatter_rows(seg.indices, out, rows_sl)
            entry[2] -= len(seg.indices)

    def _timed_pre_rows(self, batch):
        ts = time.perf_counter()
        med = self._batch_pre.add_rows(
            batch.packed, batch.L, None,
            batch.lens.astype(np.int64), None, None,
            batch.read_mask, batch.layout)
        self.timer.add("host_stats_pre", time.perf_counter() - ts)
        return med

    def _host_post_batch(self, out, batch):
        """Host-statistics mode: post-statRead per out-slot in one native
        pass per slot, using the batch's still-live packed buffer; fills
        pre/post medians in the decoded rows."""
        t0 = time.perf_counter()
        out.pre_median = batch.pre_medians
        mask_on = self.mask_enabled
        for c in range(self.cap):
            pass_c = out.passed[:, c]
            if not pass_c.any():
                continue
            med = self._batch_post.add_rows(
                batch.packed, batch.L,
                out.out_lo[:, c].astype(np.int64),
                out.out_hi[:, c].astype(np.int64),
                out.mask_lo[:, c].astype(np.int64) if mask_on else None,
                out.mask_hi[:, c].astype(np.int64) if mask_on else None,
                pass_c, batch.layout)
            out.post_median[:, c] = np.where(pass_c, med,
                                             out.post_median[:, c])
        batch.packed = None
        self.timer.add("host_stats", time.perf_counter() - t0)

    def _host_stat_batch(self, out, batch):
        """Host statRead for one monster batch (its device step is
        stats-free): fills out.pre_median / out.post_median in place and
        accumulates the per-cycle partials into the host accumulators.
        Arithmetic is identical to ops/stats_kernels.stat_batch; monster
        reads are rare so a python loop over 1-few rows is fine."""
        from .host_stats import median_qual, masked_span
        t0 = time.perf_counter()
        mask_on = self.mask_enabled
        n = 0
        for seg in batch.segments:
            blk = seg.block
            arr = blk.arr
            for k, i in enumerate(seg.indices):
                row = seg.row_start + k
                if not batch.read_mask[row]:
                    continue
                so = blk.seq_off[i]
                sl = blk.seq_len[i]
                qo = blk.qual_off[i]
                seq = arr[so:so + sl]
                qual = arr[qo:qo + sl]
                self._host_pre.add_read(seq, qual)
                out.pre_median[row] = median_qual(qual)
                n += 1
                if out.null[row]:
                    continue
                for c in range(self.cap):
                    if not out.passed[row, c]:
                        continue
                    lo = int(out.out_lo[row, c])
                    hi = int(out.out_hi[row, c])
                    b_eff = (masked_span(seq, lo, hi, out.mask_lo[row, c],
                                         out.mask_hi[row, c])
                             if mask_on else seq[lo:hi])
                    self._host_post.add_read(b_eff, qual[lo:hi])
                    out.post_median[row, c] = median_qual(qual[lo:hi])
        self.timer.add("host_stats", time.perf_counter() - t0, n)

    def _find_block(self, block):
        for entry in self._block_queue:
            if entry[0] is block:
                return entry
        raise RuntimeError("segment references an unknown block")

    def _accumulate(self, out, batch, order):
        cap = self.cap
        read_mask = batch.read_mask
        self.pre_stats.add_read_level(
            np.where(read_mask, batch.lens, 0), out.pre_median, read_mask,
            order)
        for ci in range(cap):
            # sub-reads of one input read keep slot order within the read
            self.post_stats.add_read_level(
                out.out_hi[:, ci] - out.out_lo[:, ci], out.post_median[:, ci],
                out.passed[:, ci], order * cap + ci)
        active = out.active
        codes = out.code[active]
        if len(codes):
            self.filter_result.add_filter_results(codes)
        live = ~out.null
        poly = out.poly
        pm = live & (poly >= 0)
        if pm.any():
            for b in range(4):
                sel = pm & (poly == b)
                if sel.any():
                    self.filter_result.add_polyx_trimmed(
                        b, int(out.poly_trim[sel].sum()), int(sel.sum()))
        # adapter bookkeeping (addReadTrimmed + per-sequence counts)
        at = out.adapter_trimmed
        tm = live & (at > 0)
        if tm.any():
            self.filter_result.trimmed_adapter_reads += int(tm.sum())
            self.filter_result.trimmed_adapter_bases += int(at[tm].sum())
        recs = out.adapter_recs
        if recs.size:
            for si, (seq, side) in enumerate(self.stages):
                col = recs[:, si]
                sel = live & (col > 0)
                if not sel.any():
                    continue
                vals, counts = np.unique(col[sel], return_counts=True)
                for cmplen, cnt in zip(vals.tolist(), counts.tolist()):
                    if side == "start":
                        rec_seq = seq[len(seq) - cmplen:]
                    else:
                        rec_seq = seq[:cmplen]
                    self.filter_result.add_adapter_trimmed(rec_seq, cnt)

    def _emit(self, block, res):
        if not _EMIT_FALLBACK:
            # vectorized piece-table path (pipeline/emit.py); the per-read
            # loop below remains only as the FASTPLONG_EMIT_FALLBACK=1
            # debugging oracle
            from .emit import emit_block_fast
            if self.split_set is not None:
                # split mode: writer rotation advances only at 16-read
                # pack boundaries (threadconfig.cpp:88-108), so the block
                # buffer is sliced per pack using per-record byte lengths
                out_b, _fb, read_lens = emit_block_fast(
                    block, res, self.cap, self.mask_enabled,
                    True, False, return_read_lens=True)
                read_passed = (res.active & res.passed
                               & ~res.null[:, None]).any(axis=1)
                self.split_set.add_block(out_b, read_lens, read_passed)
                return
            out_b, failed_b = emit_block_fast(
                block, res, self.cap, self.mask_enabled,
                self.out_writer is not None, self.failed_writer is not None)
            if out_b and self.out_writer is not None:
                self.out_writer.write(out_b)
            if failed_b:
                self.failed_writer.write(failed_b)
            return
        out_pieces = []
        failed_pieces = []
        buf = block.buf
        name_off, name_len = block.name_off, block.name_len
        seq_off = block.seq_off
        strand_off, strand_len = block.strand_off, block.strand_len
        qual_off = block.qual_off
        split = self.split_set
        write_failed = self.failed_writer is not None
        write_out = self.out_writer is not None or split is not None
        mask_on = self.mask_enabled
        for i in range(block.n):
            if split is not None:
                read_start = len(out_pieces)
            if res.null[i]:
                if split is not None:
                    split.add_read([], 0)
                continue  # trimAndCut returned NULL: the read vanishes
            n_out = res.n_out[i]
            read_passed = False
            for c in range(self.cap):
                if not res.active[i, c]:
                    continue
                if res.passed[i, c]:
                    read_passed = True
                    if not write_out:
                        continue
                    lo = res.out_lo[i, c]
                    hi = res.out_hi[i, c]
                    so = seq_off[i]
                    qo = qual_off[i]
                    # name tags compose: '@' + 'rN-' + split-tag + rest
                    # (breakByRegions renames after breakByGap, both
                    # inserting at position 1: read.cpp:200,209,244,256)
                    no = name_off[i]
                    name = [buf[no:no + 1]]
                    if res.region_no[i, c] > 0:
                        name.append(b"r%d-" % res.region_no[i, c])
                    tag = res.out_tag[i, c]
                    if tag != TAG_NONE:
                        name.append(_TAG_BYTES[tag])
                    name.append(buf[no + 1:no + name_len[i]])
                    out_pieces += name
                    out_pieces.append(_NL)
                    out_pieces += self._seq_pieces(
                        buf, so, lo, hi, res.mask_lo[i, c], res.mask_hi[i, c]
                    ) if mask_on else [buf[so + lo:so + hi]]
                    out_pieces += (
                        _NL,
                        buf[strand_off[i]:strand_off[i] + strand_len[i]], _NL,
                        buf[qo + lo:qo + hi], _NL)
                elif write_failed and n_out == 1:
                    # failed reads are written as the (in-place trimmed)
                    # PARENT read + tag (seprocessor.cpp:278-279 writes or1);
                    # when the single out-read IS the parent object, N-masking
                    # already mutated it in the reference
                    lo = res.lo[i]
                    hi = res.hi[i]
                    so = seq_off[i]
                    qo = qual_off[i]
                    failed_pieces += (
                        buf[name_off[i]:name_off[i] + name_len[i]],
                        b" ", FAILED_TYPES[res.code[i, c]].encode(), _NL)
                    if mask_on and res.is_parent[i, c]:
                        failed_pieces += self._seq_pieces(
                            buf, so, lo, hi, res.mask_lo[i, c],
                            res.mask_hi[i, c])
                    else:
                        failed_pieces.append(buf[so + lo:so + hi])
                    failed_pieces += (
                        _NL,
                        buf[strand_off[i]:strand_off[i] + strand_len[i]], _NL,
                        buf[qo + lo:qo + hi], _NL)
            if split is not None:
                pieces = out_pieces[read_start:]
                del out_pieces[read_start:]
                split.add_read(pieces, 1 if read_passed else 0)
        if split is not None:
            return
        if out_pieces and self.out_writer is not None:
            self.out_writer.write(b"".join(out_pieces))
        if failed_pieces:
            self.failed_writer.write(b"".join(failed_pieces))

    @staticmethod
    def _seq_pieces(buf, so, lo, hi, m_lo, m_hi):
        """Sequence bytes for span [lo, hi) with [m_lo, m_hi) (absolute
        span coords) replaced by Ns (maskRegionWithN, read.cpp:217-225)."""
        if m_hi <= m_lo:
            return [buf[so + lo:so + hi]]
        a = max(lo, m_lo)
        b = min(hi, m_hi)
        if b <= a:
            return [buf[so + lo:so + hi]]
        return [buf[so + lo:so + a], b"N" * (b - a), buf[so + b:so + hi]]


def _truncate_block(block, n):
    from ..io.fastq import RecordBlock
    return RecordBlock(
        block.buf, block.arr,
        block.name_off[:n], block.name_len[:n],
        block.seq_off[:n], block.seq_len[:n],
        block.strand_off[:n], block.strand_len[:n],
        block.qual_off[:n], first_index=block.first_index)
