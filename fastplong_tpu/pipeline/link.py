"""Interconnect-adaptive pipeline depths.

The round-3 runner hard-coded its held-block watermarks, early-fetch
trigger and d2h slice size to the development tunnel's pathologies (the
first d2h degrades dispatch ~25x; transfers above ~16MB collapse).  On a
directly-attached accelerator those depths are pure memory cost: deferring
the first fetch behind ~160 held blocks (~1.3GB parsed input) buys nothing
when d2h runs at PCIe speed.

LinkPolicy picks between two profiles and adapts at runtime:

  * selection: FASTPLONG_LINK=tunnel|fast pins a profile; otherwise the
    device platform is sniffed (the axon plugin reports "axon" in
    platform_version -> tunnel) — asynchronously when possible, so
    backend init never blocks the reader; until known, the conservative
    tunnel profile applies (deep watermarks are safe everywhere).
  * adaptation: every real result fetch reports (bytes, seconds); an
    EWMA of observed d2h bandwidth switches profiles when the link turns
    out fast (>100 MB/s) or collapses (<8 MB/s).  Mid-run switches only
    move WATERMARKS — correctness never depends on them.
  * env pins (FASTPLONG_FLUSH_BLOCKS / FASTPLONG_MAX_BLOCKS /
    FASTPLONG_EARLY_FETCH / FASTPLONG_FETCH_SLICE) override a knob in
    every profile, as before.

The reference analog is PACK_IN_MEM_LIMIT back-pressure (common.h:38,
seprocessor.cpp:383-396) — a fixed constant there, because its "link"
(shared memory) has no weather.
"""

import os
import threading


class LinkPolicy:
    PROFILES = {
        # deep watermarks: defer/batch d2h as long as host memory allows
        # (each fetch pays a huge RTT; the FIRST one degrades dispatch).
        # Partial batches dispatch at the bucket's full padded row count:
        # every extra (L, rows) shape costs a 0.5-17s device program load
        # through a tunnel, which dwarfs the padded compute it would save.
        # early_fetch_bytes ~1GB = defer the FIRST d2h to EOF for any
        # input the held-block watermark can absorb: measured (round 4),
        # pre-first-d2h h2d runs at ~1.8 GB/s and collapses to ~27-38
        # MB/s after it, so keeping the whole dispatch phase in fast
        # mode beats overlapping the drain (hot 13.4 vs 6.3 Mbases/s).
        # stream_feed default ON since round 5 (VERDICT r4 #1): h2d
        # bytes are the wall whenever the degraded regime is entered
        # (any process that fetches mid-run, and every resident-daemon
        # job), and the prewarm pool loads the few extra (w, L, B)
        # unpack executables concurrently off-clock.
        "tunnel": dict(max_in_flight=3, flush_blocks=160,
                       max_blocks_pending=192, early_fetch_bytes=1 << 30,
                       fetch_slice=12 << 20, trim_partials=False,
                       eager_drain=False, stream_feed=True,
                       fetch_full_ring=False),
        # shallow watermarks: fetch eagerly, keep held-block memory small;
        # no d2h slicing (the collapse-above-16MB pathology is tunnel-
        # only).  Partial batches are row-trimmed to a quantized prefix:
        # padded compute is the scarce resource here, extra shapes are
        # cheap (persistent compile cache, local program loads).
        "fast": dict(max_in_flight=3, flush_blocks=8,
                     max_blocks_pending=24, early_fetch_bytes=8 << 20,
                     fetch_slice=1 << 30, trim_partials=True,
                     eager_drain=True, stream_feed=False,
                     fetch_full_ring=False),
    }
    FAST_MBPS = 100.0   # observed d2h above this -> fast profile
    SLOW_MBPS = 8.0     # below this -> tunnel profile

    def __init__(self, tunneled=None):
        """tunneled: True/False when already known, None = resolve later
        (set_tunneled) — the conservative tunnel profile applies until
        then."""
        self._lock = threading.Lock()
        self._pins = {}
        for env, attr in (("FASTPLONG_FLUSH_BLOCKS", "flush_blocks"),
                          ("FASTPLONG_MAX_BLOCKS", "max_blocks_pending"),
                          ("FASTPLONG_EARLY_FETCH_MB", "early_fetch_mb"),
                          ("FASTPLONG_FETCH_SLICE", "fetch_slice")):
            v = os.environ.get(env)
            if v:
                if attr == "early_fetch_mb":
                    self._pins["early_fetch_bytes"] = int(v) << 20
                else:
                    self._pins[attr] = int(v)
        tp = os.environ.get("FASTPLONG_TRIM_PARTIALS", "")
        if tp in ("0", "1"):
            self._pins["trim_partials"] = tp == "1"
        elif os.environ.get("FASTPLONG_DAEMON_CHILD") == "1":
            # daemon-resident process: extra (L, rows) shapes amortize
            # across jobs, so padded partial rows are pure link cost even
            # on a tunnel — trim them
            self._pins["trim_partials"] = True
        ffr = os.environ.get("FASTPLONG_FETCH_FULL_RING", "")
        if ffr in ("0", "1"):
            # drain fetches the whole [K, B, F] ring instead of a
            # quantized slice: zero slice executables, so a pristine
            # single-use worker's pre-loaded program set covers the whole
            # job (daemon pool mode); the extra stale-slot bytes are a
            # couple of MB per drain
            self._pins["fetch_full_ring"] = ffr == "1"
        sf = os.environ.get("FASTPLONG_STREAM_FEED", "")
        if sf in ("0", "1"):
            self._pins["stream_feed"] = sf == "1"
        elif os.environ.get("FASTPLONG_DAEMON_CHILD") == "1":
            # stream feed (device.py build_stream/unpack_stream): ships
            # 1.03 bytes/base instead of padded rows — the dominant cost
            # of a degraded-transfer resident process; its extra tiny
            # (L, B, w) executables amortize across the daemon's life
            self._pins["stream_feed"] = True
        forced = os.environ.get("FASTPLONG_LINK", "")
        self._forced = forced in self.PROFILES
        self.tunneled = tunneled
        self._ewma = None
        self._loads = []   # observed device program-load seconds
        if self._forced:
            name = forced
        elif tunneled is None:
            name = "tunnel"
        else:
            name = "tunnel" if tunneled else "fast"
        self._apply(name)

    def _apply(self, name):
        self.profile = name
        for k, v in self.PROFILES[name].items():
            setattr(self, k, v)
        for k, v in self._pins.items():
            setattr(self, k, v)

    def set_tunneled(self, tunneled):
        """Late platform sniff result (run on the prewarm pool so backend
        init never blocks the reader)."""
        with self._lock:
            self.tunneled = bool(tunneled)
            if self._forced or self._ewma is not None:
                return  # a pin or real observation outranks the sniff
            self._apply("tunnel" if tunneled else "fast")

    def observe_load(self, seconds):
        """Record one observed device program-load time (the prewarm pool
        reports them); drives partial_trim_ok below."""
        with self._lock:
            self._loads.append(seconds)

    def partial_trim_ok(self):
        """Should partially-filled batches be row-trimmed?  Trimming
        saves padded h2d bytes but mints extra (L, rows) shapes, each
        costing a device program load on first use.  Pins (incl. the
        daemon-resident pin — shapes amortize across jobs there) and the
        fast profile say yes; the bare tunnel profile says no — the
        deferred-first-fetch schedule keeps its dispatch phase at full
        h2d speed, so padded bytes are cheap but every on-demand load
        stalls the dispatcher."""
        v = self._pins.get("trim_partials")
        if v is not None:
            return v
        return self.trim_partials

    # NOTE (round 5, measured): do NOT drain eagerly post-flip.  A
    # resident process that already paid the first-d2h flip looks like it
    # could stream drains during the dispatch phase (emit overlapping the
    # h2d tail), but the tunnel serializes directions: in-job d2h
    # measured ~0.3 MB/s while h2d was in flight vs 8-10 MB/s after the
    # feed finished.  The deferred-EOF drain schedule wins even when
    # there is no flip left to protect.

    def observe_fetch(self, nbytes, seconds):
        """Adapt to observed d2h bandwidth (called from the fetcher
        thread after each real result fetch)."""
        if self._forced or seconds <= 0 or nbytes < (1 << 16):
            return
        mbps = nbytes / 1e6 / seconds
        with self._lock:
            self._ewma = (mbps if self._ewma is None
                          else 0.5 * self._ewma + 0.5 * mbps)
            if self._ewma > self.FAST_MBPS and self.profile != "fast":
                self._apply("fast")
            elif self._ewma < self.SLOW_MBPS and self.profile != "tunnel":
                self._apply("tunnel")
