"""Shared constants for fastplong-tpu.

Behavioral contract mirrors the reference implementation's constants
(/root/reference/src/common.h:25-64): filter-result codes, failure tags
appended to failed read names, and batching defaults.  The numeric values of
the FAIL_* codes are part of the output contract (bigger number means worse;
tags are written verbatim into failed_out records).
"""

VERSION = "0.4.1"  # capability parity target (reference src/common.h:4)

ATCG_BASES = ("A", "T", "C", "G")

# Filter result codes (reference src/common.h:43-53).
PASS_FILTER = 0
FAIL_POLY_X = 4
FAIL_OVERLAP = 8
FAIL_N_BASE = 12
FAIL_LENGTH = 16
FAIL_TOO_LONG = 17
FAIL_QUALITY = 20
FAIL_COMPLEXITY = 24

FILTER_RESULT_TYPES = 32

# Failure tag strings appended (space-separated) to the name line of reads
# written to --failed_out (reference src/common.h:55-64).
FAILED_TYPES = [
    "passed", "", "", "",
    "failed_polyx_filter", "", "", "",
    "failed_bad_overlap", "", "", "",
    "failed_too_many_n_bases", "", "", "",
    "failed_too_short", "failed_too_long", "", "",
    "failed_quality_filter", "", "", "",
    "failed_low_complexity", "", "", "",
    "", "", "", "",
]

# Host pipeline batching defaults (ours, not the reference's thread-pack
# constants): the device consumes fixed-shape [B, L] batches; the host packs
# roughly TOKENS_PER_BATCH bases per batch within a length bucket.
# Overridable via env for tests (small shapes compile much faster).
import os as _os

TOKENS_PER_BATCH = int(_os.environ.get("FASTPLONG_TOKENS_PER_BATCH", 1 << 23))
MAX_BATCH_READS = int(_os.environ.get("FASTPLONG_MAX_BATCH_READS", 4096))

# Per-read result rows are tiny ([B, ~19] int32) but every device->host
# fetch pays a fixed latency through the interconnect (tens of ms, worse
# in degraded phases — the tunnel's d2h performance is weather-dependent).
# The step therefore writes each batch's packed output into a device-side
# ring buffer of FETCH_GROUP batches per bucket, and the runner drains
# every bucket's pending slots per flush with power-of-2-quantized slices
# (a SMALL FIXED set of array shapes: on tunneled links each new shape's
# slice executable costs an 0.5-2s program load, so shape stability beats
# exact-size transfers).
FETCH_GROUP = int(_os.environ.get("FASTPLONG_FETCH_GROUP", 16))


def stat_device_cap():
    """Bucket length above which per-cycle statistics move to the host.

    The reference grows its per-cycle buffers dynamically (stats.cpp:75-119)
    so a single 8Mbp read costs 8M*8 counters only once, on the host.  Our
    device accumulators are per-bucket [34*L] resident tensors — fine up to
    ~64Kbp, ruinous for monster buckets (1GB+ per side at 8Mbp).  Buckets
    longer than this cap run the stats-free device step and their reads are
    statted by pipeline/host_stats.py instead (identical arithmetic).
    Read per call so tests can lower it cheaply."""
    return int(_os.environ.get("FASTPLONG_STAT_DEVICE_CAP", 1 << 16))
