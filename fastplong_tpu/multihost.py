"""Single-file multi-host sharding (TPU-native extension).

The reference scales across processes only at FILE granularity
(parallel.py: one fastplong process per FASTQ); one huge file cannot be
split.  Here a plain FASTQ is sharded by record-aligned BYTE RANGES: host i
of N processes records in [range_i) and writes host-prefixed outputs
(0001.out.fq ... like --split naming, threadconfig.cpp:72-86), plus a
statistics partial.  The final merged JSON/HTML report is produced either

  * over DCN: when jax.distributed is initialized (FASTPLONG_COORDINATOR
    env set to host:port), partials are exchanged with a global allgather
    (jax.experimental.multihost_utils) and host 0 writes the report — the
    collective replacement for the reference's end-of-run Stats::merge
    (src/seprocessor.cpp:108-121) across hosts; or
  * offline: `python -m fastplong_tpu.merge_reports out.json.part0
    out.json.part1 ...` merges the saved partial blobs (shared or copied
    filesystem).

gzip inputs cannot be byte-sharded (no random access without an index) —
multi-host mode requires plain FASTQ; .gz falls back to whole-file
processing on one host via parallel.py's file sharding.
"""

import io
import os
import pickle

import numpy as np

from .stats import Stats
from .filter_result import FilterResult

_PROBE = 1 << 20  # alignment scan window


def _is_record_start(lines, j, at_eof):
    """Does lines[j] begin a FASTQ record?  '@' alone is not enough (it is
    a legal quality byte), so require a CHAIN of two well-formed records.
    Returns True/False, or None when the window ends mid-chain and the
    file doesn't — the caller must grow the window rather than skip a
    possibly-true start."""
    k = j
    for checked in range(2):
        if k + 3 >= len(lines):
            if not at_eof:
                return None
            # at EOF a shorter chain is conclusive if the remainder is
            # empty (trailing newline split artifact)
            return checked >= 1 and all(not ln for ln in lines[k:])
        if not (lines[k].startswith(b"@") and lines[k + 2].startswith(b"+")
                and len(lines[k + 1]) == len(lines[k + 3])):
            return False
        k += 4
    return True


def align_to_record(path, pos):
    """Smallest record-start byte offset >= pos (file size if none)."""
    size = os.path.getsize(path)
    if pos <= 0:
        return 0
    if pos >= size:
        return size
    probe = _PROBE
    with open(path, "rb") as f:
        # pos itself is a candidate iff it begins a line (previous byte is
        # a newline) — otherwise the window's first "line" is the partial
        # tail of the previous line and must be skipped
        f.seek(pos - 1)
        pos_is_line_start = f.read(1) == b"\n"
        while True:
            f.seek(pos)
            buf = f.read(probe)
            at_eof = pos + len(buf) >= size
            lines = buf.split(b"\n")
            offs = []
            o = 0
            for ln in lines:
                offs.append(o)
                o += len(ln) + 1
            start_line = 0 if pos_is_line_start else 1
            inconclusive = False
            for j in range(start_line, max(start_line, len(lines) - 1)):
                r = _is_record_start(lines, j, at_eof)
                if r is True:
                    return pos + offs[j]
                if r is None:
                    # window ended mid-chain at a live candidate: grow
                    # the window, don't skip a possibly-true start
                    inconclusive = True
                    break
            if at_eof and not inconclusive:
                # no record start in the remainder: everything left
                # belongs to the previous shard's final record
                return size
            probe *= 2


def compute_range(path, num_hosts, host_index):
    """Record-aligned (start, end) byte range of shard host_index/num_hosts."""
    size = os.path.getsize(path)
    cut = [align_to_record(path, size * i // num_hosts)
           for i in range(num_hosts + 1)]
    return cut[host_index], cut[host_index + 1]


def host_prefixed(path, host_index, digits=4):
    """0001.name host-file naming, mirroring --split (threadconfig.cpp:72-86)."""
    if not path:
        return path
    d = os.path.dirname(path)
    b = os.path.basename(path)
    return os.path.join(d, str(host_index + 1).zfill(digits) + "." + b)


# ----------------------------------------------------------- partial (de)ser

def partial_bytes(opt, pre, post, fr):
    """Serialize one host's run partial (pre/post Stats, FilterResult,
    and the opt needed to render reports) to bytes."""
    payload = {
        "opt": opt,
        "reads_pre": pre.reads, "len_sum_pre": pre.length_sum,
        "reads_post": post.reads, "len_sum_post": post.length_sum,
        "fr_stats": fr.filter_read_stats,
        "fr_adapter_reads": fr.trimmed_adapter_reads,
        "fr_adapter_bases": fr.trimmed_adapter_bases,
        "fr_polyx_reads": fr.trimmed_polyx_reads,
        "fr_polyx_bases": fr.trimmed_polyx_bases,
        "fr_adapter_counts": fr.adapter_counts,
    }
    for tag, s in (("pre", pre), ("post", post)):
        payload[tag + "_arrays"] = {
            k: getattr(s, k) for k in
            ("cycle_q20", "cycle_q30", "cycle_content", "cycle_qual",
             "cycle_total_base", "cycle_total_qual", "base_qual_hist",
             "median_qual_hist", "median_qual_bases", "kmer")}
        payload[tag + "_lengths"] = (
            np.concatenate(s._length_chunks) if s._length_chunks
            else np.zeros(0, np.int64))
        if s._qual_len_chunks:
            payload[tag + "_ql"] = tuple(
                np.concatenate([c[i] for c in s._qual_len_chunks])
                for i in range(3))
        else:
            payload[tag + "_ql"] = (np.zeros(0, np.uint8),
                                    np.zeros(0, np.int64),
                                    np.zeros(0, np.int64))
        payload[tag + "_is_rna"] = s.is_rna
    return pickle.dumps(payload, protocol=4)


def save_partial(path, opt, pre, post, fr):
    with open(path, "wb") as f:
        f.write(partial_bytes(opt, pre, post, fr))


def _stats_from(payload, tag, host_index):
    arrays = payload[tag + "_arrays"]
    L = int(arrays["cycle_total_base"].shape[0])
    s = Stats(is_rna=payload[tag + "_is_rna"], guessed_cycles=max(L, 1))
    for k, v in arrays.items():
        getattr(s, k)[..., :v.shape[-1]] += v
    s.reads = int(payload["reads_" + tag])
    s.length_sum = int(payload["len_sum_" + tag])
    lengths = payload[tag + "_lengths"]
    if len(lengths):
        s._length_chunks.append(lengths)
    meds, lens, order = payload[tag + "_ql"]
    if len(meds):
        # offset preserves host-major global input order in the density
        # plot listing (ranges are contiguous byte spans of one file)
        s._qual_len_chunks.append(
            (meds, lens, order + (host_index << 44)))
    return s


def _filter_result_from(payload):
    fr = FilterResult()
    fr.filter_read_stats += payload["fr_stats"]
    fr.trimmed_adapter_reads = int(payload["fr_adapter_reads"])
    fr.trimmed_adapter_bases = int(payload["fr_adapter_bases"])
    fr.trimmed_polyx_reads += payload["fr_polyx_reads"]
    fr.trimmed_polyx_bases += payload["fr_polyx_bases"]
    fr.adapter_counts = dict(payload["fr_adapter_counts"])
    return fr


def merge_partial_blobs(blobs):
    """Merge serialized host partials (in host order) into
    (opt, pre_stats, post_stats, filter_result)."""
    payloads = [pickle.loads(b) for b in blobs]
    pres = [_stats_from(p, "pre", i) for i, p in enumerate(payloads)]
    posts = [_stats_from(p, "post", i) for i, p in enumerate(payloads)]
    frs = [_filter_result_from(p) for p in payloads]
    pre = Stats.merge(pres)
    post = Stats.merge(posts)
    pre.calc_length_histogram()
    post.calc_length_histogram()
    fr = FilterResult.merge(frs)
    return payloads[0]["opt"], pre, post, fr


def write_merged_reports(opt, pre, post, fr):
    from .report.json_report import report_json
    from .report.html_report import report_html
    report_json(opt, fr, pre, post)
    report_html(opt, fr, pre, post)


# ------------------------------------------------------------- DCN allgather

def distributed_init_from_env(opt):
    """Initialize jax.distributed when a coordinator is configured; must run
    before the first jax backend use."""
    coord = os.environ.get("FASTPLONG_COORDINATOR", "")
    if not coord or opt.num_hosts <= 1:
        return False
    import jax
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=opt.num_hosts,
                               process_id=opt.host_index)
    return True


def allgather_bytes(blob):
    """All-gather one bytes blob per process over DCN; returns the list in
    process order.  Two collectives: max length, then padded uint8 data."""
    import jax
    from jax.experimental import multihost_utils
    n = jax.process_count()
    arr = np.frombuffer(blob, np.uint8)
    ln = multihost_utils.process_allgather(
        np.asarray([len(arr)], np.int64))            # [n, 1]
    maxlen = int(ln.max())
    pad = np.zeros(maxlen, np.uint8)
    pad[:len(arr)] = arr
    data = multihost_utils.process_allgather(pad)    # [n, maxlen]
    return [bytes(data[i, :int(ln[i, 0])]) for i in range(n)]


def finish_distributed(opt, pre, post, fr):
    """DCN report merge: every host contributes its partial, host 0 writes
    the final JSON/HTML (the cross-host Stats::merge analog)."""
    import jax
    blobs = allgather_bytes(partial_bytes(opt, pre, post, fr))
    if jax.process_index() == 0:
        mopt, mpre, mpost, mfr = merge_partial_blobs(blobs)
        # reports go to the unprefixed paths the user asked for
        mopt.json_file = opt.json_file_base
        mopt.html_file = opt.html_file_base
        write_merged_reports(mopt, mpre, mpost, mfr)
