"""JSON report writer.

Byte-layout-compatible with the reference (src/jsonreporter.cpp:11-94,
src/stats.cpp:473-548, src/filterresult.cpp:120-204), including indentation,
spacing quirks, and C++ default double formatting.
"""

from ..common import (VERSION, PASS_FILTER, FAIL_N_BASE, FAIL_LENGTH,
                      FAIL_TOO_LONG, FAIL_QUALITY, FAIL_COMPLEXITY,
                      ATCG_BASES)
from .cppfmt import fmt_double

_BASES_DNA = "ATCG"
_BASES_RNA = "AUCG"


def _kmer3(val, is_rna):
    b = _BASES_RNA if is_rna else _BASES_DNA
    return b[(val & 0x30) >> 4] + b[(val & 0x0C) >> 2] + b[val & 0x03]


def _kmer2(val, is_rna):
    b = _BASES_RNA if is_rna else _BASES_DNA
    return b[(val & 0x0C) >> 2] + b[val & 0x03]


def _stats_json(w, stats, padding):
    w("{\n")
    w(padding + "\t" + '"total_reads": %d,\n' % stats.get_reads())
    w(padding + "\t" + '"total_bases": %d,\n' % stats.get_bases())
    w(padding + "\t" + '"q20_bases": %d,\n' % stats.get_q20())
    w(padding + "\t" + '"q30_bases": %d,\n' % stats.get_q30())
    w(padding + "\t" + '"total_cycles": %d,\n' % stats.get_cycles())

    qual_names = ["A", "U" if stats.is_rna else "T", "C", "G", "mean"]
    w(padding + "\t" + '"quality_curves": {\n')
    for i, name in enumerate(qual_names):
        curve = stats.quality_curves[name]
        w(padding + "\t\t" + '"%s":[' % name)
        w(",".join(fmt_double(v) for v in curve))
        w("]")
        if i != len(qual_names) - 1:
            w(",")
        w("\n")
    w(padding + "\t" + "},\n")

    content_names = ["A", "U" if stats.is_rna else "T", "C", "G", "N", "GC"]
    w(padding + "\t" + '"content_curves": {\n')
    for i, name in enumerate(content_names):
        curve = stats.content_curves[name]
        w(padding + "\t\t" + '"%s":[' % name)
        w(",".join(fmt_double(v) for v in curve))
        w("]")
        if i != len(content_names) - 1:
            w(",")
        w("\n")
    w(padding + "\t" + "},\n")

    w(padding + "\t" + '"kmer_count": {\n')
    kmer = stats.kmer
    for i in range(64):
        first = _kmer3(i, stats.is_rna)
        row = []
        for j in range(16):
            target = (i << 4) + j
            row.append(padding + '\t\t"%s%s":%d'
                       % (first, _kmer2(j, stats.is_rna), int(kmer[target])))
        w(",".join(row))
        if i != 63:
            w(",\n")
        else:
            w("\n")
    w(padding + "\t" + "}\n")
    w(padding + "},\n")


def _filter_json(w, fr, opt, padding):
    s = fr.filter_read_stats
    w("{\n")
    w(padding + "\t" + '"passed_filter_reads": %d,\n' % s[PASS_FILTER])
    w(padding + "\t" + '"low_quality_reads": %d,\n' % s[FAIL_QUALITY])
    w(padding + "\t" + '"too_many_N_reads": %d,\n' % s[FAIL_N_BASE])
    if opt.complexity_filter.enabled:
        w(padding + "\t" + '"low_complexity_reads": %d,\n' % s[FAIL_COMPLEXITY])
    w(padding + "\t" + '"too_short_reads": %d,\n' % s[FAIL_LENGTH])
    w(padding + "\t" + '"too_long_reads": %d\n' % s[FAIL_TOO_LONG])
    w(padding + "},\n")


def _adapters_inner(w, fr):
    items = fr.sorted_adapters()
    total = sum(v for _, v in items)
    if total == 0:
        return
    reported = 0
    first = True
    for seq, count in items:
        if count / total < 0.01:
            continue
        if not first:
            w(", ")
        first = False
        w('"%s":%d' % (seq, count))
        reported += count
    unreported = total - reported
    if unreported > 0:
        if not first:
            w(", ")
        w('"others":%d' % unreported)


def _adapter_json(w, fr, opt, padding):
    w("{\n")
    w(padding + "\t" + '"adapter_trimmed_reads": %d,\n' % fr.trimmed_adapter_reads)
    w(padding + "\t" + '"adapter_trimmed_bases": %d,\n' % fr.trimmed_adapter_bases)
    w(padding + "\t" + '"read_start_adapter": "%s",\n' % opt.get_read_start_adapter())
    w(padding + "\t" + '"read_end_adapter": "%s",\n' % opt.get_read_end_adapter())
    w(padding + "\t" + '"read_adapter_counts": {')
    _adapters_inner(w, fr)
    w("}")
    w("\n")
    w(padding + "},\n")


def _base_counts_json(w, pad, key, total, counts):
    w(pad + '\t"total_%s": %d,\n' % (key, total))
    w(pad + '\t"%s":{' % key)
    w(", ".join('"%s": %d' % (ATCG_BASES[b], int(counts[b])) for b in range(4)))
    w("}")


def _polyx_json(w, fr, padding):
    w(padding + "{\n")
    _base_counts_json(w, padding, "polyx_trimmed_reads",
                      fr.total_polyx_trimmed_reads(), fr.trimmed_polyx_reads)
    w(",\n")
    _base_counts_json(w, padding, "polyx_trimmed_bases",
                      fr.total_polyx_trimmed_bases(), fr.trimmed_polyx_bases)
    w("\n" + padding + "},\n")


def report_json(opt, filter_result, pre_stats, post_stats, path=None):
    """Writes the JSON report (reference JsonReporter::report)."""
    parts = []
    w = parts.append
    w("{\n")

    def rate(a, b):
        return fmt_double(0.0 if b == 0 else a / b)

    pre_reads, pre_bases = pre_stats.get_reads(), pre_stats.get_bases()
    pre_q20, pre_q30 = pre_stats.get_q20(), pre_stats.get_q30()
    pre_gc = pre_stats.get_gc_number()
    post_reads, post_bases = post_stats.get_reads(), post_stats.get_bases()
    post_q20, post_q30 = post_stats.get_q20(), post_stats.get_q30()
    post_gc = post_stats.get_gc_number()

    w('\t"summary": {\n')
    w('\t\t"fastplong_version": "%s",\n' % VERSION)
    w('\t\t"before_filtering": {\n')
    w('\t\t\t"total_reads":%d,\n' % pre_reads)
    w('\t\t\t"total_bases":%d,\n' % pre_bases)
    w('\t\t\t"q20_bases":%d,\n' % pre_q20)
    w('\t\t\t"q30_bases":%d,\n' % pre_q30)
    w('\t\t\t"q20_rate":%s,\n' % rate(pre_q20, pre_bases))
    w('\t\t\t"q30_rate":%s,\n' % rate(pre_q30, pre_bases))
    w('\t\t\t"read_mean_length":%d,\n' % pre_stats.get_mean_length())
    w('\t\t\t"gc_content":%s\n' % rate(pre_gc, pre_bases))
    w("\t\t},\n")
    w('\t\t"after_filtering": {\n')
    w('\t\t\t"total_reads":%d,\n' % post_reads)
    w('\t\t\t"total_bases":%d,\n' % post_bases)
    w('\t\t\t"q20_bases":%d,\n' % post_q20)
    w('\t\t\t"q30_bases":%d,\n' % post_q30)
    w('\t\t\t"q20_rate":%s,\n' % rate(post_q20, post_bases))
    w('\t\t\t"q30_rate":%s,\n' % rate(post_q30, post_bases))
    w('\t\t\t"read_mean_length":%d,\n' % post_stats.get_mean_length())
    w('\t\t\t"gc_content":%s\n' % rate(post_gc, post_bases))
    w("\t\t}")
    w("\n")
    w("\t},\n")

    if filter_result is not None:
        w('\t"filtering_result": ')
        _filter_json(w, filter_result, opt, "\t")

    if filter_result is not None and opt.adapter_cutting_enabled():
        w('\t"adapter_cutting": ')
        _adapter_json(w, filter_result, opt, "\t")

    if filter_result is not None and opt.polyx_trimming_enabled():
        w('\t"polyx_trimming": ')
        _polyx_json(w, filter_result, "\t")

    if pre_stats is not None:
        w('\t"read_before_filtering": ')
        _stats_json(w, pre_stats, "\t")

    if post_stats is not None:
        w('\t"read_after_filtering": ')
        _stats_json(w, post_stats, "\t")

    w('\t"command": "%s"\n' % opt.command)
    w("}")

    text = "".join(parts)
    if path is None:
        path = opt.json_file
    with open(path, "w") as f:
        f.write(text)
    return text
