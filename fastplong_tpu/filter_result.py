"""Filtering counters and adapter-trim bookkeeping.

Host-side equivalent of the reference FilterResult
(src/filterresult.{h,cpp}): per-code read counts, adapter trimmed
read/base totals, per-adapter-sequence occurrence map ordered by
(length, lexicographic), and per-base polyX trim counts.
"""

import numpy as np

from .common import (FILTER_RESULT_TYPES, PASS_FILTER, FAIL_N_BASE,
                     FAIL_LENGTH, FAIL_TOO_LONG, FAIL_QUALITY,
                     FAIL_COMPLEXITY, ATCG_BASES)


class FilterResult:
    def __init__(self):
        self.filter_read_stats = np.zeros(FILTER_RESULT_TYPES, np.int64)
        self.trimmed_adapter_reads = 0
        self.trimmed_adapter_bases = 0
        self.trimmed_polyx_reads = np.zeros(4, np.int64)
        self.trimmed_polyx_bases = np.zeros(4, np.int64)
        self.adapter_counts = {}  # sequence -> count

    def add_filter_result(self, result, read_num=1):
        if result < PASS_FILTER or result >= FILTER_RESULT_TYPES:
            return
        self.filter_read_stats[result] += read_num

    def add_filter_results(self, codes, counts=None):
        """Vector form: codes int array, counts optional weights."""
        if counts is None:
            counts = np.ones_like(codes)
        np.add.at(self.filter_read_stats, np.clip(codes, 0, FILTER_RESULT_TYPES - 1),
                  counts)

    def add_read_trimmed(self, bases):
        self.trimmed_adapter_bases += int(bases)
        self.trimmed_adapter_reads += 1

    def add_adapter_trimmed(self, adapter: str, count: int = 1):
        if not adapter:
            return
        self.adapter_counts[adapter] = self.adapter_counts.get(adapter, 0) + count

    def add_polyx_trimmed(self, base: int, length: int, reads: int = 1):
        self.trimmed_polyx_reads[base] += reads
        self.trimmed_polyx_bases[base] += length

    def total_polyx_trimmed_reads(self):
        return int(self.trimmed_polyx_reads.sum())

    def total_polyx_trimmed_bases(self):
        return int(self.trimmed_polyx_bases.sum())

    def sorted_adapters(self):
        """(length, lex) ordering like the reference classcomp map
        (src/filterresult.h:14-23)."""
        return sorted(self.adapter_counts.items(),
                      key=lambda kv: (len(kv[0]), kv[0]))

    @staticmethod
    def merge(results):
        if not results:
            return None
        out = FilterResult()
        for r in results:
            out.filter_read_stats += r.filter_read_stats
            out.trimmed_adapter_reads += r.trimmed_adapter_reads
            out.trimmed_adapter_bases += r.trimmed_adapter_bases
            out.trimmed_polyx_reads += r.trimmed_polyx_reads
            out.trimmed_polyx_bases += r.trimmed_polyx_bases
            for k, v in r.adapter_counts.items():
                out.adapter_counts[k] = out.adapter_counts.get(k, 0) + v
        return out

    def print_summary(self, out, opt):
        s = self.filter_read_stats
        out.write("reads passed filter: %d\n" % s[PASS_FILTER])
        out.write("reads failed due to low quality: %d\n" % s[FAIL_QUALITY])
        out.write("reads failed due to too many N: %d\n" % s[FAIL_N_BASE])
        if opt.length_filter.enabled:
            out.write("reads failed due to too short: %d\n" % s[FAIL_LENGTH])
            if opt.length_filter.max_length > 0:
                out.write("reads failed due to too long: %d\n" % s[FAIL_TOO_LONG])
        if opt.complexity_filter.enabled:
            out.write("reads failed due to low complexity: %d\n" % s[FAIL_COMPLEXITY])
        if opt.adapter.enabled:
            out.write("reads with adapter trimmed: %d\n" % self.trimmed_adapter_reads)
            out.write("bases trimmed due to adapters: %d\n" % self.trimmed_adapter_bases)
        if opt.polyx_trim.enabled:
            out.write("reads with polyX in 3' end: %d\n" % self.total_polyx_trimmed_reads())
            out.write("bases trimmed in polyX tail: %d\n" % self.total_polyx_trimmed_bases())
