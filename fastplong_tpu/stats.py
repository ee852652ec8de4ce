"""Run-level statistics accumulation and summarization.

Host-side owner of the totals produced by ops.stats_kernels.stat_batch.
Mirrors the reference Stats engine (src/stats.cpp): per-cycle arrays grown
on demand (extendBuffer, stats.cpp:75-119), summarize() totals and curves
(stats.cpp:150-256), length histogram with N50/median (stats.cpp:377-409),
and cross-shard merge (stats.cpp:1013-1082).

All accumulators are numpy int64 — device batches deliver int32 partials
which cannot overflow within a batch.
"""

import numpy as np

KMER_LEN = 5
KMER_BUF = 2 << (KMER_LEN * 2)  # 2048, matching reference mKmerBufLen quirk


class Stats:
    def __init__(self, is_rna=False, guessed_cycles=0):
        self.is_rna = is_rna
        self.reads = 0
        self.length_sum = 0
        self.buf_len = max(guessed_cycles, 1)
        self.cycle_q20 = np.zeros((8, self.buf_len), np.int64)
        self.cycle_q30 = np.zeros((8, self.buf_len), np.int64)
        self.cycle_content = np.zeros((8, self.buf_len), np.int64)
        self.cycle_qual = np.zeros((8, self.buf_len), np.int64)
        self.cycle_total_base = np.zeros(self.buf_len, np.int64)
        self.cycle_total_qual = np.zeros(self.buf_len, np.int64)
        self.base_qual_hist = np.zeros(128, np.int64)
        self.median_qual_hist = np.zeros(128, np.int64)
        self.median_qual_bases = np.zeros(128, np.int64)
        self.kmer = np.zeros(1024, np.int64)
        self._length_chunks = []     # list of np arrays of read lengths
        self._qual_len_chunks = []   # list of (median_bytes, lengths) pairs
        self.summarized = False
        # summarize() products
        self.cycles = 0
        self.bases = 0
        self.q5_total = self.q7_total = self.q10_total = 0
        self.q15_total = self.q20_total = self.q30_total = self.q40_total = 0
        self.q20_bases = np.zeros(8, np.int64)
        self.q30_bases = np.zeros(8, np.int64)
        self.base_contents = np.zeros(8, np.int64)
        self.quality_curves = {}
        self.content_curves = {}
        self.kmer_min = 0
        self.kmer_max = 0
        # length histogram products
        self.min_len = 0
        self.max_len = 0
        self.median_len = 0
        self.n50_len = 0
        self.length_hist = {}

    # ------------------------------------------------------------ accumulate

    def _ensure(self, n):
        if n <= self.buf_len:
            return
        new_len = max(n, int(self.buf_len * 1.5))
        for name in ("cycle_q20", "cycle_q30", "cycle_content", "cycle_qual"):
            old = getattr(self, name)
            buf = np.zeros((8, new_len), np.int64)
            buf[:, :old.shape[1]] = old
            setattr(self, name, buf)
        for name in ("cycle_total_base", "cycle_total_qual"):
            old = getattr(self, name)
            buf = np.zeros(new_len, np.int64)
            buf[:old.shape[0]] = old
            setattr(self, name, buf)
        self.buf_len = new_len

    def add_device_partial(self, partial):
        """Accumulate device tensors (cycle arrays, qual hist, kmer).

        Device drains reduce Q20/Q30 to per-base totals ("q20_totals";
        nothing reads them at cycle resolution — summarize() only sums,
        stats.py:137-138).  They are folded into cycle 0, which leaves
        every consumer (sum over cycles) and merge() exact.  Host-side
        partials (monster reads, oracle tests) still deliver the full
        [8, L] arrays."""
        L = partial["cycle_total_base"].shape[0]
        self._ensure(L)
        if "q20_totals" in partial:
            self.cycle_q20[:, 0] += partial["q20_totals"]
            self.cycle_q30[:, 0] += partial["q30_totals"]
        else:
            self.cycle_q20[:, :L] += partial["cycle_q20"]
            self.cycle_q30[:, :L] += partial["cycle_q30"]
        self.cycle_content[:, :L] += partial["cycle_content"]
        self.cycle_qual[:, :L] += partial["cycle_qual"]
        self.cycle_total_base[:L] += partial["cycle_total_base"]
        self.cycle_total_qual[:L] += partial["cycle_total_qual"]
        self.base_qual_hist += partial["base_qual_hist"]
        self.kmer += partial["kmer"]
        self.summarized = False

    def add_read_level(self, rlen, median, read_mask, order=None):
        """Accumulate per-read records (lengths, median-quality stats).

        order: optional int64 per-row global input ordinal; used to make the
        median-qual/length pair listing match the reference's single-thread
        insertion order in the HTML density plot.
        """
        rlen = np.asarray(rlen)
        median = np.asarray(median)
        mask = np.asarray(read_mask).astype(bool)
        rlen = np.where(mask, rlen, 0)
        live = rlen > 0
        # reads with rlen == 0 still count as reads (statRead always runs),
        # but medians are only recorded for len > 0 (stats.cpp:351-370)
        self.reads += int(mask.sum())
        self.length_sum += int(rlen.sum())
        self._length_chunks.append(rlen[mask].copy())
        med = median[live]
        ln = rlen[live]
        np.add.at(self.median_qual_hist, med, 1)
        np.add.at(self.median_qual_bases, med, ln)
        if order is None:
            order = np.arange(len(rlen), dtype=np.int64)
        self._qual_len_chunks.append((med.copy(), ln.copy(),
                                      np.asarray(order)[live].copy()))
        self.summarized = False

    def add_batch(self, partial, order=None):
        """Accumulate a full stat_batch() result dict (host numpy arrays)."""
        self.add_device_partial(partial)
        self.add_read_level(partial["rlen"], partial["median"],
                            partial["read_mask"], order)

    # ------------------------------------------------------------- summarize

    def summarize(self, forced=False):
        if self.summarized and not forced:
            return
        ctb = self.cycle_total_base
        nz = np.flatnonzero(ctb == 0)
        if len(nz) == 0:
            self.cycles = self.buf_len
            self.bases = int(ctb.sum())
        else:
            self.cycles = int(nz[0])
            self.bases = int(ctb[:self.cycles].sum())

        c = self.cycles
        self.q20_bases = self.cycle_q20[:, :c].sum(axis=1)
        self.q30_bases = self.cycle_q30[:, :c].sum(axis=1)
        self.base_contents = self.cycle_content[:, :c].sum(axis=1)

        # Q-score totals from the quality histogram (stats.cpp:176-202)
        h = self.base_qual_hist
        def qsum(lo_phred, hi_phred):
            return int(h[lo_phred + 33:hi_phred + 33].sum())
        self.q40_total = qsum(40, 127 - 33)
        self.q30_total = self.q40_total + qsum(30, 40)
        self.q20_total = self.q30_total + qsum(20, 30)
        self.q15_total = self.q20_total + qsum(15, 20)
        self.q10_total = self.q15_total + qsum(10, 15)
        self.q7_total = self.q10_total + qsum(7, 10)
        self.q5_total = self.q7_total + qsum(5, 7)

        with np.errstate(divide="ignore", invalid="ignore"):
            mean_qual = self.cycle_total_qual[:c] / ctb[:c]
        self.quality_curves = {"mean": mean_qual}
        alphabets = ["A", "U" if self.is_rna else "T", "C", "G", "N"]
        for base in alphabets:
            b = ord(base) & 0x07
            cont = self.cycle_content[b, :c]
            with np.errstate(divide="ignore", invalid="ignore"):
                qc = np.where(cont == 0, mean_qual, self.cycle_qual[b, :c] /
                              np.maximum(cont, 1))
                cc = cont / ctb[:c]
            self.quality_curves[base] = qc
            self.content_curves[base] = cc
        g, cb = ord("G") & 7, ord("C") & 7
        with np.errstate(divide="ignore", invalid="ignore"):
            self.content_curves["GC"] = (
                (self.cycle_content[g, :c] + self.cycle_content[cb, :c]) / ctb[:c])

        self.kmer_min = int(self.kmer.min()) if len(self.kmer) else 0
        self.kmer_max = int(self.kmer.max()) if len(self.kmer) else 0
        self.summarized = True

    def calc_length_histogram(self):
        if self._length_chunks:
            lengths = np.concatenate(self._length_chunks)
        else:
            lengths = np.zeros(0, np.int64)
        vals, counts = np.unique(lengths, return_counts=True)
        self.length_hist = dict(zip(vals.tolist(), counts.tolist()))
        self.n50_len = 0
        self.median_len = 0
        self.min_len = int(vals[0]) if len(vals) else 0
        self.max_len = int(vals[-1]) if len(vals) else 0
        total_base = 0
        readnum = 0
        nvec = len(lengths)
        for ln, cnt in zip(vals.tolist(), counts.tolist()):
            total_base += ln * cnt
            if self.n50_len == 0 and total_base > self.length_sum // 2:
                self.n50_len = int(ln)
            readnum += cnt
            if self.median_len == 0 and readnum > nvec // 2:
                self.median_len = int(ln)
            if self.median_len > 0 and self.n50_len > 0:
                break

    # --------------------------------------------------------------- getters

    def get_mean_length(self):
        return 0 if self.reads == 0 else self.length_sum // self.reads

    def get_cycles(self):
        self.summarize()
        return self.cycles

    def get_reads(self):
        self.summarize()
        return self.reads

    def get_bases(self):
        self.summarize()
        return self.bases

    def get_q20(self):
        self.summarize()
        return self.q20_total

    def get_q30(self):
        self.summarize()
        return self.q30_total

    def get_gc_number(self):
        self.summarize()
        return int(self.base_contents[ord("G") & 7]
                   + self.base_contents[ord("C") & 7])

    def is_long_read(self):
        return self.cycles > 300

    def qual_length_pairs(self):
        """(median_qual_byte, length) pairs ordered like the reference's
        mQualLength map iteration: by median, then input order within a
        median (stats.cpp:679-687)."""
        if not self._qual_len_chunks:
            return np.zeros(0, np.uint8), np.zeros(0, np.int64)
        meds = np.concatenate([c[0] for c in self._qual_len_chunks])
        lens = np.concatenate([c[1] for c in self._qual_len_chunks])
        order = np.concatenate([c[2] for c in self._qual_len_chunks])
        perm = np.lexsort((order, meds))
        return meds[perm], lens[perm]

    def print_summary(self, out):
        self.summarize()
        out.write("total reads: %d\n" % self.reads)
        out.write("total bases: %d\n" % self.bases)
        from .report.cppfmt import fmt_double
        pq20 = (self.q20_total * 100.0) / self.bases if self.bases else float("nan")
        pq30 = (self.q30_total * 100.0) / self.bases if self.bases else float("nan")
        out.write("Q20 bases: %d(%s%%)\n" % (self.q20_total, fmt_double(pq20)))
        out.write("Q30 bases: %d(%s%%)\n" % (self.q30_total, fmt_double(pq30)))

    # ----------------------------------------------------------------- merge

    @staticmethod
    def merge(stats_list):
        """Merge per-shard Stats (reference stats.cpp:1013-1082)."""
        if not stats_list:
            return None
        for s in stats_list:
            s.summarize()
        cycles = max(s.get_cycles() for s in stats_list)
        out = Stats(is_rna=stats_list[0].is_rna, guessed_cycles=max(cycles, 1))
        for s in stats_list:
            cur = min(cycles, s.get_cycles())
            out.reads += s.reads
            out.length_sum += s.length_sum
            out._length_chunks.extend(s._length_chunks)
            out._qual_len_chunks.extend(s._qual_len_chunks)
            out.cycle_q20[:, :cur] += s.cycle_q20[:, :cur]
            out.cycle_q30[:, :cur] += s.cycle_q30[:, :cur]
            out.cycle_content[:, :cur] += s.cycle_content[:, :cur]
            out.cycle_qual[:, :cur] += s.cycle_qual[:, :cur]
            out.cycle_total_base[:cur] += s.cycle_total_base[:cur]
            out.cycle_total_qual[:cur] += s.cycle_total_qual[:cur]
            out.kmer += s.kmer
            out.base_qual_hist += s.base_qual_hist
            out.median_qual_hist += s.median_qual_hist
            out.median_qual_bases += s.median_qual_bases
        out.summarize()
        return out
