"""Configuration system.

Dataclasses mirror the reference option structs one-to-one so that CLI flags,
defaults, and validation ranges match (reference src/options.h:20-268,
src/options.cpp:68-207, src/main.cpp:29-103).  These are plain host-side
configs; the device pipeline derives a static `KernelConfig` from them when
tracing the per-batch computation.
"""

from dataclasses import dataclass, field
from typing import List

from .util import error_exit, check_file_valid, file_exists


@dataclass
class MaskOptions:
    enabled: bool = False
    window_size: int = 20   # CLI default is 50 (main.cpp:67); struct default 20
    quality: int = 15       # CLI default is 10 (main.cpp:68); struct default 15


@dataclass
class BreakOptions:
    enabled: bool = False
    window_size: int = 20   # CLI default is 100 (main.cpp:72); struct default 20
    quality: int = 15       # CLI default is 10 (main.cpp:73); struct default 15


@dataclass
class LowComplexityFilterOptions:
    enabled: bool = False
    threshold: float = 0.3


@dataclass
class PolyXTrimmerOptions:
    enabled: bool = False
    min_len: int = 10


@dataclass
class QualityCutOptions:
    enabled_front: bool = False
    enabled_tail: bool = False
    window_size_shared: int = 4
    quality_shared: int = 20
    window_size_front: int = 4
    quality_front: int = 20
    window_size_tail: int = 4
    quality_tail: int = 20


@dataclass
class SplitOptions:
    enabled: bool = False
    number: int = 0
    size: int = 0            # reads per file (lines/4)
    digits: int = 4
    need_evaluation: bool = False
    by_file_number: bool = False
    by_file_lines: bool = False


@dataclass
class AdapterOptions:
    enabled: bool = True
    sequence_start: str = "auto"
    sequence_end: str = "auto"
    seqs_in_fasta: List[str] = field(default_factory=list)
    fasta_file: str = ""
    detected: bool = False
    has_fasta: bool = False
    trimming_extension: int = 10
    ed_max: float = 0.25


@dataclass
class TrimmingOptions:
    front: int = 0
    tail: int = 0


@dataclass
class QualityFilteringOptions:
    enabled: bool = True
    qualified_qual: int = ord("0")  # phred33-encoded char value; '0' == Q15
    unqualified_percent_limit: int = 40
    n_base_limit: int = 1000000
    n_base_percent_limit: int = 10
    avg_qual_req: int = 0


@dataclass
class ReadLengthFilteringOptions:
    enabled: bool = True     # CLI enables by default (main.cpp:199)
    required_length: int = 20
    max_length: int = 0


@dataclass
class Options:
    in_file: str = ""
    out: str = ""
    failed_out: str = ""
    json_file: str = "fastplong.json"
    html_file: str = "fastplong.html"
    report_title: str = "fastplong report"
    compression: int = 4
    dont_overwrite: bool = False
    input_from_stdin: bool = False
    output_to_stdout: bool = False
    reads_to_process: int = 0
    thread: int = 3
    # TPU-native extension: run the device step data-parallel over this
    # many accelerator devices (jax mesh); 1 = single-device fast path
    devices: int = 1
    # jax.profiler trace output directory ("" = disabled)
    profile_dir: str = ""
    # statistics backend: "device" (donated on-device accumulators),
    # "host" (native host pass per batch; better on weak device links), or
    # "auto" (host on tunneled links, device on directly-attached)
    stats_backend: str = "auto"
    # single-file multi-host sharding (TPU-native extension, multihost.py):
    # this process handles record-aligned byte range host_index/num_hosts
    num_hosts: int = 1
    host_index: int = 0
    byte_range: tuple = None       # set by main() from compute_range
    json_file_base: str = ""       # unprefixed report paths (merged report)
    html_file_base: str = ""
    seq_len: int = 151
    trim: TrimmingOptions = field(default_factory=TrimmingOptions)
    qualfilter: QualityFilteringOptions = field(default_factory=QualityFilteringOptions)
    length_filter: ReadLengthFilteringOptions = field(default_factory=ReadLengthFilteringOptions)
    adapter: AdapterOptions = field(default_factory=AdapterOptions)
    split: SplitOptions = field(default_factory=SplitOptions)
    quality_cut: QualityCutOptions = field(default_factory=QualityCutOptions)
    polyx_trim: PolyXTrimmerOptions = field(default_factory=PolyXTrimmerOptions)
    complexity_filter: LowComplexityFilterOptions = field(default_factory=LowComplexityFilterOptions)
    mask: MaskOptions = field(default_factory=MaskOptions)
    break_opt: BreakOptions = field(default_factory=BreakOptions)
    verbose: bool = False
    writer_buffer_size: int = 1 << 22
    is_rna: bool = False
    command: str = ""

    # ---- derived helpers (reference src/options.cpp:27-66,209-259) ----

    def adapter_cutting_enabled(self) -> bool:
        if self.adapter.enabled:
            if self.adapter.sequence_start or self.adapter.sequence_end:
                return True
        return False

    def polyx_trimming_enabled(self) -> bool:
        return self.polyx_trim.enabled

    def shall_detect_adapter(self) -> bool:
        if not self.adapter.enabled:
            return False
        return (self.adapter.sequence_start == "auto"
                or self.adapter.sequence_end == "auto")

    def get_read_start_adapter(self) -> str:
        a = self.adapter.sequence_start
        return "unspecified" if a in ("", "auto") else a

    def get_read_end_adapter(self) -> str:
        a = self.adapter.sequence_end
        return "unspecified" if a in ("", "auto") else a

    def load_fasta_adapters(self):
        from .io.fasta import FastaReader
        if not self.adapter.fasta_file:
            self.adapter.has_fasta = False
            return
        check_file_valid(self.adapter.fasta_file)
        reader = FastaReader(self.adapter.fasta_file)
        reader.read_all()
        # reference iterates a std::map -> contig-name order (options.cpp:52)
        for _name, seq in sorted(reader.contigs.items()):
            if len(seq) >= 6:
                self.adapter.seqs_in_fasta.append(seq)
            else:
                import sys
                sys.stderr.write(
                    "skip too short adapter sequence in %s (6bp required): %s\n"
                    % (self.adapter.fasta_file, seq))
        self.adapter.has_fasta = len(self.adapter.seqs_in_fasta) > 0

    def validate(self) -> bool:
        """Range checks, mirroring reference src/options.cpp:68-207."""
        import sys
        if not self.in_file:
            error_exit("read input should be specified by --in, or enable "
                       "--stdin if you want to read STDIN")
        else:
            check_file_valid(self.in_file)

        if self.output_to_stdout and self.out:
            sys.stderr.write("In STDOUT mode, ignore the output filename %s\n"
                             % self.out)
            self.out = ""
        if self.output_to_stdout and self.split.enabled:
            error_exit("splitting mode cannot work with stdout mode")

        if self.out and self.dont_overwrite and file_exists(self.out):
            error_exit(self.out + " already exists and you have set to not "
                       "rewrite output files by --dont_overwrite")
        if self.failed_out:
            if self.dont_overwrite and file_exists(self.failed_out):
                error_exit(self.failed_out + " already exists and you have set"
                           " to not rewrite output files by --dont_overwrite")
            if self.failed_out == self.out:
                error_exit("--failed_out and --out shouldn't have same file name")
        if self.dont_overwrite:
            if file_exists(self.json_file):
                error_exit(self.json_file + " already exists and you have set "
                           "to not rewrite output files by --dont_overwrite")
            if file_exists(self.html_file):
                error_exit(self.html_file + " already exists and you have set "
                           "to not rewrite output files by --dont_overwrite")

        if self.compression < 1 or self.compression > 9:
            error_exit("compression level (--compression) should be between "
                       "1 ~ 9, 1 for fastest, 9 for smallest")
        if self.reads_to_process < 0:
            error_exit("the number of reads to process (--reads_to_process) "
                       "cannot be negative")

        if self.thread < 1:
            self.thread = 1
        elif self.thread > 16:
            sys.stderr.write("WARNING: fastp uses up to 16 threads although "
                             "you specified %d\n" % self.thread)
            self.thread = 16

        if self.trim.front < 0:
            error_exit("trim_front1 (--trim_front1) should be >0, suggest 0 ~ 100")
        if self.trim.tail < 0:
            error_exit("trim_tail1 (--trim_tail1) should be >0, suggest 0 ~ 100")

        if self.qualfilter.qualified_qual - 33 < 0 or self.qualfilter.qualified_qual - 33 > 93:
            error_exit("qualitified phred (--qualified_quality_phred) should "
                       "be 0 ~ 93, suggest 3 ~ 20")
        if self.qualfilter.avg_qual_req < 0 or self.qualfilter.avg_qual_req > 93:
            error_exit("average quality score requirement (--mean_qual) "
                       "should be 0 ~ 93, suggest 5 ~ 30")
        if self.qualfilter.unqualified_percent_limit < 0 or self.qualfilter.unqualified_percent_limit > 100:
            error_exit("unqualified percent limit (--unqualified_percent_limit)"
                       " should be 0 ~ 100, suggest 20 ~ 60")
        if self.qualfilter.n_base_percent_limit < 0 or self.qualfilter.n_base_percent_limit > 100:
            error_exit("N base percent limit (--n_percent_limit) should be "
                       "0 ~ 100, suggest 5 ~ 20")
        if self.qualfilter.n_base_limit < 0 or self.qualfilter.n_base_limit > 1000000:
            error_exit("N base number limit (--n_base_limit) should be 0 ~ 1000000")
        if self.length_filter.required_length < 0:
            error_exit("length requirement (--length_required) should be >0, "
                       "suggest >50")

        if self.split.enabled:
            if self.split.digits < 0 or self.split.digits > 10:
                error_exit("you have enabled splitting output to multiple "
                           "files, the digits number of file name prefix "
                           "(--split_prefix_digits) should be 0 ~ 10.")
            if self.split.by_file_number:
                if self.split.number < 2 or self.split.number >= 1000:
                    error_exit("you have enabled splitting output by file "
                               "number, the number of files (--split) should "
                               "be 2 ~ 999.")
                if self.thread > self.split.number:
                    self.thread = self.split.number
            if self.split.by_file_lines:
                if self.split.size < 1000 // 4:
                    error_exit("you have enabled splitting output by file "
                               "lines, the file lines (--split_by_lines) "
                               "should be >= 1000.")

        qc = self.quality_cut
        if qc.enabled_front or qc.enabled_tail:
            if qc.window_size_shared < 1 or qc.window_size_shared > 1000:
                error_exit("the sliding window size for cutting by quality "
                           "(--cut_window_size) should be between 1~1000.")
            if qc.quality_shared < 1 or qc.quality_shared > 30:
                error_exit("the mean quality requirement for cutting by "
                           "quality (--cut_mean_quality) should be 1 ~ 30, "
                           "suggest 15 ~ 20.")
            if qc.window_size_front < 1 or qc.window_size_front > 1000:
                error_exit("the sliding window size for cutting by quality "
                           "(--cut_front_window_size) should be between 1~1000.")
            if qc.quality_front < 1 or qc.quality_front > 30:
                error_exit("the mean quality requirement for cutting by "
                           "quality (--cut_front_mean_quality) should be "
                           "1 ~ 30, suggest 15 ~ 20.")
            if qc.window_size_tail < 1 or qc.window_size_tail > 1000:
                error_exit("the sliding window size for cutting by quality "
                           "(--cut_tail_window_size) should be between 1~1000.")
            if qc.quality_tail < 1 or qc.quality_tail > 30:
                error_exit("the mean quality requirement for cutting by "
                           "quality (--cut_tail_mean_quality) should be "
                           "1 ~ 30, suggest 13 ~ 20.")

        a = self.adapter
        if a.sequence_start != "auto" and a.sequence_start != "":
            if len(a.sequence_start) <= 3:
                error_exit("the sequence of <adapter_sequence> should be "
                           "longer than 3")
            for c in a.sequence_start:
                if c not in "ATCG":
                    error_exit("the adapter <adapter_sequence> can only have "
                               "bases in {A, T, C, G}, but the given sequence"
                               " is: " + a.sequence_start)
        if a.ed_max < 0 or a.ed_max > 1.0:
            error_exit("the adapter <distance_threshold> should be 0.0 ~ 1.0,"
                       " suggest 0.1 ~ 0.3")
        if a.trimming_extension < 0 or a.trimming_extension > 100:
            error_exit("the adapter <trimming_extension> should be 0 ~ 100, "
                       "suggest 5 ~ 30")
        return True
