"""CLI entry point — flag-for-flag compatible with the reference fastplong
(src/main.cpp:29-103 defines the flag set and defaults).
"""

import argparse
import sys
import time

from .common import VERSION
from .config import Options
from .util import error_exit, num2qual, reverse_complement


def build_parser():
    p = argparse.ArgumentParser(
        prog="fastplong",
        description="ultra-fast FASTQ preprocessing and quality control for "
                    "long reads (TPU-native)",
        add_help=False)
    a = p.add_argument
    a("--help", action="help")
    a("-v", "--version", action="version",
      version="fastplong %s" % VERSION)
    # input/output
    a("-i", "--in", dest="in_file", default="")
    a("-o", "--out", default="")
    a("--failed_out", default="")
    a("-z", "--compression", type=int, default=4)
    a("--stdin", action="store_true")
    a("--stdout", action="store_true")
    a("--reads_to_process", type=int, default=0)
    a("--dont_overwrite", action="store_true")
    a("-V", "--verbose", action="store_true")
    # adapter
    a("-A", "--disable_adapter_trimming", action="store_true")
    a("-s", "--start_adapter", default="auto")
    a("-e", "--end_adapter", default="auto")
    a("-a", "--adapter_fasta", default="")
    a("-d", "--distance_threshold", type=float, default=0.25)
    a("--trimming_extension", type=int, default=10)
    # trimming
    a("-f", "--trim_front", type=int, default=0)
    a("-t", "--trim_tail", type=int, default=0)
    # polyX
    a("-x", "--trim_poly_x", action="store_true")
    a("--poly_x_min_len", type=int, default=10)
    # quality cutting
    a("-5", "--cut_front", action="store_true")
    a("-3", "--cut_tail", action="store_true")
    a("-W", "--cut_window_size", type=int, default=None)
    a("-M", "--cut_mean_quality", type=int, default=None)
    a("--cut_front_window_size", type=int, default=None)
    a("--cut_front_mean_quality", type=int, default=None)
    a("--cut_tail_window_size", type=int, default=None)
    a("--cut_tail_mean_quality", type=int, default=None)
    # masking
    a("-N", "--mask", action="store_true")
    a("--mask_window_size", type=int, default=50)
    a("--mask_mean_quality", type=int, default=10)
    # breaking
    a("-b", "--break", dest="break_", action="store_true")
    a("--break_window_size", type=int, default=100)
    a("--break_mean_quality", type=int, default=10)
    # quality filtering
    a("-Q", "--disable_quality_filtering", action="store_true")
    a("-q", "--qualified_quality_phred", type=int, default=15)
    a("-u", "--unqualified_percent_limit", type=int, default=40)
    a("--n_base_limit", type=int, default=1000000)
    a("-n", "--n_percent_limit", type=int, default=10)
    a("-m", "--mean_qual", type=int, default=0)
    # length filtering
    a("-L", "--disable_length_filtering", action="store_true")
    a("-l", "--length_required", type=int, default=20)
    a("--length_limit", type=int, default=0)
    # low complexity filter
    a("-y", "--low_complexity_filter", action="store_true")
    a("-Y", "--complexity_threshold", type=int, default=30)
    # reporting
    a("-j", "--json", default="fastplong.json")
    a("-h", "--html", default="fastplong.html")
    a("-R", "--report_title", default="fastplong report")
    # threading
    a("-w", "--thread", type=int, default=3)
    # splitting
    a("--split", type=int, default=0)
    a("--split_by_lines", type=int, default=0)
    a("--split_prefix_digits", type=int, default=4)
    return p


def options_from_args(args, argv):
    opt = Options()
    opt.in_file = args.in_file
    opt.out = args.out
    opt.failed_out = args.failed_out
    opt.compression = args.compression
    opt.reads_to_process = args.reads_to_process
    opt.dont_overwrite = args.dont_overwrite
    opt.input_from_stdin = args.stdin
    opt.output_to_stdout = args.stdout
    opt.verbose = args.verbose

    opt.adapter.enabled = not args.disable_adapter_trimming
    opt.adapter.sequence_start = args.start_adapter
    opt.adapter.sequence_end = args.end_adapter
    opt.adapter.fasta_file = args.adapter_fasta
    opt.adapter.ed_max = args.distance_threshold
    opt.adapter.trimming_extension = args.trimming_extension
    # end adapter defaults to revcomp of start (main.cpp:138-140)
    if opt.adapter.sequence_start != "auto" and opt.adapter.sequence_end == "auto":
        opt.adapter.sequence_end = reverse_complement(opt.adapter.sequence_start)
    if opt.adapter.fasta_file:
        opt.load_fasta_adapters()

    opt.trim.front = args.trim_front
    opt.trim.tail = args.trim_tail

    opt.polyx_trim.enabled = args.trim_poly_x
    opt.polyx_trim.min_len = args.poly_x_min_len

    qc = opt.quality_cut
    qc.enabled_front = args.cut_front
    qc.enabled_tail = args.cut_tail
    qc.window_size_shared = args.cut_window_size if args.cut_window_size is not None else 4
    qc.quality_shared = args.cut_mean_quality if args.cut_mean_quality is not None else 20
    qc.window_size_front = (args.cut_front_window_size
                            if args.cut_front_window_size is not None
                            else qc.window_size_shared)
    qc.quality_front = (args.cut_front_mean_quality
                        if args.cut_front_mean_quality is not None
                        else qc.quality_shared)
    qc.window_size_tail = (args.cut_tail_window_size
                           if args.cut_tail_window_size is not None
                           else qc.window_size_shared)
    qc.quality_tail = (args.cut_tail_mean_quality
                       if args.cut_tail_mean_quality is not None
                       else qc.quality_shared)
    if not qc.enabled_front and not qc.enabled_tail:
        if any(v is not None for v in (
                args.cut_window_size, args.cut_mean_quality,
                args.cut_front_window_size, args.cut_front_mean_quality,
                args.cut_tail_window_size, args.cut_tail_mean_quality)):
            sys.stderr.write(
                "WARNING: you specified the options for cutting by quality, "
                "but forgot to enable any of cut_front/cut_tail/cut_right. "
                "This will have no effect.\n")

    opt.qualfilter.enabled = not args.disable_quality_filtering
    opt.qualfilter.qualified_qual = ord(num2qual(args.qualified_quality_phred))
    opt.qualfilter.unqualified_percent_limit = args.unqualified_percent_limit
    opt.qualfilter.avg_qual_req = args.mean_qual
    opt.qualfilter.n_base_percent_limit = args.n_percent_limit
    opt.qualfilter.n_base_limit = args.n_base_limit

    opt.length_filter.enabled = not args.disable_length_filtering
    opt.length_filter.required_length = args.length_required
    opt.length_filter.max_length = args.length_limit

    opt.complexity_filter.enabled = args.low_complexity_filter
    opt.complexity_filter.threshold = min(100, max(0, args.complexity_threshold)) / 100.0

    opt.mask.enabled = args.mask
    opt.mask.window_size = args.mask_window_size
    opt.mask.quality = args.mask_mean_quality

    opt.break_opt.enabled = args.break_
    opt.break_opt.window_size = args.break_window_size
    opt.break_opt.quality = args.break_mean_quality

    opt.thread = args.thread

    opt.json_file = args.json
    opt.html_file = args.html
    opt.report_title = args.report_title

    opt.split.enabled = args.split > 0 or args.split_by_lines > 0
    opt.split.digits = args.split_prefix_digits
    if args.split > 0 and args.split_by_lines > 0:
        error_exit("You cannot set both splitting by file number (--split) "
                   "and splitting by file lines (--split_by_lines), please "
                   "choose either.")
    if args.split > 0:
        opt.split.number = args.split
        opt.split.need_evaluation = True
        opt.split.by_file_number = True
    if args.split_by_lines > 0:
        if args.split_by_lines % 4 != 0:
            error_exit("Line number (--split_by_lines) should be a multiple of 4")
        opt.split.size = args.split_by_lines // 4
        opt.split.need_evaluation = False
        opt.split.by_file_lines = True

    if opt.input_from_stdin or opt.in_file == "/dev/stdin":
        if opt.split.need_evaluation:
            error_exit("Splitting by file number is not supported in STDIN mode")

    # reference builds the command string with a trailing space (main.cpp:252-256)
    opt.command = "".join(a + " " for a in argv)
    return opt


def main(argv=None):
    if argv is None:
        argv = sys.argv
    if len(argv) == 1:
        sys.stderr.write(
            "fastplong: ultra-fast FASTQ preprocessing and quality control "
            "for long reads\nversion %s\n" % VERSION)
        build_parser().print_usage(sys.stderr)
        return 0
    args = build_parser().parse_args(argv[1:])
    opt = options_from_args(args, argv)

    t1 = time.time()
    from .processor import process
    process(opt)
    t2 = time.time()

    sys.stderr.write("\nJSON report: %s\n" % opt.json_file)
    sys.stderr.write("HTML report: %s\n" % opt.html_file)
    sys.stderr.write("\n%s\n" % opt.command)
    sys.stderr.write("fastplong v%s, time used: %d seconds\n"
                     % (VERSION, int(t2 - t1)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
