"""Top-level processing flow.

Mirrors the reference main() sequence (src/main.cpp:258-305): evaluator
pre-passes (sequence length / RNA check, adapter auto-detection, read-count
estimation for splitting), option validation, then the pipeline run and
reports (src/seprocessor.cpp:105-146).
"""

import sys

from .evaluator import Evaluator
from .report.json_report import report_json
from .report.html_report import report_html


def process(opt):
    support_evaluation = (not opt.input_from_stdin
                          and opt.in_file != "/dev/stdin")

    eva = Evaluator(opt)
    if support_evaluation:
        # one shared prefix pass feeds seq-len/RNA, adapter detection and
        # read-count estimation (the reference re-opens the input per pass,
        # main.cpp:262-293; SURVEY hard-part 6 folds them)
        eva.load_prefix(opt.shall_detect_adapter(),
                        opt.split.need_evaluation)
        eva.evaluate_seq_len_and_check_rna()

    read_num = 0
    if opt.shall_detect_adapter():
        if not support_evaluation:
            sys.stderr.write("Adapter auto-detection is disabled for STDIN mode\n")
        else:
            read_num = eva.eval_adapter_and_read_num()
            sys.stderr.write("\n")

    opt.validate()

    if opt.split.need_evaluation and support_evaluation:
        if read_num == 0:
            read_num = eva.evaluate_read_num()
        opt.split.size = read_num // opt.split.number
        if opt.split.size <= 0:
            opt.split.size = 1
            sys.stderr.write("WARNING: the input file has less reads than the"
                             " number of files to split\n")

    from .pipeline.runner import SingleEndRunner
    runner = SingleEndRunner(opt)
    if getattr(opt, "profile_dir", ""):
        # --profile DIR: capture a jax.profiler trace of the whole run
        # (device timelines + host python spans; view with tensorboard)
        import jax
        with jax.profiler.trace(opt.profile_dir):
            pre_stats, post_stats, filter_result = runner.run()
    else:
        pre_stats, post_stats, filter_result = runner.run()

    if opt.verbose:
        from .util import loginfo
        loginfo("start to generate reports\n")

    sys.stderr.write("Before filtering:\n")
    pre_stats.print_summary(sys.stderr)
    sys.stderr.write("\n")
    sys.stderr.write("After filtering:\n")
    post_stats.print_summary(sys.stderr)
    sys.stderr.write("\n")
    sys.stderr.write("Filtering result:\n")
    filter_result.print_summary(sys.stderr, opt)

    report_json(opt, filter_result, pre_stats, post_stats)
    report_html(opt, filter_result, pre_stats, post_stats)
    return pre_stats, post_stats, filter_result
