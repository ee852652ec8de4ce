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
    import time
    _ph = {}
    _t0 = time.perf_counter()
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

    _ph["evaluator"] = time.perf_counter() - _t0
    _t0 = time.perf_counter()
    from .pipeline.runner import SingleEndRunner
    runner = SingleEndRunner(opt)
    _ph["runner_init"] = time.perf_counter() - _t0
    _t0 = time.perf_counter()
    if getattr(opt, "profile_dir", ""):
        # --profile DIR: capture a jax.profiler trace of the whole run
        # (device timelines + host python spans; view with tensorboard)
        import jax
        with jax.profiler.trace(opt.profile_dir):
            pre_stats, post_stats, filter_result = runner.run()
    else:
        pre_stats, post_stats, filter_result = runner.run()

    _ph["runner_run"] = time.perf_counter() - _t0
    _t0 = time.perf_counter()

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
    _ph["reports"] = time.perf_counter() - _t0

    import os
    dump = os.environ.get("FASTPLONG_TIMER_DUMP")
    if dump:
        # diagnostics: per-stage wall breakdown + transfer accounting of
        # THIS run, written as one JSON file (runtime-read env var, so it
        # reaches daemon-resident jobs too)
        import json
        try:
            with open(dump, "w") as f:
                json.dump({
                    "phase_seconds": {k: round(v, 4)
                                      for k, v in _ph.items()},
                    "stage_seconds": runner.timer.report(),
                    "bytes_h2d": runner.bytes_h2d,
                    "bytes_d2h": runner.bytes_d2h,
                    "exec_load_seconds": runner.load_seconds,
                    "fetch_log": runner._fetch_log,
                    "host_fallback": bool(runner._fallback),
                    "link_profile": runner.link.profile,
                    "stream_feed": bool(runner.link.stream_feed),
                }, f)
        except OSError:
            pass
    return pre_stats, post_stats, filter_result
