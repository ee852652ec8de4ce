"""CLI help-text parity: every reference flag (src/main.cpp:29-103) must
appear in --help with a non-empty description."""

import pytest

from fastplong_tpu.main import build_parser

REFERENCE_FLAGS = [
    "--in", "--out", "--failed_out", "--compression", "--stdin", "--stdout",
    "--reads_to_process", "--dont_overwrite", "--verbose",
    "--disable_adapter_trimming", "--start_adapter", "--end_adapter",
    "--adapter_fasta", "--distance_threshold", "--trimming_extension",
    "--trim_front", "--trim_tail", "--trim_poly_x", "--poly_x_min_len",
    "--cut_front", "--cut_tail", "--cut_window_size", "--cut_mean_quality",
    "--cut_front_window_size", "--cut_front_mean_quality",
    "--cut_tail_window_size", "--cut_tail_mean_quality",
    "--mask", "--mask_window_size", "--mask_mean_quality",
    "--break", "--break_window_size", "--break_mean_quality",
    "--disable_quality_filtering", "--qualified_quality_phred",
    "--unqualified_percent_limit", "--n_base_limit", "--n_percent_limit",
    "--mean_qual", "--disable_length_filtering", "--length_required",
    "--length_limit", "--low_complexity_filter", "--complexity_threshold",
    "--json", "--html", "--report_title", "--thread",
    "--split", "--split_by_lines", "--split_prefix_digits",
]


def test_help_mentions_every_flag():
    text = build_parser().format_help()
    for flag in REFERENCE_FLAGS:
        assert flag in text, "flag %s missing from --help" % flag


def test_every_option_has_help_text():
    p = build_parser()
    for action in p._actions:
        assert action.help, "no help text for %s" % action.option_strings


def test_help_exits_zero():
    with pytest.raises(SystemExit) as e:
        build_parser().parse_args(["--help"])
    assert e.value.code == 0
