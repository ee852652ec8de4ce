"""HTML report writer — byte-layout-compatible with the reference
(src/htmlreporter.cpp, src/stats.cpp:590-1011, src/filterresult.cpp:227-296),
including C++ number formatting (std::to_string's fixed 6 decimals, ostream
%g) and section/whitespace layout.  Only the embedded timestamps differ
run-to-run, exactly as with the reference binary.
"""

import math
import time

import numpy as np

from ..common import (VERSION, PASS_FILTER, FAIL_N_BASE, FAIL_LENGTH,
                      FAIL_TOO_LONG, FAIL_QUALITY, FAIL_COMPLEXITY)
from .cppfmt import fmt_double
from .json_report import _kmer3, _kmer2


def _to_string_f(x) -> str:
    """std::to_string(double): fixed 6 decimals; -nan for x86 0/0."""
    x = float(x)
    if math.isnan(x):
        return "-nan" if math.copysign(1.0, x) < 0 else "nan"
    if math.isinf(x):
        return "inf" if x > 0 else "-inf"
    return "%f" % x


def _div(a, b):
    """C++ double division including inf/-nan semantics for b == 0."""
    if b == 0:
        if a == 0:
            return math.copysign(float("nan"), -1.0)
        return math.copysign(float("inf"), a)
    return a / b


def format_number(number) -> str:
    """Reference HtmlReporter::formatNumber (htmlreporter.cpp:22-35)."""
    number = int(number)
    num = float(number)
    units = ["", "K", "M", "G", "T", "P"]
    order = 0
    while num > 1000.0:
        order += 1
        num /= 1000.0
    if order == 0:
        return str(number)
    return _to_string_f(num) + " " + units[order]


def get_percents(numerator, denominator) -> str:
    if denominator == 0:
        return "0.0"
    return _to_string_f(numerator * 100.0 / denominator)


def _row(w, key, val):
    w("<tr><td class='col1'>" + key + "</td><td class='col2'>" + val
      + "</td></tr>\n")


def _current_time() -> str:
    t = time.localtime()
    return "%d-%02d-%02d      %02d:%02d:%02d" % (
        t.tm_year, t.tm_mon, t.tm_mday, t.tm_hour, t.tm_min, t.tm_sec)


_CSS_LINES = [
    "td {border:1px solid #dddddd;padding:5px;font-size:12px;}",
    "table {border:1px solid #999999;padding:2x;border-collapse:collapse;width:100%}",
    ".col1 {width:240px; font-weight:bold;}",
    ".adapter_col {width:500px; font-size:10px;}",
    "img {padding:30px;}",
    "#menu {font-family:Consolas, 'Liberation Mono', Menlo, Courier, monospace;}",
    "#menu a {color:#0366d6; font-size:18px;font-weight:600;line-height:28px;"
    "text-decoration:none;font-family:-apple-system, BlinkMacSystemFont, "
    "'Segoe UI', Helvetica, Arial, sans-serif, 'Apple Color Emoji', "
    "'Segoe UI Emoji', 'Segoe UI Symbol'}",
    "a:visited {color: #999999}",
    ".alignleft {text-align:left;}",
    ".alignright {text-align:right;}",
    ".figure {width:680px;height:600px;}",
    ".header {color:#ffffff;padding:1px;height:20px;background:#000000;}",
    ".section_title {color:#ffffff;font-size:20px;padding:5px;text-align:left;"
    "background:#663355; margin-top:10px;}",
    ".section_table {width:100%;}",
    ".subsection_title {font-size:16px;padding:5px;margin-top:10px;"
    "text-align:left;color:#663355}",
    "#container {text-align:center;padding:3px 3px 3px 10px;"
    "font-family:Arail,'Liberation Mono', Menlo, Courier, monospace;}",
    ".menu_item {text-align:left;padding-top:5px;font-size:18px;}",
    ".highlight {text-align:left;padding-top:30px;padding-bottom:30px;"
    "font-size:20px;line-height:35px;}",
    "#helper {text-align:left;border:1px dotted #fafafa;color:#777777;"
    "font-size:12px;}",
    "#footer {text-align:left;padding:15px;color:#ffffff;font-size:10px;"
    "background:#663355;font-family:Arail,'Liberation Mono', Menlo, Courier,"
    " monospace;}",
    ".kmer_table {text-align:center;font-size:8px;padding:2px;}",
    ".kmer_table td{text-align:center;font-size:8px;padding:0px;color:#ffffff}",
    ".sub_section_tips {color:#999999;font-size:10px;padding-left:5px;"
    "padding-bottom:3px;}",
]


def _header(w):
    w('<html><head><meta http-equiv="content-type" content="text/html;'
      'charset=utf-8" />')
    w("<title>fastplong report at " + _current_time() + " </title>")
    # JS (htmlreporter.cpp:220-234)
    w("<script src='https://opengene.org/plotly-1.2.0.min.js'></script>\n")
    w("\n<script type='text/javascript'>\n")
    w("    window.Plotly || document.write('<script "
      "src=\"https://cdn.plot.ly/plotly-1.2.0.min.js\"><\\/script>')\n")
    w("</script>\n")
    w('\n<script type="text/javascript">\n')
    w("    function showOrHide(divname) {\n")
    w("        div = document.getElementById(divname);\n")
    w("        if(div.style.display == 'none')\n")
    w("            div.style.display = 'block';\n")
    w("        else\n")
    w("            div.style.display = 'none';\n")
    w("    }\n")
    w("</script>\n")
    # CSS
    w('<style type="text/css">\n')
    for line in _CSS_LINES:
        w(line + "\n")
    w("</style>\n")
    w("</head>")
    w("<body><div id='container'>")


def _filter_result_html(w, fr, opt, total_reads):
    """FilterResult::reportHtml (filterresult.cpp:227-242)."""
    s = fr.filter_read_stats
    total = float(total_reads)
    w("<table class='summary_table'>\n")
    _row(w, "reads passed filters:", format_number(s[PASS_FILTER]) + " ("
         + _to_string_f(_div(s[PASS_FILTER] * 100.0, total)) + "%)")
    _row(w, "reads with low quality:", format_number(s[FAIL_QUALITY]) + " ("
         + _to_string_f(_div(s[FAIL_QUALITY] * 100.0, total)) + "%)")
    _row(w, "reads with too many N:", format_number(s[FAIL_N_BASE]) + " ("
         + _to_string_f(_div(s[FAIL_N_BASE] * 100.0, total)) + "%)")
    if opt.length_filter.enabled:
        _row(w, "reads too short:", format_number(s[FAIL_LENGTH]) + " ("
             + _to_string_f(_div(s[FAIL_LENGTH] * 100.0, total)) + "%)")
        if opt.length_filter.max_length > 0:
            _row(w, "reads too long:", format_number(s[FAIL_TOO_LONG]) + " ("
                 + _to_string_f(_div(s[FAIL_TOO_LONG] * 100.0, total)) + "%)")
    if opt.complexity_filter.enabled:
        _row(w, "reads with low complexity:",
             format_number(s[FAIL_COMPLEXITY]) + " ("
             + _to_string_f(_div(s[FAIL_COMPLEXITY] * 100.0, total)) + "%)")
    w("</table>\n")


def _summary(w, opt, fr, pre_stats):
    w("\n")
    w("<h3 style='text-align:left;'><a href='https://github.com/OpenGene/"
      "fastplong' target='_blank' style='color:#663355;text-decoration:none;'>"
      + opt.report_title + "</a><a href='https://github.com/OpenGene/fastplong'"
      " target='_blank' style='font-size:-2;text-decoration:none;'>(fastplong "
      "version v" + VERSION + ")</a></h3>\n")
    w("<div class='section_div'>\n")
    w("<div class='section_title' onclick=showOrHide('summary')>"
      "<a name='summary'>Summary</a> </div>\n")
    w("<div id='summary'>\n")
    if fr is not None:
        w("<div class='subsection_title'>Filtering result</div>\n")
        w("<div id='filtering_result'>\n")
        _filter_result_html(w, fr, opt, pre_stats.get_reads())
        w("</div>\n")
    w("</div>\n")
    w("</div>\n")


def _basic_info(w, stats, filtering_type):
    """Stats::reportHtmlBasicInfo (stats.cpp:720-744)."""
    sub = filtering_type + ": Basic statistics"
    w("<div class='subsection_title'>" + sub + "</div>\n")
    w("<table>\n")
    bases = stats.get_bases()
    _row(w, "total reads:", format_number(stats.get_reads()))
    _row(w, "total bases:", format_number(bases))
    _row(w, "minimum length:", format_number(stats.min_len))
    _row(w, "maximum length:", format_number(stats.max_len))
    _row(w, "median length:", format_number(stats.median_len))
    _row(w, "mean length:", format_number(stats.get_mean_length()))
    _row(w, "N50 length:", format_number(stats.n50_len))
    _row(w, "GC content:", get_percents(stats.get_gc_number(), bases) + "%")
    for name, total in (("Q5", stats.q5_total), ("Q7", stats.q7_total),
                        ("Q10", stats.q10_total), ("Q15", stats.q15_total),
                        ("Q20", stats.q20_total), ("Q30", stats.q30_total),
                        ("Q40", stats.q40_total)):
        _row(w, name + " bases:", format_number(total) + " ("
             + get_percents(total, bases) + "%)")
    w("</table>\n")


def _median_qual_hist(w, stats, filtering_type):
    """Stats::reporHtmlMedianQualHist (stats.cpp:590-669)."""
    sub = filtering_type + ": Read median quality statistics"
    div = sub.replace(" ", "_")
    w("<div class='subsection_title'>" + sub + "</div>\n")
    hb = stats.median_qual_bases
    h = stats.median_qual_hist
    min_val = 0
    for i in range(127 - 33):
        if hb[i + 33] == 0:
            min_val += 1
        else:
            break
    max_val = 0
    for i in range(127 - 33, -1, -1):
        if hb[i + 33] > 0:
            max_val = i
            break
    offset = max(0, min_val - 1)
    total = min(127 - 33, max_val - min_val + 2)
    total = max(0, total)
    xs = [i + offset for i in range(total)]
    reads = stats.get_reads()
    bases = stats.get_bases()
    pr = [_div(float(h[i + offset + 33]) * 100.0, float(reads))
          for i in range(total)]
    pb = [_div(float(hb[i + offset + 33]) * 100.0, float(bases))
          for i in range(total)]
    w("<div id='mean_qual_length_histogram_figure'>\n")
    w("<div class='figure' id='plot_median_qual_hist_" + div
      + "' style='height:400px;'></div>\n")
    w("</div>\n")
    w('\n<script type="text/javascript">\n')
    parts = ["var readNum="]
    parts.append("{")
    parts.append("x:[" + ",".join(str(x) for x in xs) + "],")
    parts.append("y:[" + ",".join(fmt_double(v) for v in pr) + "],")
    parts.append("name: '% reads',")
    parts.append("type:'bar',")
    parts.append("line:{color:'rgba(128,0,128,1.0)', width:1}\n")
    parts.append("}")
    parts.append(";\n")
    parts.append("var baseNum=")
    parts.append("{")
    parts.append("x:[" + ",".join(str(x) for x in xs) + "],")
    parts.append("y:[" + ",".join(fmt_double(v) for v in pb) + "],")
    parts.append("name: '% accumulated bases',")
    parts.append("type:'bar',")
    parts.append("line:{color:'rgba(128,128,0,1.0)', width:1}\n")
    parts.append("}")
    parts.append(";\n")
    parts.append("var data = [readNum, baseNum];;\n")
    parts.append("var layout={legend: {x: 0, y: 1.0},title:'Read median "
                 "quality distribution', xaxis:{title:'read median quality "
                 "score'}, yaxis:{title:'Percent (%)'}};\n")
    parts.append("Plotly.newPlot('plot_median_qual_hist_" + div
                 + "', data, layout);\n")
    w("".join(parts))
    w("</script>\n")


def _median_qual_length_density(w, stats, filtering_type):
    """Stats::reporHtmlMedianQualLengthDensity (stats.cpp:671-717)."""
    sub = filtering_type + ": Density plot of read median quality and read length"
    div = sub.replace(" ", "_")
    w("<div class='subsection_title'>" + sub + "</div>\n")
    meds, lens = stats.qual_length_pairs()
    xs = (meds.astype(np.int32) - 33)
    w("<div id='mean_qual_length_density_figure'>\n")
    w("<div class='figure' id='plot_median_qual_length_density_" + div
      + "' style='height:400px;'></div>\n")
    w("</div>\n")
    w('\n<script type="text/javascript">\n')
    parts = ["var density="]
    parts.append("{")
    parts.append("x:[" + ",".join(str(int(x)) for x in xs) + "],")
    parts.append("y:[" + ",".join(str(int(y)) for y in lens) + "],")
    parts.append("name: '% reads',")
    parts.append("type:'histogram2dcontour',")
    parts.append("line:{color:'rgba(128,0,128,1.0)', width:1}\n")
    parts.append("}")
    parts.append(";\n")
    parts.append("var data = [density];\n")
    parts.append("var layout={legend: {x: 0, y: 1.0},title:' Density plot of"
                 " read median quality and read length', xaxis:{title:'read "
                 "median quality score'}, yaxis:{title:'Read length', "
                 "type:'log'}};\n")
    parts.append("Plotly.newPlot('plot_median_qual_length_density_" + div
                 + "', data, layout);\n")
    w("".join(parts))
    w("</script>\n")


def _sample_positions(stats):
    """Position down-sampling for long reads (stats.cpp:868-897)."""
    cycles = stats.get_cycles()
    xs = []
    if not stats.is_long_read():
        xs = list(range(1, cycles + 1))
    else:
        full = 40
        for i in range(min(full, cycles)):
            xs.append(i + 1)
        if cycles > full:
            pos = float(full)
            while True:
                pos *= 1.05
                if pos >= cycles:
                    break
                xs.append(int(pos))
            if xs[-1] != cycles:
                xs.append(cycles)
    return xs


def _curve_means(curve, xs):
    """Stats::list2string(list, size, coords) (stats.cpp:550-573)."""
    out = []
    for i in range(len(xs)):
        start = 0 if i == 0 else xs[i - 1]
        end = xs[i]
        if end == start:
            out.append("0.0")
        else:
            seg = curve[start:end]
            out.append(fmt_double(float(seg.sum()) / (end - start)))
    return out


def _quality_section(w, stats, filtering_type):
    """Stats::reportHtmlQuality (stats.cpp:847-922)."""
    sub = filtering_type + ": quality"
    div = sub.replace(" ", "_").replace(":", "_")
    w("<div class='subsection_title'>" + sub + "</div>\n")
    w("<div id='" + div + "'>\n")
    w("<div class='sub_section_tips'>Value of each position will be shown on"
      " mouse over.</div>\n")
    w("<div class='figure' id='plot_" + div + "'></div>\n")
    w("</div>\n")
    alphabets = ["A", "U" if stats.is_rna else "T", "C", "G", "mean"]
    colors = ["rgba(128,128,0,1.0)", "rgba(128,0,128,1.0)",
              "rgba(0,255,0,1.0)", "rgba(0,0,255,1.0)", "rgba(20,20,20,1.0)"]
    xs = _sample_positions(stats)
    w('\n<script type="text/javascript">\n')
    parts = ["var data=["]
    for b, base in enumerate(alphabets):
        parts.append("{")
        parts.append("x:[" + ",".join(str(x) for x in xs) + "],")
        parts.append("y:[" + ",".join(
            _curve_means(stats.quality_curves[base], xs)) + "],")
        parts.append("name: '" + base + "',")
        parts.append("mode:'lines',")
        parts.append("line:{color:'" + colors[b] + "', width:1}\n")
        parts.append("},")
    parts.append("];\n")
    parts.append("var layout={title:'', xaxis:{title:'position'")
    if stats.is_long_read():
        parts.append(",type:'log'")
    parts.append("}, yaxis:{title:'quality'}};\n")
    parts.append("Plotly.newPlot('plot_" + div + "', data, layout);\n")
    w("".join(parts))
    w("</script>\n")


def _content_section(w, stats, filtering_type):
    """Stats::reportHtmlContents (stats.cpp:924-1011)."""
    sub = filtering_type + ": base contents"
    div = sub.replace(" ", "_").replace(":", "_")
    w("<div class='subsection_title'>" + sub + "</div>\n")
    w("<div id='" + div + "'>\n")
    w("<div class='sub_section_tips'>Value of each position will be shown on"
      " mouse over.</div>\n")
    w("<div class='figure' id='plot_" + div + "'></div>\n")
    w("</div>\n")
    alphabets = ["A", "U" if stats.is_rna else "T", "C", "G", "N", "GC"]
    colors = ["rgba(128,128,0,1.0)", "rgba(128,0,128,1.0)",
              "rgba(0,255,0,1.0)", "rgba(0,0,255,1.0)",
              "rgba(255, 0, 0, 1.0)", "rgba(20,20,20,1.0)"]
    xs = _sample_positions(stats)
    bases_total = stats.get_bases()
    w('\n<script type="text/javascript">\n')
    parts = ["var data=["]
    for b, base in enumerate(alphabets):
        if len(base) == 1:
            count = int(stats.base_contents[ord(base) & 0x07])
        else:
            count = int(stats.base_contents[ord("G") & 7]
                        + stats.base_contents[ord("C") & 7])
        percentage = _to_string_f(_div(count * 100.0, float(bases_total)))
        if len(percentage) > 5:
            percentage = percentage[:5]
        name = base + "(" + percentage + "%)"
        parts.append("{")
        parts.append("x:[" + ",".join(str(x) for x in xs) + "],")
        parts.append("y:[" + ",".join(
            _curve_means(stats.content_curves[base], xs)) + "],")
        parts.append("name: '" + name + "',")
        parts.append("mode:'lines',")
        parts.append("line:{color:'" + colors[b] + "', width:1}\n")
        parts.append("},")
    parts.append("];\n")
    parts.append("var layout={title:'', xaxis:{title:'position'")
    if stats.is_long_read():
        parts.append(",type:'log'")
    parts.append("}, yaxis:{title:'base content ratios'}};\n")
    parts.append("Plotly.newPlot('plot_" + div + "', data, layout);\n")
    w("".join(parts))
    w("</script>\n")


def _kmer_td(stats, i, j):
    """Stats::makeKmerTD (stats.cpp:778-824)."""
    target = (i << 4) + j
    val = int(stats.kmer[target])
    kmer = _kmer3(i, stats.is_rna) + _kmer2(j, stats.is_rna)
    mean_bases = float(stats.get_bases() + 1) / 2048  # mKmerBufLen quirk
    prop = val / mean_bases
    if prop <= 0.3:
        frac = prop * 2.0
        b = int(255 - 256 * frac)
        g = int(255 * frac)
        r = int(b * frac)
    elif prop > 3.0:
        frac = 2.0 / prop
        r = int(255 - 128 * frac)
        g = int(128 * frac)
        b = int(r * frac)
    else:
        r = g = b = 196
    def hx(v):
        s = "%x" % (v & 0xFFFFFFFF)  # C++ prints int as unsigned hex
        return ("0" + s) if v < 16 else s
    return ("<td style='background:#" + hx(r) + hx(g) + hx(b) + "' title='"
            + kmer + ": " + str(val) + "\n" + fmt_double(prop)
            + " times as mean value'>" + kmer + "</td>")


def _kmer_section(w, stats, filtering_type):
    """Stats::reportHtmlKMER (stats.cpp:746-776)."""
    sub = filtering_type + ": KMER counting"
    div = sub.replace(" ", "_").replace(":", "_")
    w("<div class='subsection_title'>" + sub + "</div>\n")
    w("<div  id='" + div + "'>\n")
    w("<div class='sub_section_tips'>Darker background means larger counts."
      " The count will be shown on mouse over.</div>\n")
    w("<table class='kmer_table' style='width:680px;'>\n")
    w("<tr>")
    w("<td></td>")
    for h in range(16):
        w("<td style='color:#333333'>" + _kmer2(h, stats.is_rna) + "</td>")
    w("</tr>\n")
    for i in range(64):
        w("<tr>")
        w("<td style='color:#333333'>" + _kmer3(i, stats.is_rna) + "</td>")
        for j in range(16):
            w(_kmer_td(stats, i, j))
        w("</tr>\n")
    w("</table>\n")
    w("</div>\n")


def _section(w, title, table_id, render_pre, render_post):
    w("<div class='section_div'>\n")
    w("<div class='section_title' onclick=showOrHide('" + table_id
      + "')><a name='summary'>" + title + "</a></div>\n")
    w("<table id='" + table_id + "' class='section_table'>\n")
    w("<tr><td>\n")
    render_pre()
    w("</td><td>\n")
    render_post()
    w("</td></tr>\n")
    w("</table>\n")
    w("</div>\n")


def report_html(opt, fr, pre_stats, post_stats, path=None):
    parts = []
    w = parts.append

    _header(w)
    _summary(w, opt, fr, pre_stats)

    _section(w, "Basic statistics", "basic_stat",
             lambda: _basic_info(w, pre_stats, "Before filtering"),
             lambda: _basic_info(w, post_stats, "After filtering"))
    _section(w, "Median qual histogram", "median_qual_stat",
             lambda: _median_qual_hist(w, pre_stats, "Before filtering"),
             lambda: _median_qual_hist(w, post_stats, "After filtering"))
    _section(w, "Median qual length density", "median_qual_length_density",
             lambda: _median_qual_length_density(w, pre_stats, "Before filtering"),
             lambda: _median_qual_length_density(w, post_stats, "After filtering"))
    _section(w, "Quality statistics", "quality_stat",
             lambda: _quality_section(w, pre_stats, "Before filtering"),
             lambda: _quality_section(w, post_stats, "After filtering"))
    _section(w, "Base contents statistics", "contents_stat",
             lambda: _content_section(w, pre_stats, "Before filtering"),
             lambda: _content_section(w, post_stats, "After filtering"))
    _section(w, "k-mer statistics", "kmer_stat",
             lambda: _kmer_section(w, pre_stats, "Before filtering"),
             lambda: _kmer_section(w, post_stats, "After filtering"))

    # footer (htmlreporter.cpp:247-253)
    w("\n</div>\n")
    w("<div id='footer'> ")
    w("<p>" + opt.command + "</p>")
    w("fastplong " + VERSION + ", at " + _current_time() + " </div>")
    w("</body></html>")

    text = "".join(parts)
    if path is None:
        path = opt.html_file
    with open(path, "w") as f:
        f.write(text)
    return text
