"""HTML report writer.

Produces the reference HtmlReporter's report structure
(src/htmlreporter.cpp:75-181): summary, filtering result, adapter tables,
and before/after sections with basic stats, median-quality histogram,
quality/content curves (Plotly), and the 5-mer table.
"""

import time

from ..common import VERSION, PASS_FILTER, FAIL_N_BASE, FAIL_LENGTH, \
    FAIL_TOO_LONG, FAIL_QUALITY, FAIL_COMPLEXITY
from .cppfmt import fmt_double
from .json_report import _kmer3, _kmer2


def format_number(n):
    """Thousands separators like reference HtmlReporter::formatNumber."""
    return "{:,}".format(int(n))


def get_percents(numerator, denominator):
    if denominator == 0:
        return fmt_double(0.0)
    return fmt_double(numerator * 100.0 / denominator)


def _row(w, key, val):
    w("<tr><td class='col1'>%s</td><td class='col2'>%s</td></tr>\n"
      % (key, val))


def _basic_info(w, stats, filtering_type):
    sub = filtering_type + ": Basic statistics"
    w("<div class='subsection_title'>%s</div>\n" % sub)
    w("<table>\n")
    _row(w, "total reads:", format_number(stats.get_reads()))
    _row(w, "total bases:", format_number(stats.get_bases()))
    _row(w, "minimum length:", format_number(stats.min_len))
    _row(w, "maximum length:", format_number(stats.max_len))
    _row(w, "median length:", format_number(stats.median_len))
    _row(w, "mean length:", format_number(stats.get_mean_length()))
    _row(w, "N50 length:", format_number(stats.n50_len))
    _row(w, "GC content:",
         get_percents(stats.get_gc_number(), stats.get_bases()) + "%")
    for name, total in (("Q5", stats.q5_total), ("Q7", stats.q7_total),
                        ("Q10", stats.q10_total), ("Q15", stats.q15_total),
                        ("Q20", stats.q20_total), ("Q30", stats.q30_total),
                        ("Q40", stats.q40_total)):
        _row(w, "%s bases:" % name,
             "%s (%s%%)" % (format_number(total),
                            get_percents(total, stats.get_bases())))
    w("</table>\n")


def _median_qual_hist(w, stats, filtering_type):
    sub = filtering_type + ": Read median quality statistics"
    div = sub.replace(" ", "_")
    w("<div class='subsection_title'>%s</div>\n" % sub)
    h = stats.median_qual_hist
    hb = stats.median_qual_bases
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
    total = max(0, min(127 - 33, max_val - min_val + 2))
    xs = [i + offset for i in range(total)]
    reads = max(stats.get_reads(), 1)
    bases = max(stats.get_bases(), 1)
    pr = [float(h[i + offset + 33]) * 100.0 / reads for i in range(total)]
    pb = [float(hb[i + offset + 33]) * 100.0 / bases for i in range(total)]
    w("<div id='mean_qual_length_histogram_figure'>\n")
    w("<div class='figure' id='plot_median_qual_hist_%s' style='height:400px;'></div>\n" % div)
    w("</div>\n")
    w("\n<script type=\"text/javascript\">\n")
    w("var readNum={x:[%s],y:[%s],name: '%% reads',type:'bar',"
      "line:{color:'rgba(128,0,128,1.0)', width:1}\n};\n"
      % (",".join(str(x) for x in xs), ",".join(fmt_double(v) for v in pr)))
    w("var baseNum={x:[%s],y:[%s],name: '%% accumulated bases',type:'bar',"
      "line:{color:'rgba(128,128,0,1.0)', width:1}\n};\n"
      % (",".join(str(x) for x in xs), ",".join(fmt_double(v) for v in pb)))
    w("var data = [readNum, baseNum];;\n")
    w("var layout={legend: {x: 0, y: 1.0},title:'Read median quality "
      "distribution', xaxis:{title:'read median quality score'}, "
      "yaxis:{title:'Percent (%)'}};\n")
    w("Plotly.newPlot('plot_median_qual_hist_%s', data, layout);\n" % div)
    w("</script>\n")


def _qual_length_density(w, stats, filtering_type):
    sub = filtering_type + ": Density plot of read median quality and read length"
    div = sub.replace(" ", "_")
    w("<div class='subsection_title'>%s</div>\n" % sub)
    meds, lens = stats.qual_length_pairs()
    # reference iterates the map ordered by median quality
    import numpy as np
    order = np.argsort(meds, kind="stable")
    xs = (meds[order].astype(np.int32) - 33)
    ys = lens[order]
    w("<div id='mean_qual_length_density_figure'>\n")
    w("<div class='figure' id='plot_median_qual_length_density_%s' style='height:400px;'></div>\n" % div)
    w("</div>\n")
    w("\n<script type=\"text/javascript\">\n")
    w("var density={x:[%s],y:[%s],name: '%% reads',type:'histogram2dcontour',"
      "line:{color:'rgba(128,0,128,1.0)', width:1}\n};\n"
      % (",".join(str(int(x)) for x in xs),
         ",".join(str(int(y)) for y in ys)))
    w("var data = [density];\n")
    w("var layout={legend: {x: 0, y: 1.0},title:' Density plot of read median"
      " quality and read length', xaxis:{title:'read median quality score'},"
      " yaxis:{title:'Read length', type:'log'}};\n")
    w("Plotly.newPlot('plot_median_qual_length_density_%s', data, layout);\n" % div)
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
    """Averaged curve segments between sampled coords (stats.cpp:550-573)."""
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
    sub = filtering_type + ": quality"
    div = sub.replace(" ", "_").replace(":", "_")
    w("<div class='subsection_title'>%s</div>\n" % sub)
    w("<div id='%s'>\n" % div)
    w("<div class='sub_section_tips'>Value of each position will be shown on"
      " mouse over.</div>\n")
    w("<div class='figure' id='plot_%s'></div>\n" % div)
    w("</div>\n")
    alphabets = ["A", "U" if stats.is_rna else "T", "C", "G", "mean"]
    colors = ["rgba(128,128,0,1.0)", "rgba(128,0,128,1.0)",
              "rgba(0,255,0,1.0)", "rgba(0,0,255,1.0)", "rgba(20,20,20,1.0)"]
    xs = _sample_positions(stats)
    w("\n<script type=\"text/javascript\">\n")
    parts = ["var data=["]
    for b, base in enumerate(alphabets):
        parts.append("{")
        parts.append("x:[" + ",".join(str(x) for x in xs) + "],")
        parts.append("y:[" + ",".join(_curve_means(stats.quality_curves[base], xs)) + "],")
        parts.append("name: '%s'," % base)
        parts.append("mode:'lines',")
        parts.append("line:{color:'%s', width:1}\n" % colors[b])
        parts.append("},")
    parts.append("];\n")
    parts.append("var layout={title:'', xaxis:{title:'position'")
    if stats.is_long_read():
        parts.append(",type:'log'")
    parts.append("}, yaxis:{title:'quality'}};\n")
    parts.append("Plotly.newPlot('plot_%s', data, layout);\n" % div)
    w("".join(parts))
    w("</script>\n")


def _content_section(w, stats, filtering_type):
    sub = filtering_type + ": base contents"
    div = sub.replace(" ", "_").replace(":", "_")
    w("<div class='subsection_title'>%s</div>\n" % sub)
    w("<div id='%s'>\n" % div)
    w("<div class='sub_section_tips'>Value of each position will be shown on"
      " mouse over.</div>\n")
    w("<div class='figure' id='plot_%s'></div>\n" % div)
    w("</div>\n")
    alphabets = ["A", "U" if stats.is_rna else "T", "C", "G", "N", "GC"]
    colors = ["rgba(128,128,0,1.0)", "rgba(128,0,128,1.0)",
              "rgba(0,255,0,1.0)", "rgba(0,0,255,1.0)",
              "rgba(255, 0, 0, 1.0)", "rgba(20,20,20,1.0)"]
    xs = _sample_positions(stats)
    bases_total = max(stats.get_bases(), 1)
    w("\n<script type=\"text/javascript\">\n")
    parts = ["var data=["]
    for b, base in enumerate(alphabets):
        if len(base) == 1:
            count = int(stats.base_contents[ord(base) & 0x07])
        else:
            count = int(stats.base_contents[ord("G") & 7]
                        + stats.base_contents[ord("C") & 7])
        percentage = "%f" % (count * 100.0 / bases_total)
        if len(percentage) > 5:
            percentage = percentage[:5]
        name = "%s(%s%%)" % (base, percentage)
        parts.append("{")
        parts.append("x:[" + ",".join(str(x) for x in xs) + "],")
        parts.append("y:[" + ",".join(_curve_means(stats.content_curves[base], xs)) + "],")
        parts.append("name: '%s'," % name)
        parts.append("mode:'lines',")
        parts.append("line:{color:'%s', width:1}\n" % colors[b])
        parts.append("},")
    parts.append("];\n")
    parts.append("var layout={title:'', xaxis:{title:'position'")
    if stats.is_long_read():
        parts.append(",type:'log'")
    parts.append("}, yaxis:{title:'base content ratios'}};\n")
    parts.append("Plotly.newPlot('plot_%s', data, layout);\n" % div)
    w("".join(parts))
    w("</script>\n")


def _kmer_td(stats, i, j):
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
    color = "%02x%02x%02x" % (max(r, 0) & 0xff, max(g, 0) & 0xff, max(b, 0) & 0xff)
    return ("<td style='background:#%s' title='%s: %d\n%s times as mean "
            "value'>%s</td>" % (color, kmer, val, fmt_double(prop), kmer))


def _kmer_section(w, stats, filtering_type):
    sub = filtering_type + ": KMER counting"
    div = sub.replace(" ", "_").replace(":", "_")
    w("<div class='subsection_title'>%s</div>\n" % sub)
    w("<div  id='%s'>\n" % div)
    w("<div class='sub_section_tips'>Darker background means larger counts."
      " The count will be shown on mouse over.</div>\n")
    w("<table class='kmer_table' style='width:680px;'>\n")
    w("<tr>")
    w("<td></td>")
    for h in range(16):
        w("<td style='color:#333333'>%s</td>" % _kmer2(h, stats.is_rna))
    w("</tr>\n")
    for i in range(64):
        w("<tr>")
        w("<td style='color:#333333'>%s</td>" % _kmer3(i, stats.is_rna))
        for j in range(16):
            w(_kmer_td(stats, i, j))
        w("</tr>\n")
    w("</table>\n")
    w("</div>\n")


_CSS = """
td.col1 {font-size:12px;color:#565656;padding-left:10px;text-align:right;}
td.col2 {font-size:12px;color:#563e56;padding-left:10px;text-align:left;}
td.adapter_col {font-size:12px;color:#565656;padding-left:10px;text-align:left;}
table.summary_table {border:1px solid #999999;padding:5px;width:800px;}
div.section_title {color:#ffffff;font-size:20px;padding:5px;text-align:left;background:#556699; margin-top:10px;}
div.subsection_title {font-size:16px;padding:5px;margin-top:10px;text-align:left;color:#604050;}
div.figure {width:800px;}
div.sub_section_tips {color:#999999;font-size:10px;padding-left:5px;padding-bottom:3px;}
table.kmer_table {font-size:8px;}
table.kmer_table td {width:40px;text-align:center;font-size:8px;padding:0px;}
"""


def report_html(opt, fr, pre_stats, post_stats, path=None):
    parts = []
    w = parts.append
    w("<html><head><meta http-equiv=\"content-type\" content=\"text/html;"
      "charset=utf-8\" />\n")
    w("<script src=\"https://cdn.plot.ly/plotly-2.32.0.min.js\"></script>\n")
    w("<title>%s</title>\n" % opt.report_title)
    w("<style type=\"text/css\">%s</style>\n" % _CSS)
    w("</head><body><div id='container'>\n")
    w("<h1 style='text-align:left;'><a href='https://github.com/OpenGene/"
      "fastplong' target='_blank' style='color:#663355;text-decoration:none;'>"
      "%s</a></h1>\n" % opt.report_title)

    # ---- summary
    w("<div class='section_div'>\n")
    w("<div class='section_title' onclick=showOrHide('summary')><a "
      "name='summary'>Summary</a></div>\n")
    w("<div id='summary'>\n")
    w("<div class='subsection_title'>General</div>\n")
    w("<table class='summary_table'>\n")
    _row(w, "fastplong version:", VERSION)
    seq_info = "%s cycles" % pre_stats.get_cycles()
    _row(w, "sequencing:", "single end (%s)" % seq_info)
    _row(w, "mean length before filtering:",
         format_number(pre_stats.get_mean_length()) + "bp")
    _row(w, "mean length after filtering:",
         format_number(post_stats.get_mean_length()) + "bp")
    w("</table>\n")

    w("<div class='subsection_title'>Before filtering</div>\n")
    w("<table class='summary_table'>\n")
    _row(w, "total reads:", format_number(pre_stats.get_reads()))
    _row(w, "total bases:", format_number(pre_stats.get_bases()))
    _row(w, "Q20 bases:", "%s (%s%%)" % (
        format_number(pre_stats.get_q20()),
        get_percents(pre_stats.get_q20(), pre_stats.get_bases())))
    _row(w, "Q30 bases:", "%s (%s%%)" % (
        format_number(pre_stats.get_q30()),
        get_percents(pre_stats.get_q30(), pre_stats.get_bases())))
    _row(w, "GC content:", get_percents(pre_stats.get_gc_number(),
                                        pre_stats.get_bases()) + "%")
    w("</table>\n")

    w("<div class='subsection_title'>After filtering</div>\n")
    w("<table class='summary_table'>\n")
    _row(w, "total reads:", format_number(post_stats.get_reads()))
    _row(w, "total bases:", format_number(post_stats.get_bases()))
    _row(w, "Q20 bases:", "%s (%s%%)" % (
        format_number(post_stats.get_q20()),
        get_percents(post_stats.get_q20(), post_stats.get_bases())))
    _row(w, "Q30 bases:", "%s (%s%%)" % (
        format_number(post_stats.get_q30()),
        get_percents(post_stats.get_q30(), post_stats.get_bases())))
    _row(w, "GC content:", get_percents(post_stats.get_gc_number(),
                                        post_stats.get_bases()) + "%")
    w("</table>\n")

    # ---- filtering result
    w("<div class='subsection_title'>Filtering result</div>\n")
    total_reads = max(pre_stats.get_reads(), 1)
    s = fr.filter_read_stats
    w("<table class='summary_table'>\n")
    _row(w, "reads passed filters:", "%s (%s%%)" % (
        format_number(s[PASS_FILTER]),
        "%f" % (s[PASS_FILTER] * 100.0 / total_reads)))
    _row(w, "reads with low quality:", "%s (%s%%)" % (
        format_number(s[FAIL_QUALITY]),
        "%f" % (s[FAIL_QUALITY] * 100.0 / total_reads)))
    _row(w, "reads with too many N:", "%s (%s%%)" % (
        format_number(s[FAIL_N_BASE]),
        "%f" % (s[FAIL_N_BASE] * 100.0 / total_reads)))
    if opt.length_filter.enabled:
        _row(w, "reads too short:", "%s (%s%%)" % (
            format_number(s[FAIL_LENGTH]),
            "%f" % (s[FAIL_LENGTH] * 100.0 / total_reads)))
        if opt.length_filter.max_length > 0:
            _row(w, "reads too long:", "%s (%s%%)" % (
                format_number(s[FAIL_TOO_LONG]),
                "%f" % (s[FAIL_TOO_LONG] * 100.0 / total_reads)))
    if opt.complexity_filter.enabled:
        _row(w, "reads with low complexity:", "%s (%s%%)" % (
            format_number(s[FAIL_COMPLEXITY]),
            "%f" % (s[FAIL_COMPLEXITY] * 100.0 / total_reads)))
    w("</table>\n")

    # ---- adapters
    if opt.adapter_cutting_enabled():
        w("<div class='subsection_title' onclick=showOrHide('read1_adapters')"
          ">Adapter or bad ligation of read1</div>\n")
        w("<div id='read1_adapters'>\n")
        _adapters_table(w, fr, pre_stats.get_bases())
        w("</div>\n")
    w("</div>\n</div>\n")

    # ---- before / after sections
    for stats, tag in ((pre_stats, "Before filtering"),
                       (post_stats, "After filtering")):
        w("<div class='section_div'>\n")
        w("<div class='section_title' onclick=showOrHide('%s')><a name='%s'>"
          "%s</a></div>\n" % (tag, tag, tag))
        w("<div id='%s'>\n" % tag)
        _basic_info(w, stats, tag)
        _median_qual_hist(w, stats, tag)
        _qual_length_density(w, stats, tag)
        _quality_section(w, stats, tag)
        _content_section(w, stats, tag)
        _kmer_section(w, stats, tag)
        w("</div>\n</div>\n")

    w("\n<script type=\"text/javascript\">\n")
    w("function showOrHide(divname) {\n    div = document.getElementById"
      "(divname);\n    if(div.style.display == 'none')\n        div.style."
      "display = 'block';\n    else\n        div.style.display = 'none';\n}\n")
    w("</script>\n")
    w("<div id='footer'> <p>%s</p>fastplong %s, at %s </div>"
      % (opt.command, VERSION,
         time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())))
    w("</div></body></html>")

    text = "".join(parts)
    if path is None:
        path = opt.html_file
    with open(path, "w") as f:
        f.write(text)
    return text


def _adapters_table(w, fr, total_bases):
    items = fr.sorted_adapters()
    total = sum(v for _, v in items)
    total_adapter_bases = sum(len(k) * v for k, v in items)
    frac = total_adapter_bases / total_bases if total_bases else 0.0
    if frac < 0.01:
        w("<div class='sub_section_tips'>The input has little adapter "
          "percentage (~%s%%), probably it's trimmed before.</div>\n"
          % fmt_double(frac * 100.0))
    if total == 0:
        return
    w("<table class='summary_table'>\n")
    w("<tr><td class='adapter_col' style='font-size:14px;color:#ffffff;"
      "background:#556699'>Sequence</td><td class='col2' style='font-size:"
      "14px;color:#ffffff;background:#556699'>Occurrences</td></tr>\n")
    reported = 0
    for seq, count in items:
        if count / total < 0.01:
            continue
        w("<tr><td class='adapter_col'>%s</td><td class='col2'>%d</td></tr>\n"
          % (seq, count))
        reported += count
    unreported = total - reported
    if unreported > 0:
        tag = "other adapter sequences" if reported else "all adapter sequences"
        w("<tr><td class='adapter_col'>%s</td><td class='col2'>%d</td></tr>\n"
          % (tag, unreported))
    w("</table>\n")
