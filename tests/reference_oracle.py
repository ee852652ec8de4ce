"""Literal Python transcriptions of the reference algorithms, for testing.

Each function mirrors the corresponding C++ in /root/reference/src (cited
per function) as directly as possible, including quirks.  The production
kernels in fastplong_tpu.ops are tested against these on random inputs.
"""


# ---------------------------------------------------------------- editdistance


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (reference src/editdistance.cpp:100-126 computes
    this exactly via Myers bit-parallel; plain DP here)."""
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (0 if a[i - 1] == b[j - 1] else 1))
        prev = cur
    return prev[len(b)]


# ---------------------------------------------------------------- trimAndCut


def trim_and_cut(seq, qual, front, tail, opt):
    """Reference Filter::trimAndCut (src/filter.cpp:130-232).

    opt: dict with enabled_front, enabled_tail, window_front, quality_front,
    window_tail, quality_tail.
    Returns (new_seq, new_qual, front_trimmed) or None.
    """
    ef, et = opt["enabled_front"], opt["enabled_tail"]
    if front == 0 and tail == 0 and not ef and not et:
        return seq, qual, 0
    rlen = len(seq) - front - tail
    if rlen < 0:
        return None
    if front == 0 and not ef and not et:
        return seq[:rlen], qual[:rlen], 0
    elif not ef and not et:
        return seq[front:front + rlen], qual[front:front + rlen], front

    l = len(seq)
    if ef:
        w = opt["window_front"]
        s = front
        if l - front - tail - w <= 0:
            return None
        total = 0
        for i in range(w - 1):
            total += ord(qual[s + i])
        s = front
        broke = False
        while s + w < l - tail:
            total += ord(qual[s + w - 1])
            if s > front:
                total -= ord(qual[s - 1])
            if total / w >= 33 + opt["quality_front"]:
                broke = True
                break
            s += 1
        if s > 0:
            s = s + w - 1
        while s < l and seq[s] == "N":
            s += 1
        front = s
        rlen = l - front - tail
    if et:
        w = opt["window_tail"]
        if l - front - tail - w <= 0:
            return None
        total = 0
        t = l - tail - 1
        for i in range(w - 1):
            total += ord(qual[t - i])
        t = l - tail - 1
        while t - w >= front:
            total += ord(qual[t - w + 1])
            if t < l - tail - 1:
                total -= ord(qual[t + 1])
            if total / w >= 33 + opt["quality_tail"]:
                break
            t -= 1
        if t < l - 1:
            t = t - w + 1
        while t >= 0 and seq[t] == "N":
            t -= 1
        rlen = t - front + 1
    if rlen <= 0 or front >= l - 1:
        return None
    return seq[front:front + rlen], qual[front:front + rlen], front


# ---------------------------------------------------------------- passFilter


PASS_FILTER = 0
FAIL_POLY_X = 4
FAIL_N_BASE = 12
FAIL_LENGTH = 16
FAIL_TOO_LONG = 17
FAIL_QUALITY = 20
FAIL_COMPLEXITY = 24


def pass_filter(seq, qual, opt):
    """Reference Filter::passFilter (src/filter.cpp:12-65)."""
    if seq is None or len(seq) == 0:
        return FAIL_LENGTH
    rlen = len(seq)
    low_qual = 0
    n_base = 0
    total_qual = 0
    if opt["qual_enabled"] or opt["length_enabled"]:
        for i in range(rlen):
            total_qual += ord(qual[i]) - 33
            if ord(qual[i]) < opt["qualified_qual"]:
                low_qual += 1
            if seq[i] == "N":
                n_base += 1
    if opt["qual_enabled"]:
        if low_qual > opt["unqualified_percent_limit"] * rlen / 100.0:
            return FAIL_QUALITY
        elif opt["avg_qual_req"] > 0 and total_qual // rlen < opt["avg_qual_req"]:
            return FAIL_QUALITY
        elif n_base * 100 > rlen * opt["n_base_percent_limit"]:
            return FAIL_N_BASE
        elif opt["n_base_limit"] != 1000000 and n_base > opt["n_base_limit"]:
            return FAIL_N_BASE
    if opt["length_enabled"]:
        if rlen < opt["required_length"]:
            return FAIL_LENGTH
        if opt["max_length"] > 0 and rlen > opt["max_length"]:
            return FAIL_TOO_LONG
    if opt.get("complexity_enabled"):
        diff = sum(1 for i in range(rlen - 1) if seq[i] != seq[i + 1])
        if rlen <= 1 or not (diff / (rlen - 1) >= opt["complexity_threshold_pct"] / 100.0):
            return FAIL_COMPLEXITY
    return PASS_FILTER


# ---------------------------------------------------------------- polyX


def trim_polyx(seq, compare_req):
    """Reference PolyX::trimPolyX (src/polyx.cpp:11-78).

    Returns (new_len, poly_base_index_or_None, trimmed_len).
    """
    ATCG = "ATCG"
    rlen = len(seq)
    counts = [0, 0, 0, 0]
    pos = 0
    while pos < rlen:
        c = seq[rlen - pos - 1]
        if c == "A":
            counts[0] += 1
        elif c == "T":
            counts[1] += 1
        elif c == "C":
            counts[2] += 1
        elif c == "G":
            counts[3] += 1
        elif c == "N":
            for b in range(4):
                counts[b] += 1
        cmp = pos + 1
        allowed = min(5, cmp // 8)
        need_break = all(cmp - counts[b] > allowed for b in range(4))
        if need_break and (pos >= 8 or pos + 1 >= compare_req - 1):
            break
        pos += 1
    if pos + 1 >= compare_req:
        max_count = -1
        poly = 0
        for b in range(4):
            if counts[b] > max_count:
                max_count = counts[b]
                poly = b
        poly_base = ATCG[poly]
        # NOTE: when pos == rlen the C++ reads data[-1] (out of bounds); we
        # treat that byte as a non-match, like the production kernel.
        while pos >= 0 and (pos >= rlen or seq[rlen - pos - 1] != poly_base):
            pos -= 1
        return rlen - pos - 1, poly, pos + 1
    return rlen, None, 0


# ------------------------------------------------- detectLowQualityRegions


def detect_low_quality_regions(qual, window_size, quality):
    """Reference Filter::detectLowQualityRegions (src/filter.cpp:83-128),
    including its quasi-rolling totalQual quirks."""
    results = []
    l = len(qual)
    if l == 0 or window_size <= 0:
        return results
    w = window_size
    start = 0
    while start + w <= l:
        total = 0
        i = start
        while i < w - 1 and i < l:
            total += ord(qual[i])
            i += 1
        window_start = -1
        s = start
        while s + w < l:
            if total < (33 + quality) * w:
                window_start = s
                break
            total += ord(qual[s + w])
            total -= ord(qual[s])
            s += 1
        if window_start == -1:
            break
        e = window_start
        while e + w < l:
            total += ord(qual[e + w])
            total -= ord(qual[e])
            if total >= (33 + quality) * w:
                break
            e += 1
        results.append((window_start, e + w - 1))
        start = e + w
    return results


# ---------------------------------------------------------------- adapters


def search_adapter(read, adapter, ed_max, search_start=0, search_len=-1,
                   as_left=False, as_right=False):
    """Reference AdapterTrimmer::searchAdapter (src/adaptertrimmer.cpp:59-166)."""
    min_mismatch = 99999
    pos = -1
    rlen = len(read)
    alen = len(adapter)
    threshold = round(ed_max * alen)  # C++ round(): half away from zero
    import math
    threshold = math.floor(ed_max * alen + 0.5)
    search_end = rlen
    if search_len > 0:
        search_end = min(rlen, search_len + search_start)
    if search_start + alen > rlen:
        return -1

    def mm(p):
        return sum(1 for i in range(alen) if read[p + i] != adapter[i])

    if as_left:
        for p in range(search_start, search_end - alen):
            m = mm(p)
            if m <= threshold:
                return p
            if m <= min_mismatch:
                min_mismatch = m
                pos = p
    elif as_right and search_end > alen:
        for p in range(search_end - alen, search_start - 1, -1):
            m = mm(p)
            if m <= threshold:
                return p
            if m <= min_mismatch:
                min_mismatch = m
                pos = p
    else:
        for p in range(search_start, search_end - alen):
            m = mm(p)
            if m < min_mismatch:
                min_mismatch = m
                pos = p
    if pos >= 0:
        if edit_distance(read[pos:pos + alen], adapter) <= threshold:
            return pos
        return -1
    return -1


def _round(x):
    import math
    return math.floor(x + 0.5)


def trim_by_sequence_start(seq, adapter, ed_max, ext):
    """Reference AdapterTrimmer::trimBySequenceStart
    (src/adaptertrimmer.cpp:168-236).
    Returns (trimmed_count, new_start_offset, recorded_adapter_or_None)."""
    WINDOW, PATTERN_LEN = 200, 16
    rlen, alen = len(seq), len(adapter)
    if rlen < PATTERN_LEN:
        return 0, 0, None
    plen = min(PATTERN_LEN, alen)
    mpos = search_adapter(seq, adapter, ed_max, 0, WINDOW, False, True)
    if mpos >= 0:
        mpos = min(mpos + ext, rlen - alen)
        trim = min(rlen - 1, mpos + alen)  # trimFront clamp (read.cpp:69-73)
        return mpos + alen, trim, adapter
    mined = -1
    pos = -1
    p = 0
    while p < rlen - plen and p < WINDOW - plen:
        ed = edit_distance(seq[p:p + plen], adapter[alen - plen:])
        if ed <= _round(ed_max * plen):
            if pos < 0:
                pos = p
                mined = ed
            elif ed >= mined:
                pass
            else:
                pos = p
                mined = ed
        p += 1
    if pos >= 0:
        cmplen = min(pos + plen, alen)
        ed = edit_distance(seq[pos + plen - cmplen:pos + plen],
                           adapter[alen - cmplen:])
        if ed <= _round(ed_max * cmplen):
            pos = min(pos + ext, rlen - alen)
            trim = min(rlen - 1, pos + plen)
            return pos + plen, trim, adapter[alen - cmplen:]
    return 0, 0, None


def trim_by_sequence_end(seq, adapter, ed_max, ext):
    """Reference AdapterTrimmer::trimBySequenceEnd
    (src/adaptertrimmer.cpp:238-302).
    Returns (trimmed_count, new_len, recorded_adapter_or_None)."""
    WINDOW, PATTERN_LEN = 200, 16
    rlen, alen = len(seq), len(adapter)
    if rlen < PATTERN_LEN:
        return 0, rlen, None
    plen = min(PATTERN_LEN, alen)
    search_start = max(0, rlen - WINDOW)
    mpos = search_adapter(seq, adapter, ed_max, search_start, WINDOW, True, False)
    if mpos >= 0:
        mpos = max(0, mpos - ext)
        new_len = mpos if 0 <= mpos <= rlen else rlen  # resize clamp
        return rlen - mpos, new_len, adapter
    mined = -1
    pos = -1
    p = 0
    while p < rlen - plen and p < WINDOW - plen:
        ed = edit_distance(seq[rlen - plen - p:rlen - p], adapter[:plen])
        if ed <= _round(ed_max * plen):
            if pos < 0:
                pos = p
                mined = ed
            elif ed > mined:
                break
            else:
                pos = p
                mined = ed
        p += 1
    if pos > 0:
        cmplen = min(pos + plen, alen)
        if edit_distance(seq[rlen - plen - pos:rlen - plen - pos + cmplen],
                         adapter[:cmplen]) <= _round(ed_max * cmplen):
            pos = min(pos + ext, rlen - plen)
            new_len = rlen - plen - pos
            return pos + plen, new_len, adapter[:cmplen]
    return 0, rlen, None


def find_middle_adapters(seq, start_adapter, end_adapter, ed_max, ext):
    """Reference AdapterTrimmer::findMiddleAdapters
    (src/adaptertrimmer.cpp:13-40). Returns (start, length) or None."""
    sp = search_adapter(seq, start_adapter, ed_max) if start_adapter else -1
    ep = search_adapter(seq, end_adapter, ed_max) if end_adapter else -1
    rlen = len(seq)
    if sp >= 0 and ep >= 0:
        start = min(sp, ep)
        end = max(sp + len(start_adapter), ep + len(end_adapter))
        start = max(0, start - ext)
        end = min(rlen, end + ext)
        return start, end - start
    if sp >= 0:
        end = min(rlen, sp + len(start_adapter) + ext)
        start = max(0, sp - ext)
        return start, end - start
    if ep >= 0:
        end = min(rlen, ep + len(end_adapter) + ext)
        start = max(0, ep - ext)
        return start, end - start
    return None
