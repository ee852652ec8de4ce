"""Direct fuzz of every native C entry point (host_io.cpp) against small
Python oracles — no jax anywhere in the test bodies, so the whole file
runs under AddressSanitizer (tools/asan_check.sh), where it is the main
memory-safety workout for the native library.  (Suites that lower jitted
code cannot run under whole-process ASan: jaxlib's MLIR bindings throw
C++ exceptions during lowering, tripping an ASan interceptor CHECK — an
upstream ASan-vs-jaxlib incompatibility.)

Covers the adversarial shapes the pipeline-level tests rarely hit:
malformed / truncated / CRLF records, empty fields, zero- and
negative-length emit pieces, source-boundary pieces, the decompressor's
grow-and-retry path, corrupt gzip bytes, and stat spans that exercise
every clamp in fpl_stat_rows.
"""

import numpy as np
import pytest

from fastplong_tpu import native


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


# ------------------------------------------------------------------ parse

def parse_oracle(buf, max_records):
    """Python mirror of fpl_parse_fastq's documented fast-path scan."""
    recs = []
    pos = 0
    n = len(buf)
    ok = 1
    while len(recs) < max_records:
        if pos >= n:
            break
        nl = buf.find(b"\n", pos)
        if nl < 0:
            break
        if buf[pos:pos + 1] != b"@":
            ok = 0
            break
        nlen = nl - pos
        if nlen > 0 and buf[nl - 1:nl] == b"\r":
            nlen -= 1
        s_off = nl + 1
        nl2 = buf.find(b"\n", s_off)
        if nl2 < 0:
            break
        slen = nl2 - s_off
        if slen > 0 and buf[nl2 - 1:nl2] == b"\r":
            slen -= 1
        t_off = nl2 + 1
        if t_off >= n:
            break
        nl3 = buf.find(b"\n", t_off)
        if nl3 < 0:
            break
        if buf[t_off:t_off + 1] != b"+":
            ok = 0
            break
        tlen = nl3 - t_off
        if tlen > 0 and buf[nl3 - 1:nl3] == b"\r":
            tlen -= 1
        q_off = nl3 + 1
        if q_off >= n:
            break
        nl4 = buf.find(b"\n", q_off)
        if nl4 < 0:
            break
        qlen = nl4 - q_off
        if qlen > 0 and buf[nl4 - 1:nl4] == b"\r":
            qlen -= 1
        if qlen != slen:
            ok = 0
            break
        recs.append((pos, nlen, s_off, slen, t_off, tlen, q_off))
        pos = nl4 + 1
    return recs, pos, ok


def random_fastqish(rng, n_records, mutate):
    chunks = []
    for i in range(n_records):
        slen = int(rng.integers(0, 60))
        seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=slen))
        qual = bytes(rng.integers(33, 90, size=slen).astype(np.uint8))
        name = b"@r%d desc" % i
        plus = b"+" + (b"r%d" % i if rng.random() < 0.3 else b"")
        eol = b"\r\n" if rng.random() < 0.25 else b"\n"
        rec = name + eol + seq + eol + plus + eol + qual + eol
        if mutate and rng.random() < 0.25:
            choice = rng.integers(0, 4)
            if choice == 0:       # bad name start
                rec = b"!" + rec[1:]
            elif choice == 1:     # bad strand start
                rec = rec.replace(b"+", b"*", 1)
            elif choice == 2:     # qual/seq length mismatch
                rec = name + eol + seq + b"A" + eol + plus + eol + qual + eol
            else:                 # truncate mid-record
                rec = rec[:max(1, int(rng.integers(1, len(rec))))]
        chunks.append(rec)
    return b"".join(chunks)


@pytest.mark.parametrize("mutate", [False, True])
def test_parse_fuzz_matches_oracle(mutate):
    rng = np.random.default_rng(123 if mutate else 321)
    for trial in range(200):
        buf = random_fastqish(rng, int(rng.integers(0, 12)), mutate)
        if rng.random() < 0.1:  # pure garbage
            buf = bytes(rng.integers(0, 256, size=int(rng.integers(0, 200)))
                        .astype(np.uint8))
        max_records = int(rng.integers(1, 16))
        got = native.parse_fastq(buf, max_records)
        assert got is not None
        arrs, consumed, ok, n = got
        recs, c_oracle, ok_oracle = parse_oracle(buf, max_records)
        assert n == len(recs), buf
        assert consumed == c_oracle
        assert ok == bool(ok_oracle)
        for k, (noff, nlen, soff, slen, toff, tlen, qoff) in enumerate(recs):
            assert (arrs[0][k], arrs[1][k]) == (noff, nlen)
            assert (arrs[2][k], arrs[3][k]) == (soff, slen)
            assert (arrs[4][k], arrs[5][k]) == (toff, tlen)
            assert arrs[6][k] == qoff


def test_parse_empty_and_tiny():
    for buf in (b"", b"@", b"@\n", b"@\nA\n+\n", b"\n\n\n\n", b"@a\nA\n+\nB\n"):
        got = native.parse_fastq(buf, 8)
        assert got is not None
        arrs, consumed, ok, n = got
        recs, c_oracle, ok_oracle = parse_oracle(buf, 8)
        assert (n, consumed, ok) == (len(recs), c_oracle, bool(ok_oracle))


# ------------------------------------------------------------------- pack

def test_pack_batch_fuzz():
    rng = np.random.default_rng(7)
    for trial in range(100):
        # a buffer of concatenated seq/qual fields at known offsets
        n_rec = int(rng.integers(1, 10))
        blobs, seq_off, seq_len, qual_off = [], [], [], []
        pos = 0
        for _ in range(n_rec):
            sl = int(rng.integers(0, 40))
            seq = rng.integers(65, 91, size=sl).astype(np.uint8)
            qual = rng.integers(33, 90, size=sl).astype(np.uint8)
            seq_off.append(pos)
            seq_len.append(sl)
            blobs.append(seq)
            pos += sl
            qual_off.append(pos)
            blobs.append(qual)
            pos += sl
        buf = np.concatenate(blobs).tobytes() if blobs else b""
        L = int(rng.integers(1, 48))
        take = rng.integers(0, n_rec, size=int(rng.integers(1, 8)))
        row_offset = int(rng.integers(0, 3))
        out = np.zeros((len(take) + row_offset, 2 * L + 8), np.uint8)
        assert native.pack_batch_into(
            out, row_offset, buf, np.array(seq_off, np.int64),
            np.array(seq_len, np.int64), np.array(qual_off, np.int64),
            np.asarray(take, np.int64), L)
        src = np.frombuffer(buf, np.uint8)
        for k, i in enumerate(take):
            row = out[row_offset + k]
            sl = min(seq_len[i], L)
            assert np.array_equal(row[:sl],
                                  src[seq_off[i]:seq_off[i] + sl])
            assert np.array_equal(row[L:L + sl],
                                  src[qual_off[i]:qual_off[i] + sl])
            assert not row[sl:L].any() and not row[L + sl:2 * L].any()
            assert int(np.frombuffer(row[2 * L:2 * L + 4], "<u4")[0]) == sl
            assert row[2 * L + 4] == 1
        assert not out[:row_offset].any()


def test_pack_batch_b5_fuzz():
    """Native base5 pack == numpy-decoded roundtrip; invalid alphabet
    bytes return False without corrupting completed rows' semantics."""
    rng = np.random.default_rng(23)
    b5bases = np.frombuffer(b"ACGTN", np.uint8)
    for trial in range(100):
        n_rec = int(rng.integers(1, 10))
        dirty = trial % 4 == 0
        blobs, seq_off, seq_len, qual_off = [], [], [], []
        pos = 0
        for _ in range(n_rec):
            sl = int(rng.integers(0, 40))
            if dirty:
                seq = rng.integers(65, 91, size=sl).astype(np.uint8)
                qual = rng.integers(33, 120, size=sl).astype(np.uint8)
            else:
                seq = rng.choice(b5bases, size=sl)
                qual = rng.integers(33, 84, size=sl).astype(np.uint8)
            seq_off.append(pos)
            seq_len.append(sl)
            blobs.append(seq)
            pos += sl
            qual_off.append(pos)
            blobs.append(qual)
            pos += sl
        buf = np.concatenate(blobs).tobytes() if blobs else b""
        src = np.frombuffer(buf, np.uint8)
        L = int(rng.integers(1, 48))
        take = rng.integers(0, n_rec, size=int(rng.integers(1, 8)))
        row_offset = int(rng.integers(0, 3))
        out = np.zeros((len(take) + row_offset, L + 8), np.uint8)
        ok = native.pack_batch_b5_into(
            out, row_offset, buf, np.array(seq_off, np.int64),
            np.array(seq_len, np.int64), np.array(qual_off, np.int64),
            np.asarray(take, np.int64), L)
        # oracle: valid iff every in-range byte is ACGTN / qual 33..83
        valid = True
        for i in take:
            sl = min(seq_len[i], L)
            s = src[seq_off[i]:seq_off[i] + sl]
            q = src[qual_off[i]:qual_off[i] + sl]
            if not (np.isin(s, b5bases).all()
                    and ((q >= 33) & (q <= 83)).all()):
                valid = False
                break
        assert ok == valid
        if not ok:
            continue
        for k, i in enumerate(take):
            row = out[row_offset + k]
            sl = min(seq_len[i], L)
            v = row[:sl]
            q5 = v // 5
            assert np.array_equal(b5bases[v - q5 * 5],
                                  src[seq_off[i]:seq_off[i] + sl])
            assert np.array_equal(q5 + 33,
                                  src[qual_off[i]:qual_off[i] + sl])
            assert (row[sl:L] == 255).all()
            assert int(np.frombuffer(row[L:L + 4], "<u4")[0]) == sl
            assert row[L + 4] == 1
        assert not out[:row_offset].any()


def test_stat_rows_b5_matches_wide():
    """fpl_stat_rows over a base5 batch == over the equivalent wide batch."""
    rng = np.random.default_rng(29)
    b5bases = np.frombuffer(b"ACGTN", np.uint8)
    for trial in range(30):
        L = int(rng.integers(1, 40))
        nrows = int(rng.integers(1, 8))
        Lacc = int(rng.integers(1, 2 * L))
        bases = rng.choice(b5bases, size=(nrows, L))
        quals = rng.integers(33, 84, size=(nrows, L)).astype(np.uint8)
        wide = np.zeros((nrows, 2 * L + 8), np.uint8)
        wide[:, :L] = bases
        wide[:, L:2 * L] = quals
        b5 = np.zeros((nrows, L + 8), np.uint8)
        code = np.zeros(256, np.uint8)
        for c, v in zip(b"ACGTN", range(5)):
            code[c] = v
        b5[:, :L] = code[bases] + 5 * (quals - 33)
        lo = rng.integers(0, L, size=nrows).astype(np.int64)
        hi = rng.integers(0, L + 1, size=nrows).astype(np.int64)
        mlo = rng.integers(0, L, size=nrows).astype(np.int64)
        mhi = rng.integers(0, L + 1, size=nrows).astype(np.int64)
        accs = []
        for packed, is_b5 in ((wide, False), (b5, True)):
            cyc = np.zeros(Lacc * 18, np.int64)
            q20 = np.zeros(8, np.int64)
            q30 = np.zeros(8, np.int64)
            hist = np.zeros(128, np.int64)
            kmer = np.zeros(1024, np.int64)
            medians = np.zeros(nrows, np.uint8)
            assert native.stat_rows(packed, L, is_b5, lo, hi, mlo, mhi,
                                    None, cyc, q20, q30, hist, kmer,
                                    medians)
            accs.append((cyc, q20, q30, hist, kmer, medians))
        for a, b in zip(*accs):
            assert np.array_equal(a, b)


# ------------------------------------------------------------------- emit

def test_emit_pieces2_fuzz():
    rng = np.random.default_rng(11)
    for trial in range(200):
        n1 = int(rng.integers(0, 100))
        n2 = int(rng.integers(1, 100))
        src1 = rng.integers(0, 256, size=n1).astype(np.uint8)
        src2 = bytes(rng.integers(0, 256, size=n2).astype(np.uint8))
        offs, lens, expect = [], [], []
        for _ in range(int(rng.integers(0, 20))):
            if rng.random() < 0.15:           # zero/negative length pieces
                offs.append(int(rng.integers(0, n1 + n2)))
                lens.append(int(rng.integers(-3, 1)))
                continue
            if n1 and rng.random() < 0.5:     # src1 piece
                o = int(rng.integers(0, n1))
                l = int(rng.integers(1, n1 - o + 1))
                expect.append(src1[o:o + l].tobytes())
            else:                             # src2 piece (offset >= n1)
                o2 = int(rng.integers(0, n2))
                l = int(rng.integers(1, n2 - o2 + 1))
                o = n1 + o2
                expect.append(src2[o2:o2 + l])
            offs.append(o)
            lens.append(l)
        total = sum(max(0, x) for x in lens)
        got = native.emit_pieces2(src1, src2, np.array(offs, np.int64),
                                  np.array(lens, np.int64), total)
        assert got == b"".join(expect)


# ------------------------------------------------------------------- gzip

def test_gzip_roundtrip_fuzz():
    rng = np.random.default_rng(13)
    for trial in range(60):
        kind = trial % 3
        if kind == 0:    # incompressible
            n = int(rng.integers(0, 1 << 16))
            data = bytes(rng.integers(0, 256, size=n).astype(np.uint8))
        elif kind == 1:  # compressible + larger than the wrapper's 64K
            n = int(rng.integers(1 << 16, 1 << 18))  # floor: forces the
            data = bytes([int(rng.integers(65, 70))]) * n  # grow-retry path
        else:
            n = int(rng.integers(0, 1 << 16))
            data = bytes(rng.choice(np.frombuffer(b"ACGT\n", np.uint8),
                                    size=n))
        level = int(rng.integers(1, 10))
        comp = native.gzip_compress(data, level)
        assert comp is not None
        # tiny cap hint forces the INSUFFICIENT_SPACE retry loop
        out = native.gzip_decompress_member(comp, 0, cap_hint=1)
        assert out is not None
        arr, used = out
        assert arr.tobytes() == data
        assert used == len(comp)


def test_gzip_corrupt_and_truncated_no_crash():
    rng = np.random.default_rng(17)
    comp = native.gzip_compress(b"ACGT" * 4000, 6)
    for trial in range(150):
        data = bytearray(comp)
        if trial % 2:   # flip random bytes
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256))
        else:           # truncate
            data = data[:int(rng.integers(0, len(data)))]
        try:
            out = native.gzip_decompress_member(bytes(data), 0, 4096)
        except ValueError:
            continue    # clean rejection is the contract
        if out is not None:  # undetected flip in the payload is possible
            arr, used = out  # ...but bounds must hold
            assert used <= len(data)


def test_gzip_multimember_offsets():
    a = native.gzip_compress(b"hello world" * 100, 4)
    b = native.gzip_compress(b"second member" * 50, 4)
    blob = a + b
    arr1, used1 = native.gzip_decompress_member(blob, 0, 64)
    assert arr1.tobytes() == b"hello world" * 100 and used1 == len(a)
    arr2, used2 = native.gzip_decompress_member(blob, used1, 64)
    assert arr2.tobytes() == b"second member" * 50 and used2 == len(b)


# ------------------------------------------------------------------ stats

def stat_oracle(packed, L, lo, hi, mlo, mhi, rowmask, Lacc):
    """Python mirror of fpl_stat_rows (reference stats.cpp:265-375)."""
    cyc = np.zeros(Lacc * 18, np.int64)
    q20 = np.zeros(8, np.int64)
    q30 = np.zeros(8, np.int64)
    hist = np.zeros(128, np.int64)
    kmer = np.zeros(1024, np.int64)
    medians = np.zeros(packed.shape[0], np.uint8)
    code = {65: 0, 84: 1, 85: 1, 67: 2, 71: 3}
    for i in range(packed.shape[0]):
        if rowmask is not None and not rowmask[i]:
            continue
        b = packed[i, :L]
        q = packed[i, L:2 * L]
        s = 0 if lo is None else max(0, int(lo[i]))
        e = min(int(hi[i]), L)
        e = min(e, s + Lacc)
        if e <= s:
            continue
        ms = 0 if mlo is None else int(mlo[i])
        me = 0 if mhi is None else int(mhi[i])
        qh = np.zeros(256, np.int64)
        key, run = 0, 0
        for p in range(s, e):
            base = 78 if ms <= p < me else int(b[p])
            qv = int(q[p]) - 33
            c18 = (p - s) * 18
            bucket = base & 7
            cyc[c18 + bucket] += 1
            cyc[c18 + 8 + bucket] += qv
            cyc[c18 + 16] += 1
            cyc[c18 + 17] += qv
            if q[p] >= ord("5"):
                q20[bucket] += 1
            if q[p] >= ord("?"):
                q30[bucket] += 1
            hist[min(int(q[p]), 127)] += 1
            qh[q[p]] += 1
            cd = code.get(base)
            if cd is None:
                run = 0
            else:
                key = ((key << 2) | cd) & 0x3FF
                run += 1
                if run >= 5:
                    kmer[key] += 1
        want = ((e - s) >> 1) + 1
        medians[i] = int(np.searchsorted(np.cumsum(qh), want) )
    return cyc, q20, q30, hist, kmer, medians


def test_stat_rows_fuzz():
    rng = np.random.default_rng(19)
    for trial in range(40):
        L = int(rng.integers(1, 40))
        nrows = int(rng.integers(1, 8))
        Lacc = int(rng.integers(1, 2 * L))
        packed = np.zeros((nrows, 2 * L + 8), np.uint8)
        packed[:, :L] = rng.choice(
            np.frombuffer(b"ACGTUNacgt\0\xff", np.uint8), size=(nrows, L))
        packed[:, L:2 * L] = rng.integers(33, 127, size=(nrows, L))
        # spans exercising every clamp: negative lo, hi>L, span>Lacc, empty
        lo = rng.integers(-3, L + 1, size=nrows).astype(np.int64)
        hi = rng.integers(-1, L + 4, size=nrows).astype(np.int64)
        mlo = rng.integers(-2, L, size=nrows).astype(np.int64)
        mhi = rng.integers(-2, L + 2, size=nrows).astype(np.int64)
        rowmask = (rng.random(nrows) < 0.8).astype(np.uint8)
        use_lo = rng.random() < 0.8
        use_m = rng.random() < 0.7
        use_rm = rng.random() < 0.8
        cyc = np.zeros(Lacc * 18, np.int64)
        q20 = np.zeros(8, np.int64)
        q30 = np.zeros(8, np.int64)
        hist = np.zeros(128, np.int64)
        kmer = np.zeros(1024, np.int64)
        medians = np.zeros(nrows, np.uint8)
        assert native.stat_rows(
            packed, L, False, lo if use_lo else None, hi,
            mlo if use_m else None, mhi if use_m else None,
            rowmask if use_rm else None,
            cyc, q20, q30, hist, kmer, medians)
        o = stat_oracle(packed, L, lo if use_lo else None, hi,
                        mlo if use_m else None, mhi if use_m else None,
                        rowmask if use_rm else None, Lacc)
        assert np.array_equal(cyc, o[0])
        assert np.array_equal(q20, o[1]) and np.array_equal(q30, o[2])
        assert np.array_equal(hist, o[3]) and np.array_equal(kmer, o[4])
        assert np.array_equal(medians, o[5])
