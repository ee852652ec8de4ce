import gzip
import io
import os

import numpy as np
import pytest

from fastplong_tpu.io.fastq import FastqStreamReader
from fastplong_tpu.io.fasta import FastaReader
from fastplong_tpu.io.writer import Writer


def write_fastq(path, records):
    with open(path, "w") as f:
        for name, seq, qual in records:
            f.write("%s\n%s\n+\n%s\n" % (name, seq, qual))


RECORDS = [
    ("@read1 desc", "ACGTACGTAA", "IIIIIIIIII"),
    ("@read2", "GGGG", "!!!!"),
    ("@read3", "ACGTN", "IIIII"),
]


def collect(reader):
    out = []
    while True:
        b = reader.next_block()
        if b is None:
            break
        for i in range(b.n):
            out.append((b.name(i).decode(), b.seq(i).decode(), b.qual(i).decode()))
    return out


def test_plain_roundtrip(tmp_path):
    p = str(tmp_path / "in.fq")
    write_fastq(p, RECORDS)
    got = collect(FastqStreamReader(p))
    assert got == RECORDS


def test_gzip_roundtrip(tmp_path):
    p = str(tmp_path / "in.fq.gz")
    body = "".join("%s\n%s\n+\n%s\n" % r for r in RECORDS)
    with gzip.open(p, "wt") as f:
        f.write(body)
    got = collect(FastqStreamReader(p))
    assert got == RECORDS


def test_multimember_gzip(tmp_path):
    p = str(tmp_path / "in.fq.gz")
    with open(p, "wb") as f:
        for r in RECORDS:
            f.write(gzip.compress(("%s\n%s\n+\n%s\n" % r).encode()))
    got = collect(FastqStreamReader(p))
    assert got == RECORDS


def test_no_trailing_newline(tmp_path):
    p = str(tmp_path / "in.fq")
    with open(p, "w") as f:
        f.write("@r1\nACGT\n+\nIIII")  # no final \n
    got = collect(FastqStreamReader(p))
    assert got == [("@r1", "ACGT", "IIII")]


def test_crlf(tmp_path):
    p = str(tmp_path / "in.fq")
    with open(p, "wb") as f:
        f.write(b"@r1\r\nACGT\r\n+\r\nIIII\r\n")
    got = collect(FastqStreamReader(p))
    assert got == [("@r1", "ACGT", "IIII")]


def test_skip_junk_lines(tmp_path):
    p = str(tmp_path / "in.fq")
    with open(p, "w") as f:
        f.write("\n\njunk\n@r1\nACGT\n+\nIIII\n")
    got = collect(FastqStreamReader(p))
    assert got == [("@r1", "ACGT", "IIII")]


def test_malformed_strand_stops(tmp_path, capsys):
    p = str(tmp_path / "in.fq")
    with open(p, "w") as f:
        f.write("@r1\nACGT\n+\nIIII\n@r2\nACGT\nX\nIIII\n@r3\nACGT\n+\nIIII\n")
    got = collect(FastqStreamReader(p))
    # parsing stops at the malformed record, like the reference reader
    assert got == [("@r1", "ACGT", "IIII")]


def test_qual_len_mismatch_stops(tmp_path):
    p = str(tmp_path / "in.fq")
    with open(p, "w") as f:
        f.write("@r1\nACGT\n+\nIII\n@r2\nACGT\n+\nIIII\n")
    got = collect(FastqStreamReader(p))
    assert got == []


def test_fasta(tmp_path):
    p = str(tmp_path / "a.fa")
    with open(p, "w") as f:
        f.write(">a1 desc\nacgt\nACGT\n>a2\nTT TT\n12\nGG\n")
    r = FastaReader(p)
    r.read_all()
    assert r.contigs["a1 desc"] == "ACGTACGT"
    assert r.contigs["a2"] == "TTTTGG"


def test_writer_plain(tmp_path):
    p = str(tmp_path / "out.fq")
    w = Writer(p)
    w.write(b"hello ")
    w.write(b"world")
    w.close()
    assert open(p, "rb").read() == b"hello world"


def test_writer_gzip_members(tmp_path):
    p = str(tmp_path / "out.fq.gz")
    w = Writer(p, compression=4, buffer_size=8)
    w.write(b"0123456")   # fits buffer
    w.write(b"89abcdef")  # forces flush of first, then buffers
    w.close()
    data = open(p, "rb").read()
    # two independent gzip members
    assert data.count(b"\x1f\x8b") >= 2
    assert gzip.decompress(data) == b"012345689abcdef"


# ------------------------------------------------- native gz member decoder

def test_member_decoder_active_and_matches_streaming(tmp_path, monkeypatch):
    """The main-run reader uses the native whole-member decoder; the
    evaluator's prefix_only reader and the streaming fallback must agree."""
    p = str(tmp_path / "in.fq.gz")
    recs = [("@r%d" % i, "ACGT" * (3 + i % 37), "I" * 4 * (3 + i % 37))
            for i in range(2000)]
    with open(p, "wb") as f:
        body = "".join("%s\n%s\n+\n%s\n" % r for r in recs).encode()
        half = len(body) // 2
        f.write(gzip.compress(body[:half]))
        f.write(gzip.compress(body[half:]))
    r_member = FastqStreamReader(p)
    r_stream = FastqStreamReader(p, prefix_only=True)
    if r_member._member is None:
        pytest.skip("native library unavailable")
    assert r_stream._member is None
    got_m = collect(r_member)
    got_s = collect(r_stream)
    assert got_m == got_s == recs
    # compressed-byte accounting reaches the full file size
    assert r_member.get_bytes()[0] == os.path.getsize(p)


def test_member_decoder_size_limit_falls_back(tmp_path, monkeypatch):
    import fastplong_tpu.io.fastq as fq
    p = str(tmp_path / "in.fq.gz")
    with gzip.open(p, "wt") as f:
        f.write("".join("%s\n%s\n+\n%s\n" % r for r in RECORDS))
    monkeypatch.setattr(fq, "_GZ_INMEM_LIMIT", 1)
    r = FastqStreamReader(p)
    assert r._member is None
    assert collect(r) == RECORDS


def test_corrupt_gzip_member_error_exits(tmp_path):
    p = str(tmp_path / "in.fq.gz")
    raw = gzip.compress(b"@r1\nACGT\n+\nIIII\n" * 400)
    with open(p, "wb") as f:
        # valid header, corrupted deflate stream
        f.write(raw[:20] + bytes(ch ^ 0xFF for ch in raw[20:60]) + raw[60:])
    r = FastqStreamReader(p)
    if r._member is None:
        pytest.skip("native library unavailable")
    # reference error_exit semantics (src/util.h:270-273): stderr + exit
    with pytest.raises(SystemExit):
        collect(r)


def test_truncated_gzip_reports_unexpected_eof(tmp_path, capsys):
    """Reference diagnostic for mid-member EOF (fastqreader.cpp:135-139),
    on both the native member path and the streaming zlib path."""
    full = gzip.compress(b"@r1\nACGT\n+\nIIII\n" * 400)
    p = str(tmp_path / "t.fq.gz")
    with open(p, "wb") as f:
        f.write(full[: len(full) // 2])
    for prefix_only in (False, True):
        r = FastqStreamReader(p, prefix_only=prefix_only)
        with pytest.raises(SystemExit):
            collect(r)
        assert "igzip: unexpected eof" in capsys.readouterr().err


def test_corrupt_gzip_streaming_path_diagnostic(tmp_path, capsys):
    raw = gzip.compress(b"@r1\nACGT\n+\nIIII\n" * 400)
    p = str(tmp_path / "c.fq.gz")
    with open(p, "wb") as f:
        f.write(raw[:20] + bytes(ch ^ 0xFF for ch in raw[20:60]) + raw[60:])
    r = FastqStreamReader(p, prefix_only=True)  # streaming zlib path
    with pytest.raises(SystemExit):
        collect(r)
    assert "igzip: encountered while decompressing" in capsys.readouterr().err


def test_parallel_gzip_writer_matches_sequential(tmp_path):
    """ParallelGzipWriter must produce the EXACT bytes of the sequential
    Writer: same member boundaries (flush semantics), same level, same
    compressor — only the scheduling differs."""
    import gzip
    import numpy as np
    from fastplong_tpu.io.writer import Writer, ParallelGzipWriter

    rng = np.random.default_rng(5)
    # chunk pattern exercising every branch: small appends, a chunk that
    # triggers flush, and an oversized chunk written as its own member
    chunks = []
    for _ in range(60):
        n = int(rng.choice([10, 1000, 3000, 5000, 9000]))
        chunks.append(bytes(rng.integers(65, 91, size=n).astype(np.uint8)))

    seq_path = str(tmp_path / "seq.fq.gz")
    par_path = str(tmp_path / "par.fq.gz")
    w = Writer(seq_path, compression=4, buffer_size=4096)
    for c in chunks:
        w.write(c)
    w.close()
    p = ParallelGzipWriter(par_path, compression=4, threads=3,
                           buffer_size=4096)
    for c in chunks:
        p.write(c)
    p.close()

    a = open(seq_path, "rb").read()
    b = open(par_path, "rb").read()
    assert a == b
    assert gzip.decompress(b) == b"".join(chunks)


def test_parallel_gzip_writer_failure_surfaces(tmp_path, monkeypatch):
    from fastplong_tpu.io import writer as writer_mod

    class Boom(writer_mod.GzipMemberCompressor):
        def compress(self, data):
            raise OSError("compressor exploded")

    monkeypatch.setattr(writer_mod, "GzipMemberCompressor", Boom)
    p = writer_mod.ParallelGzipWriter(str(tmp_path / "x.gz"), threads=2,
                                      buffer_size=64)
    import pytest as _pytest
    with _pytest.raises(OSError):
        try:
            for _ in range(200):  # survives back-pressure: drain continues
                p.write(b"y" * 48)
                import time as _t
                _t.sleep(0.001)
        finally:
            p.close()


def test_make_output_writer_dispatch(tmp_path):
    from fastplong_tpu.io.writer import (make_output_writer,
                                         ParallelGzipWriter, AsyncWriter)
    w = make_output_writer(str(tmp_path / "a.fq.gz"))
    assert isinstance(w, ParallelGzipWriter)
    w.write(b"@r\nA\n+\n!\n")
    w.close()
    w2 = make_output_writer(str(tmp_path / "a.fq"))
    assert isinstance(w2, AsyncWriter)
    w2.write(b"@r\nA\n+\n!\n")
    w2.close()
    import gzip
    assert gzip.decompress(open(tmp_path / "a.fq.gz", "rb").read()) == \
        open(tmp_path / "a.fq", "rb").read()
