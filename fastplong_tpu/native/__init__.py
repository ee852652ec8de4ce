"""Native host library loader.

Compiles host_io.cpp on first use (g++, links system libdeflate) and exposes
ctypes bindings.  Every consumer has a pure-numpy fallback, so a missing
toolchain degrades performance, never correctness.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libfplhost.so")
_SRC = os.path.join(_HERE, "host_io.cpp")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", _SO + ".tmp", "-ldeflate"]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        sys.stderr.write("fastplong-tpu: native build failed, using python "
                         "fallback\n")
        return False
    os.replace(_SO + ".tmp", _SO)
    return True


def get_lib():
    """Returns the ctypes library or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # FASTPLONG_NATIVE_SO: load this exact shared object instead of
    # building/loading the default one — used to swap in instrumented
    # builds (AddressSanitizer, coverage) under the normal test suite
    so = os.environ.get("FASTPLONG_NATIVE_SO", "")
    if not so:
        so = _SO
        if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                       os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.fpl_parse_fastq.restype = ctypes.c_int64
    lib.fpl_parse_fastq.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, i64p, i64p, i64p, i64p, i64p,
        i64p, ctypes.POINTER(ctypes.c_int)]
    lib.fpl_pack_batch.restype = None
    lib.fpl_pack_batch.argtypes = [
        ctypes.c_char_p, i64p, i64p, i64p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
    lib.fpl_pack_batch_b5.restype = ctypes.c_int
    lib.fpl_pack_batch_b5.argtypes = [
        ctypes.c_char_p, i64p, i64p, i64p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
    lib.fpl_emit_pieces2.restype = None
    lib.fpl_emit_pieces2.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        i64p, i64p, ctypes.c_int64, ctypes.c_void_p]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.fpl_stat_rows.restype = None
    lib.fpl_stat_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, i64p, i64p, i64p, i64p, u8p, ctypes.c_int64,
        i64p, i64p, i64p, i64p, i64p, u8p]
    szp = ctypes.POINTER(ctypes.c_size_t)
    lib.fpl_gzip_decompress_member.restype = ctypes.c_int
    lib.fpl_gzip_decompress_member.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        szp, szp]
    lib.fpl_gzip_bound.restype = ctypes.c_size_t
    lib.fpl_gzip_bound.argtypes = [ctypes.c_size_t, ctypes.c_int]
    lib.fpl_gzip_compress.restype = ctypes.c_size_t
    lib.fpl_gzip_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_int]
    _lib = lib
    return _lib


def _as_i64_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def parse_fastq(buf: bytes, max_records: int):
    """Native fast-path parse. Returns (arrays..., consumed, ok) or None."""
    lib = get_lib()
    if lib is None:
        return None
    arrs = [np.empty(max_records, np.int64) for _ in range(7)]
    consumed = ctypes.c_int64(0)
    ok = ctypes.c_int(0)
    n = lib.fpl_parse_fastq(
        buf, len(buf), max_records,
        *[_as_i64_ptr(a) for a in arrs], ctypes.byref(consumed),
        ctypes.byref(ok))
    return ([a[:n] for a in arrs], int(consumed.value), bool(ok.value), int(n))


def pack_batch_into(out, row_offset, arr_bytes, seq_off, seq_len, qual_off,
                    indices, L):
    """Native packed-batch fill into out[row_offset:...]. Returns False if
    the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    ptr = out.ctypes.data + row_offset * out.shape[1]
    lib.fpl_pack_batch(
        arr_bytes, _as_i64_ptr(np.ascontiguousarray(seq_off)),
        _as_i64_ptr(np.ascontiguousarray(seq_len)),
        _as_i64_ptr(np.ascontiguousarray(qual_off)),
        _as_i64_ptr(np.ascontiguousarray(indices.astype(np.int64))),
        len(indices), L, ctypes.c_void_p(ptr), out.shape[0] - row_offset)
    return True


def stat_rows(packed, L, is_b5, lo, hi, mlo, mhi, rowmask,
              cyc, q20, q30, hist, kmer, medians):
    """Native statRead over packed rows into the given int64 accumulators
    (drain layout).  Returns False if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def i64(a):
        return (_as_i64_ptr(np.ascontiguousarray(a, np.int64))
                if a is not None else None)

    lib.fpl_stat_rows(
        packed.ctypes.data_as(ctypes.c_void_p),
        packed.shape[0], packed.shape[1], L, 1 if is_b5 else 0,
        i64(lo), i64(hi), i64(mlo), i64(mhi),
        (np.ascontiguousarray(rowmask, np.uint8).ctypes.data_as(u8p)
         if rowmask is not None else None),
        cyc.shape[0] // 18,
        _as_i64_ptr(cyc), _as_i64_ptr(q20), _as_i64_ptr(q30),
        _as_i64_ptr(hist), _as_i64_ptr(kmer),
        medians.ctypes.data_as(u8p))
    return True


def pack_batch_b5_into(out, row_offset, arr_bytes, seq_off, seq_len,
                       qual_off, indices, L):
    """Native base5 packed-batch fill into out[row_offset:...].  Returns
    True on success, False if a byte fell outside the base5 alphabet
    (caller must fall back to the wide layout), or None if the native
    lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ptr = out.ctypes.data + row_offset * out.shape[1]
    r = lib.fpl_pack_batch_b5(
        arr_bytes, _as_i64_ptr(np.ascontiguousarray(seq_off)),
        _as_i64_ptr(np.ascontiguousarray(seq_len)),
        _as_i64_ptr(np.ascontiguousarray(qual_off)),
        _as_i64_ptr(np.ascontiguousarray(indices.astype(np.int64))),
        len(indices), L, ctypes.c_void_p(ptr), out.shape[0] - row_offset)
    return bool(r)


def gzip_decompress_member(data, offset: int, cap_hint: int):
    """Decompress the single gzip member starting at data[offset:].

    Returns (np.uint8 output array, compressed bytes consumed), or None if
    the native library is unavailable.  Raises ValueError on corrupt data
    (the caller maps this to the reference's error_exit diagnostics,
    src/fastqreader.cpp:91-94).
    """
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    n = len(data) - offset
    cap = max(int(cap_hint), 1 << 16)
    in_used = ctypes.c_size_t(0)
    out_used = ctypes.c_size_t(0)
    while True:
        out = np.empty(cap, np.uint8)
        r = lib.fpl_gzip_decompress_member(
            ctypes.c_void_p(src.ctypes.data + offset), n,
            out.ctypes.data_as(ctypes.c_void_p), cap,
            ctypes.byref(in_used), ctypes.byref(out_used))
        if r == 0:
            return out[:out_used.value], int(in_used.value)
        if r == 3:  # LIBDEFLATE_INSUFFICIENT_SPACE: grow and retry
            cap *= 2
            continue
        if r == -1:
            return None
        raise ValueError("invalid gzip data")


def emit_pieces2(src1, aux: bytes, offs, lens, total):
    """Two-source native piece-table concatenation (offsets >= len(src1)
    read `aux`).  Returns bytes or None."""
    lib = get_lib()
    if lib is None:
        return None
    offs = np.ascontiguousarray(offs, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    out = np.empty(total, np.uint8)
    lib.fpl_emit_pieces2(
        src1.ctypes.data_as(ctypes.c_void_p), len(src1), aux,
        _as_i64_ptr(offs), _as_i64_ptr(lens), len(offs),
        out.ctypes.data_as(ctypes.c_void_p))
    return out.tobytes()


def gzip_compress(data: bytes, level: int):
    """Native libdeflate gzip member. Returns bytes or None."""
    lib = get_lib()
    if lib is None:
        return None
    bound = lib.fpl_gzip_bound(len(data), level)
    if not bound:
        return None
    out = ctypes.create_string_buffer(bound)
    n = lib.fpl_gzip_compress(data, len(data), out, bound, level)
    if not n:
        return None
    return out.raw[:n]
