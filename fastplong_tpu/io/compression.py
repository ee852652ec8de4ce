"""Compression backends.

Output: whole-buffer gzip members via libdeflate (ctypes), matching the
reference writer's behavior of emitting one independent gzip member per
flushed buffer (reference src/writer.cpp:98-133).  This keeps compression
embarrassingly parallel across buffers.

Input: streaming multi-member gzip inflate.  The reference uses isa-l igzip
with explicit multi-member reset logic (src/fastqreader.cpp:79-140); we use
zlib's decompressobj with wbits=47 in a member-reset loop, which accepts the
same inputs (including concatenated members).
"""

import ctypes
import ctypes.util
import zlib

_libdeflate = None


def _load_libdeflate():
    global _libdeflate
    if _libdeflate is not None:
        return _libdeflate
    path = ctypes.util.find_library("deflate") or "libdeflate.so"
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _libdeflate = False
        return False
    lib.libdeflate_alloc_compressor.restype = ctypes.c_void_p
    lib.libdeflate_alloc_compressor.argtypes = [ctypes.c_int]
    lib.libdeflate_free_compressor.argtypes = [ctypes.c_void_p]
    lib.libdeflate_gzip_compress_bound.restype = ctypes.c_size_t
    lib.libdeflate_gzip_compress_bound.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.libdeflate_gzip_compress.restype = ctypes.c_size_t
    lib.libdeflate_gzip_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t]
    _libdeflate = lib
    return lib


class GzipMemberCompressor:
    """Compresses each `compress()` call into an independent gzip member."""

    def __init__(self, level: int = 4):
        self.level = level
        self._lib = _load_libdeflate()
        self._c = None
        if self._lib:
            self._c = ctypes.c_void_p(
                self._lib.libdeflate_alloc_compressor(level))
            if not self._c:
                self._lib = False

    def compress(self, data: bytes) -> bytes:
        if self._lib:
            bound = self._lib.libdeflate_gzip_compress_bound(self._c, len(data))
            out = ctypes.create_string_buffer(bound)
            n = self._lib.libdeflate_gzip_compress(
                self._c, data, len(data), out, bound)
            if n:
                return out.raw[:n]
        # zlib fallback: one gzip member per call
        co = zlib.compressobj(self.level, zlib.DEFLATED, 31)
        return co.compress(data) + co.flush()

    def close(self):
        if self._lib and self._c:
            self._lib.libdeflate_free_compressor(self._c)
            self._c = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class StreamingGzipDecompressor:
    """Multi-member streaming gzip inflate (zlib backend)."""

    def __init__(self):
        self._d = zlib.decompressobj(47)
        self.eof = False

    def decompress(self, chunk: bytes, max_out: int = 0) -> bytes:
        out = []
        data = chunk
        while True:
            out.append(self._d.decompress(data))
            if self._d.eof:
                tail = self._d.unused_data
                # skip pure-zero padding (some producers pad with NULs)
                if tail.lstrip(b"\x00"):
                    self._d = zlib.decompressobj(47)
                    data = tail
                    continue
                self.eof = True
            break
        return b"".join(out)

    def flush(self) -> bytes:
        return self._d.flush()
