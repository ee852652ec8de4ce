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


class MemberGzipDecoder:
    """Member-at-a-time gzip decode of an in-memory compressed buffer.

    The native input path replacing the reference's streaming isa-l inflate
    (src/fastqreader.cpp:79-140): libdeflate whole-member decode runs
    ~500-650 MB/s vs ~130 MB/s for zlib streaming.  Requires the complete
    compressed file in memory (the reader bounds this with
    FASTPLONG_GZ_INMEM_LIMIT and falls back to streaming zlib).
    """

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0
        self.eof = not data

    @property
    def pos(self) -> int:
        """Compressed bytes fully consumed so far."""
        return self._pos

    def tail_is_truncated(self):
        """After a failed next_member: True if the remaining bytes are a
        VALID deflate stream that simply ends early (truncated file), False
        if the stream itself is corrupt.  Chooses between the reference's
        two gzip diagnostics."""
        d = zlib.decompressobj(47)
        try:
            d.decompress(self._data[self._pos:])
        except zlib.error:
            return False
        return not d.eof

    def next_member(self):
        """Decode the next gzip member.

        Returns (np.uint8 array, compressed_bytes_consumed), or None at end
        of input.  Raises ValueError on corrupt data, or falls back by
        raising RuntimeError if the native library is unavailable.
        """
        from ..native import gzip_decompress_member
        data = self._data
        while True:
            if self._pos >= len(data):
                self.eof = True
                return None
            if data[self._pos] == 0:
                # skip pure-zero padding after a member (some producers
                # pad with NULs; mirrors the zlib path's lstrip)
                tail = data[self._pos:].lstrip(b"\x00")
                if not tail:
                    self.eof = True
                    return None
                self._pos = len(data) - len(tail)
            rem = len(data) - self._pos
            res = gzip_decompress_member(
                data, self._pos, min(4 * rem, 1 << 31))
            if res is None:
                raise RuntimeError("native gzip decoder unavailable")
            out, used = res
            self._pos += used
            if self._pos >= len(data):
                self.eof = True
            if len(out):
                return out, used
            # zero-length member: continue to the next one


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
