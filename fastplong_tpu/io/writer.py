"""Buffered output writer.

Mirrors the reference Writer (src/writer.cpp:61-133): a 4MB in-memory
buffer; when the output name ends with .gz, every flushed buffer becomes an
independent gzip member (libdeflate whole-buffer compress), otherwise plain
bytes.  STDOUT mode writes to sys.stdout.buffer uncompressed.

Because members are independent, gzip outputs use ParallelGzipWriter:
flushed buffers compress concurrently on a small thread pool while a single
drain thread writes the results in submit order — same bytes as the
sequential Writer (identical member boundaries and level), but compression
no longer serializes behind one thread the way the reference's
one-writer-thread-per-output design does (src/writerthread.cpp:37-48).
"""

import os
import queue
import sys
import threading

from .compression import GzipMemberCompressor


class AsyncWriter:
    """Wraps a Writer with a background thread: compression + file writes
    overlap the main pipeline, like the reference's writer threads
    (src/writerthread.cpp).  Bounded queue gives reader back-pressure."""

    def __init__(self, writer, max_queue=16):
        self._w = writer
        self._q = queue.Queue(maxsize=max_queue)
        self._exc = None
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._exc is not None:
                continue  # drain so producers never block on a dead writer
            try:
                self._w.write(item)
            except Exception as e:
                self._exc = e

    def check(self):
        """Raise promptly if the writer thread has failed (e.g. disk full);
        the pipeline polls this between blocks so a failure doesn't burn
        minutes of compute before the next write call surfaces it."""
        if self._exc:
            raise self._exc

    def write(self, data: bytes):
        self.check()
        self._q.put(data)

    def close(self):
        self._q.put(None)
        self._t.join()
        if self._exc is None:
            self._w.close()
        else:
            try:
                self._w.close()
            except Exception:
                pass
            raise self._exc


class ParallelGzipWriter:
    """Order-preserving parallel gzip output.

    Same buffering/member-boundary semantics as Writer (a flush = one
    independent gzip member), so the output bytes are identical — but
    members compress concurrently on a thread pool (libdeflate releases
    the GIL through ctypes) and a single drain thread writes the results
    in submit order.  Presents the AsyncWriter interface
    (write/check/close) so the runner can use either interchangeably.

    FASTPLONG_GZ_THREADS sets the pool size (default: up to 4, leaving a
    core for the main thread; 0 or 1 is still correct, just serial).
    """

    def __init__(self, filename: str, compression: int = 4,
                 threads: int = None, buffer_size: int = 1 << 22,
                 max_pending: int = 16):
        from concurrent.futures import ThreadPoolExecutor
        self.filename = filename
        self._level = compression
        self._fp = open(filename, "wb")
        self._buf = bytearray()
        self._bufsize = buffer_size
        if threads is None:
            threads = int(os.environ.get("FASTPLONG_GZ_THREADS", "0")) or \
                max(1, min(4, (os.cpu_count() or 2) - 1))
        self._pool = ThreadPoolExecutor(max(1, threads),
                                        thread_name_prefix="fplgz")
        self._local = threading.local()  # one libdeflate handle per worker
        self._q = queue.Queue(maxsize=max_pending)
        self._exc = None
        self._t = threading.Thread(target=self._drain, daemon=True)
        self._t.start()

    def _compress(self, data: bytes) -> bytes:
        comp = getattr(self._local, "comp", None)
        if comp is None:
            comp = self._local.comp = GzipMemberCompressor(self._level)
        return comp.compress(data)

    def _drain(self):
        while True:
            fut = self._q.get()
            if fut is None:
                return
            try:
                data = fut.result()
                if self._exc is None:
                    self._fp.write(data)
            except Exception as e:
                if self._exc is None:
                    self._exc = e
                # keep consuming so producers never block on a dead writer

    def check(self):
        if self._exc:
            raise self._exc

    def write(self, data: bytes):
        self.check()
        if len(data) + len(self._buf) > self._bufsize:
            self._flush_buf()
        if len(data) > self._bufsize:
            self._submit(bytes(data))
        else:
            self._buf += data

    def _flush_buf(self):
        if self._buf:
            self._submit(bytes(self._buf))
            self._buf = bytearray()

    def _submit(self, data: bytes):
        self._q.put(self._pool.submit(self._compress, data))

    def close(self):
        self._flush_buf()
        self._q.put(None)
        self._t.join()
        self._pool.shutdown(wait=True)
        try:
            self._fp.close()
        except Exception:
            if self._exc is None:
                raise
        if self._exc is not None:
            raise self._exc


def make_output_writer(filename: str, compression: int = 4,
                       stdout: bool = False, buffer_size: int = 1 << 22):
    """The runner's writer factory: parallel member compression for .gz
    files, a plain async writer otherwise (and for stdout)."""
    if not stdout and filename and filename.endswith(".gz"):
        return ParallelGzipWriter(filename, compression,
                                  buffer_size=buffer_size)
    return AsyncWriter(Writer(filename, compression, stdout=stdout,
                              buffer_size=buffer_size))


class Writer:
    def __init__(self, filename: str, compression: int = 4,
                 stdout: bool = False, buffer_size: int = 1 << 22):
        self.filename = filename
        self.stdout = stdout
        self.zipped = False
        self._buf = bytearray()
        self._bufsize = buffer_size
        self._compressor = None
        if stdout:
            self._fp = sys.stdout.buffer
        else:
            self._fp = open(filename, "wb")
            if filename.endswith(".gz"):
                self.zipped = True
                self._compressor = GzipMemberCompressor(compression)

    def write(self, data: bytes):
        if len(data) + len(self._buf) > self._bufsize:
            self.flush()
        if len(data) > self._bufsize:
            self._write_internal(bytes(data))
        else:
            self._buf += data

    def flush(self):
        if self._buf:
            self._write_internal(bytes(self._buf))
            self._buf = bytearray()

    def _write_internal(self, data: bytes):
        if self.zipped:
            data = self._compressor.compress(data)
        self._fp.write(data)

    def close(self):
        self.flush()
        if self._compressor:
            self._compressor.close()
            self._compressor = None
        if not self.stdout:
            self._fp.close()
