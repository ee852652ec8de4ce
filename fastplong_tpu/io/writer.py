"""Buffered output writer.

Mirrors the reference Writer (src/writer.cpp:61-133): a 4MB in-memory
buffer; when the output name ends with .gz, every flushed buffer becomes an
independent gzip member (libdeflate whole-buffer compress), otherwise plain
bytes.  STDOUT mode writes to sys.stdout.buffer uncompressed.

Compression of flushed buffers can optionally be fanned out to a thread pool
(gzip members are independent) — the ordered variant used by the pipeline
runner lives in pipeline/runner.py.
"""

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
