"""Small host-side helpers (string/DNA utilities, logging).

Complement semantics follow the reference (src/util.h:16-32 and the SIMD
reverse-complement in src/sequence.cpp:29-77): A<->T, C<->G (case-insensitive
input, uppercase output), anything else -> 'N'.
"""

import os
import sys
import threading
import time

_COMPLEMENT = {}
for _a, _b in (("A", "T"), ("T", "A"), ("C", "G"), ("G", "C"),
               ("a", "T"), ("t", "A"), ("c", "G"), ("g", "C")):
    _COMPLEMENT[_a] = _b

_COMP_TABLE = bytes(
    ord(_COMPLEMENT.get(chr(i), "N")) for i in range(256)
)


def complement(base: str) -> str:
    return _COMPLEMENT.get(base, "N")


def reverse_complement(seq: str) -> str:
    """Reverse complement with reference semantics (unknown bases -> N)."""
    return bytes(reversed(seq.encode("latin-1").translate(_COMP_TABLE))).decode("latin-1")


def reverse_complement_bytes(seq: bytes) -> bytes:
    return bytes(reversed(seq.translate(_COMP_TABLE)))


def num2qual(num: int) -> str:
    return chr(num + 33)


def error_exit(msg: str):
    sys.stderr.write("ERROR: " + msg + "\n")
    sys.exit(-1)


def check_file_valid(path: str):
    if not os.path.exists(path):
        error_exit("file does not exist: " + path)
    if os.path.isdir(path):
        error_exit("this is not a file: " + path)


def file_exists(path: str) -> bool:
    return os.path.isfile(path)


_log_lock = threading.Lock()


def loginfo(msg: str):
    with _log_lock:
        t = time.localtime()
        sys.stderr.write(
            "[%02d:%02d:%02d] %s\n" % (t.tm_hour, t.tm_min, t.tm_sec, msg))


def basename(path: str) -> str:
    return os.path.basename(path)


def dirname(path: str) -> str:
    d = os.path.dirname(path)
    return d if d else "."


def joinpath(d: str, f: str) -> str:
    return os.path.join(d, f)


class DaemonExecutor:
    """Minimal ThreadPoolExecutor lookalike whose workers are DAEMON
    threads.

    Used for every worker that calls into the device runtime (result
    fetches, executable prewarm loads): a call wedged inside the device
    plugin — a dead tunneled interconnect blocks inside a C extension with
    no EINTR-able syscall — is uninterruptible, and a non-daemon worker
    stuck there would hang interpreter exit (threading._shutdown joins
    non-daemon threads).  Daemon workers let the process exit anyway; the
    runner's fetch watchdog (pipeline/runner.py) guarantees results are
    recomputed on the host CPU backend when that happens, so abandoning
    the thread never loses work."""

    def __init__(self, max_workers=1, thread_name_prefix="daemon-exec"):
        import queue
        from concurrent.futures import Future  # noqa: F401 (re-export)
        self._q = queue.SimpleQueue()
        self._threads = []
        self._shut = False
        for i in range(max_workers):
            t = threading.Thread(target=self._worker, daemon=True,
                                 name="%s-%d" % (thread_name_prefix, i))
            t.start()
            self._threads.append(t)

    def submit(self, fn, *args, **kwargs):
        from concurrent.futures import Future
        if self._shut:
            raise RuntimeError("cannot submit after shutdown")
        f = Future()
        self._q.put((f, fn, args, kwargs))
        return f

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            f, fn, args, kwargs = item
            if not f.set_running_or_notify_cancel():
                continue
            try:
                f.set_result(fn(*args, **kwargs))
            except BaseException as e:  # noqa: BLE001 — surface via future
                f.set_exception(e)

    def shutdown(self, wait=True, timeout=None):
        """Stop accepting work.  wait=True joins workers (bounded by
        `timeout` per thread — never hang exit on a wedged device call)."""
        self._shut = True
        for _ in self._threads:
            self._q.put(None)
        if wait:
            for t in self._threads:
                t.join(timeout=timeout)
