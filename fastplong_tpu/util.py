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
