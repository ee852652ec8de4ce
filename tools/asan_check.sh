#!/bin/bash
# Run the native C library (fastplong_tpu/native/host_io.cpp) under
# AddressSanitizer: the dedicated jax-free fuzz of every native entry
# point (tests/test_native_fuzz.py — adversarial parse/pack/emit/gzip/
# statRead inputs vs Python oracles) plus the I/O unit suite, which
# exercises the library through its real callers.  The instrumented
# build is swapped in via FASTPLONG_NATIVE_SO
# (fastplong_tpu/native/__init__.py).
#
# Suites that LOWER jitted code (golden end-to-end, stats-layout,
# host-stats equivalence) can NOT run under whole-process ASan: jaxlib's
# MLIR bindings throw C++ exceptions during lowering, which trips an
# ASan interceptor CHECK ("real___cxa_throw != 0", an upstream
# ASan-vs-jaxlib incompatibility).  The fuzz file exists precisely to
# give ASan full native coverage without jax lowering in the process.
#
# Usage: tools/asan_check.sh [extra pytest args]
set -euo pipefail
cd "$(dirname "$0")/.."

ASAN_SO=/tmp/libfplhost_asan.so
g++ -O1 -g -fsanitize=address -fno-omit-frame-pointer -shared -fPIC \
    fastplong_tpu/native/host_io.cpp -o "$ASAN_SO" -ldeflate

LIBASAN=$(g++ -print-file-name=libasan.so)

# leak detection off: the long-lived owner of most allocations is the
# Python process itself (interpreter, numpy, jax) — we are after buffer
# overflows / use-after-free in host_io.cpp, which halt_on_error=1 turns
# into a hard test failure
# preflight: the fuzz suite skips itself when the library fails to load
# (so the normal suite degrades gracefully) — here a load failure must be
# a hard error, not a silently-green skipped run
LD_PRELOAD="$LIBASAN" FASTPLONG_NATIVE_SO="$ASAN_SO" \
ASAN_OPTIONS=detect_leaks=0 \
python -c "from fastplong_tpu import native; \
assert native.get_lib() is not None, 'ASan .so failed to load'"

LD_PRELOAD="$LIBASAN" \
ASAN_OPTIONS=detect_leaks=0:halt_on_error=1 \
FASTPLONG_NATIVE_SO="$ASAN_SO" \
python -m pytest \
    tests/test_native_fuzz.py tests/test_io.py \
    -q "$@"

# Second pass: UndefinedBehaviorSanitizer (signed overflow, misaligned or
# out-of-range accesses ASan doesn't model).  UBSan's runtime links into
# the .so directly — no preload needed, so the whole suite could run; we
# keep the same fast file set for a quick gate.
UBSAN_SO=/tmp/libfplhost_ubsan.so
g++ -O1 -g -fsanitize=undefined -fno-sanitize-recover=all -shared -fPIC \
    fastplong_tpu/native/host_io.cpp -o "$UBSAN_SO" -ldeflate

FASTPLONG_NATIVE_SO="$UBSAN_SO" \
python -c "from fastplong_tpu import native; \
assert native.get_lib() is not None, 'UBSan .so failed to load'"

FASTPLONG_NATIVE_SO="$UBSAN_SO" \
python -m pytest \
    tests/test_native_fuzz.py tests/test_io.py \
    -q "$@"
