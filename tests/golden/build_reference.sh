#!/bin/bash
# Builds the reference fastplong binary out-of-tree (into $OUT, default
# /tmp/fastplong_ref) using the scalar shim headers, for golden-output tests.
# SIMD=1 builds a second binary (/tmp/fastplong_ref_simd) with the 16-lane
# GCC-vector-extension Highway shim and -march=native — the FAIR CPU anchor
# (tools/cpu_anchor.py); outputs are bit-identical either way.
# The reference sources are never copied into this repository.
set -e
REF=${REF:-/root/reference}
SHIM_BASE="$(cd "$(dirname "$0")" && pwd)"
if [ "${SIMD:-0}" = "1" ]; then
    OUT=${OUT:-/tmp/fastplong_ref_simd}
    INC="-I$SHIM_BASE/shim_simd -I$SHIM_BASE/shim"
    ARCH="-march=native"
    STAMP="$SHIM_BASE/shim_simd/hwy/highway.h"
else
    OUT=${OUT:-/tmp/fastplong_ref}
    INC="-I$SHIM_BASE/shim"
    ARCH=""
    STAMP="$SHIM_BASE/shim/hwy/highway.h"
fi

mkdir -p "$OUT/obj"
if [ -x "$OUT/fastplong" ] && [ "$OUT/fastplong" -nt "$STAMP" ]; then
    exit 0
fi

CXX=${CXX:-g++}
FLAGS="-std=c++14 -pthread -O2 $ARCH $INC -I$REF/src"

for src in "$REF"/src/*.cpp; do
    obj="$OUT/obj/$(basename "${src%.cpp}").o"
    if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ] || [ "$STAMP" -nt "$obj" ]; then
        $CXX -c "$src" -o "$obj" $FLAGS &
    fi
done
wait
$CXX "$OUT"/obj/*.o -o "$OUT/fastplong" -ldeflate -lz -lpthread
echo "built $OUT/fastplong"
