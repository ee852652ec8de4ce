#!/bin/bash
# Builds the reference fastplong binary out-of-tree (into $OUT, default
# /tmp/fastplong_ref) using the scalar shim headers, for golden-output tests.
# The reference sources are never copied into this repository.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/fastplong_ref}
SHIM="$(cd "$(dirname "$0")/shim" && pwd)"

mkdir -p "$OUT/obj"
if [ -x "$OUT/fastplong" ] && [ "$OUT/fastplong" -nt "$SHIM/hwy/highway.h" ]; then
    exit 0
fi

CXX=${CXX:-g++}
FLAGS="-std=c++14 -pthread -O2 -I$SHIM -I$REF/src"

for src in "$REF"/src/*.cpp; do
    obj="$OUT/obj/$(basename "${src%.cpp}").o"
    if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ] || [ "$SHIM/hwy/highway.h" -nt "$obj" ]; then
        $CXX -c "$src" -o "$obj" $FLAGS &
    fi
done
wait
$CXX "$OUT"/obj/*.o -o "$OUT/fastplong" -ldeflate -lz -lpthread
echo "built $OUT/fastplong"
