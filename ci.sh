#!/usr/bin/env bash
# CI gate — the per-change check this repo runs, mirroring the
# reference's per-PR workflow (reference .github/workflows/ci.yml:8-36:
# build + unit tests + a --version smoke run).  One command, exits
# non-zero on any failure:
#
#   ./ci.sh           fast tier (golden build + unit/golden tests + smoke)
#   ./ci.sh --slow    adds the slow tier (monster reads, 640bp+ adapter
#                     goldens, multi-process jax.distributed)
#
# Tests run on the virtual 8-device CPU mesh (tests/conftest.py), so no
# accelerator is required.  The golden suite builds and runs the actual
# reference binary (tests/golden/build_reference.sh) — byte parity IS the
# acceptance test.
set -euo pipefail
cd "$(dirname "$0")"

echo "== native library build =="
python - <<'EOF'
from fastplong_tpu.native import get_lib
lib = get_lib()
assert lib is not None, "native host library failed to build"
print("native host library OK")
EOF

echo "== reference binary (golden-parity oracle) =="
bash tests/golden/build_reference.sh >/dev/null
/tmp/fastplong_ref/fastplong --version

echo "== smoke: CLI --version =="
python -m fastplong_tpu.main --version

echo "== test suite =="
if [ "${1:-}" = "--slow" ]; then
    FASTPLONG_SLOW=1 python -m pytest tests/ -q
else
    python -m pytest tests/ -q
fi

echo "CI PASS"
