#!/usr/bin/env bash
# One-command gate runner (VERDICT r03 #8): full suite + slow gates +
# accuracy artifacts refreshed. Run BEFORE any round-close snapshot.
#
#   scripts/run_gates.sh            # suite + 600 s slow gates + CPU accuracy (60/600 s)
#   RUN_HOUR=1 scripts/run_gates.sh # also the 3600 s hour gates + full CPU table
#   RUN_CHIP=1 scripts/run_gates.sh # also the on-chip accuracy table (needs the TPU)
#
# Artifacts refreshed: ACCURACY_CPU_r04.json (+ ACCURACY_CHIP_r04.json and
# the merged ACCURACY_r04.json when RUN_CHIP=1).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== full test suite (8-device virtual CPU mesh) =="
python -m pytest tests/ -q

echo "== 600 s slow gates =="
PVOC_SLOW_TESTS=1 timeout 3000 python -m pytest tests/test_longform.py -q

CPU_LENGTHS="60,600"
if [[ "${RUN_HOUR:-0}" == "1" ]]; then
  echo "== 3600 s hour gates =="
  PVOC_HOUR_TESTS=1 timeout 7000 python -m pytest tests/test_longform.py -q -k hour
  CPU_LENGTHS="60,600,3600"
fi

echo "== CPU-mesh accuracy artifact (${CPU_LENGTHS} s) =="
PVOC_PLATFORM=cpu JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  timeout 7000 python scripts/accuracy_r04.py --mode cpu --lengths "$CPU_LENGTHS"

if [[ "${RUN_CHIP:-0}" == "1" ]]; then
  echo "== on-chip accuracy artifact =="
  timeout 7000 python scripts/accuracy_r04.py --mode chip --lengths "$CPU_LENGTHS"
  python scripts/accuracy_r04.py --mode merge
fi

echo "ALL GATES GREEN"
