#!/usr/bin/env bash
# Round-4 on-chip evidence battery (VERDICT r3 asks #1-#5, #7, #9).
# Stages are grouped so config changes can land between groups:
#   A: tune_rows resident mosaic mla   (data-gathering; picker update follows)
#   B: sweep vpu fuzz benchall         (after pick_matmul_config is updated)
# Usage: bash tools/r4_battery.sh [stage...]
set -u
mkdir -p logs
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  timeout "${STAGE_TIMEOUT:-4000}" "$@" 2>&1 | tee "logs/r4_${name}.log"
  echo "=== [$name] exit=$? ==="
}

stages="${*:-tune_rows resident mosaic mla}"

for s in $stages; do
  case "$s" in
    fp8verify) run fp8verify python -u tools/verify_fp8_rungs.py ;;
    tune_rows) run tune_rows python -u tools/tune_gemm_rows.py ;;
    resident)  run resident python -u tools/ablate_resident.py --check ;;
    mosaic)    run mosaic python -u tools/lower_sweep.py --mosaic --selftest ;;
    mla)       run mla python -u tools/bench_mla.py ;;
    int4)      run int4 python -u tools/diagnose_int4.py --draws 7 ;;
    sweep)     run sweep python -u tools/gemm_sweep.py --plot ;;
    vpu)       run vpu python -u tools/vpu_ladder.py ;;
    hwsweep)   run hwsweep python -u tools/hw_sweep.py ;;
    fuzz)      run fuzz python -u tools/fuzz_decode.py --iters 30 ;;
    benchall)  run benchall python -u tools/bench_all.py ;;
    *) echo "unknown stage $s" ;;
  esac
done
