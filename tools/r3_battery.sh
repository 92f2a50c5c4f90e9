#!/usr/bin/env bash
# Round-3 on-chip evidence battery (VERDICT r2 #2/#3/#5/#6/#7/#10).
# Run serially once the axon tunnel is healthy; each stage logs to logs/.
# Usage: bash tools/r3_battery.sh [stage...]   (default: all stages in order)
set -u
mkdir -p logs
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  timeout "${STAGE_TIMEOUT:-3000}" "$@" 2>&1 | tee "logs/r3_${name}.log"
  echo "=== [$name] exit=$? ==="
}

stages="${*:-fp8verify sweep resident d64 int4 mla hwsweep fuzz}"

for s in $stages; do
  case "$s" in
    fp8verify) run fp8verify python -u tools/verify_fp8_rungs.py ;;
    sweep)     run sweep python -u tools/gemm_sweep.py --plot ;;
    resident)  run resident python -u tools/ablate_resident.py --check ;;
    d64)       run d64 python -u tools/ablate_attn_d64.py ;;
    int4)      run int4 python -u tools/diagnose_int4.py ;;
    mla)       run mla python -u tools/bench_mla.py ;;
    hwsweep)   run hwsweep python -u tools/hw_sweep.py ;;
    fuzz)      run fuzz python -u tools/fuzz_decode.py --iters 30 ;;
    benchall)  run benchall python -u tools/bench_all.py ;;
    *) echo "unknown stage $s" ;;
  esac
done
