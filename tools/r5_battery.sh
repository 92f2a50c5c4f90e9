#!/usr/bin/env bash
# Round-5 on-chip evidence battery (VERDICT r4 asks #1-#8).
# Order matters on the 1-CPU host: stages run strictly serialized.
#   vpu       full VPU ladder, resumable, with the committed floor gate
#   mla       paged kernel with auto-picked pages_per_step (ask #3)
#   fp8decode fp8 decode duel incl. the bit-surgery decode (ask #4)
#   int4      int4/int8 certification at 15 draws (ask #5a)
#   resident  3 interleaved sessions -> median paired ratio (ask #5b)
#   mlp       Llama-MLP decomposition duel (ask #6)
#   benchall  end-to-end refresh so docs postdate kernels (ask #7)
#   hwsweep   full correctness sweep
#   mosaic    CPU-side lowering self-test (no chip)
# Usage: bash tools/r5_battery.sh [stage...]
set -u -o pipefail
mkdir -p logs
cd "$(dirname "$0")/.."

FAILED=""

run() {
  name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  timeout "${STAGE_TIMEOUT:-4000}" "$@" 2>&1 | tee "logs/r5_${name}.log"
  rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc ==="
  if [ "$rc" -ne 0 ]; then FAILED="$FAILED $name($rc)"; fi
}

stages="${*:-vpu mla fp8decode int4 resident benchall hwsweep}"

for s in $stages; do
  case "$s" in
    # no --resume: the floor gate must re-MEASURE to detect a regression
    # (a resumed run asserts against the committed artifact's own numbers)
    vpu)       run vpu python -u tools/vpu_ladder.py --assert-floor \
                   --out VPU_LADDER.json ;;
    mla)       run mla python -u tools/bench_mla.py ;;
    fp8decode) run fp8decode python -u tools/measure_fp8_decode.py --draws 7 ;;
    int4)      run int4 python -u tools/diagnose_int4.py --draws 15 ;;
    resident)  run resident python -u tools/ablate_resident.py --check --sessions 3 ;;
    mlp)       run mlp python -u tools/duel_mlp_split.py ;;
    sweep)     run sweep python -u tools/gemm_sweep.py --plot ;;
    benchall)  run benchall python -u tools/bench_all.py ;;
    hwsweep)   run hwsweep python -u tools/hw_sweep.py ;;
    mosaic)    run mosaic python -u tools/lower_sweep.py --mosaic --selftest ;;
    *) echo "unknown stage $s" ;;
  esac
done

if [ -n "$FAILED" ]; then
  echo "=== BATTERY FAILED stages:$FAILED ==="
  exit 1
fi
echo "=== BATTERY OK ==="
