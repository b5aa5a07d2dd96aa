#!/bin/bash
# Round-5 measurement day: run the full relay-gated backlog SERIALLY on one
# healthy relay instance (exec A/Bs are instance-stable to ~3% — CLAUDE.md).
# Each step is timeout-bounded and failure-isolated; logs under
# docs/measurements/r5/.  Run only after a probe shows RELAY_OK, with no
# other host-CPU-heavy job running (the box has one core).
#
# Usage: bash scripts/measure_all.sh [steps...]   (default: all)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
OUT=docs/measurements/r5
mkdir -p "$OUT"
STEPS="${*:-bench width clamp fused warm}"

run_step() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$OUT/driver.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc $(date -u +%H:%M:%S) ===" | tee -a "$OUT/driver.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/driver.log"
}

for s in $STEPS; do
  case "$s" in
    bench)
      # Full production capture (headline + chain + serving + sweep + phases).
      run_step bench 3600 python -u bench.py
      # Save the final (most complete) JSON line as the round-5 self-capture.
      last=$(grep -E '^\{' "$OUT/bench.log" | tail -1)
      if [ -n "$last" ]; then
        echo "$last" > docs/selfcaptures/bench_2026-08-18_r5.json
        echo "selfcapture saved" | tee -a "$OUT/driver.log"
      fi ;;
    width)
      run_step width 3600 python -u scripts/chunk_width_study.py --chunks_per_width 2 --widths 32,48,64 ;;
    clamp)
      run_step clamp 2400 python -u scripts/diag_infer_clamp.py --configs 32 --repeat 2 ;;
    fused)
      run_step fused 3600 python -u scripts/diag_fused_dec.py --configs 32 --repeat 2 ;;
    warm)
      run_step warm 3600 python -u scripts/diag_warm_start.py --configs 32 --cap 50 --repeat 2 ;;
    *) echo "unknown step $s" ;;
  esac
done
echo "ALL DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/driver.log"
