#!/bin/bash
# r5 follow-up on-chip items (run AFTER run_onchip_backlog_r5.sh):
#   - profile_qwen3_next.py re-run: the first-ever run hit the Mosaic
#     (1, N) scale-block rejection in the int8 ragged/GMM kernels; fixed
#     ([E, 1, N] scales) — this validates the fix on real Mosaic.
#   - profile_sft_step.py re-run: the LoRA step no longer bakes the base
#     into the executable (jit argument) — compile time should collapse
#     from 603 s and the captured-constants warning disappear.
set -u
cd /root/repo
OUT=${1:-/root/repo/onchip_r5}
mkdir -p "$OUT"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc  (tail below)"; tail -3 "$OUT/$name.log"
}

run qwen3_next_fixed 3600 python scripts/profile_qwen3_next.py
run sft_step         3600 python scripts/profile_sft_step.py

echo "=== follow-up done; logs in $OUT ==="
