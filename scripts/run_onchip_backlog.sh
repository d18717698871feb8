#!/bin/bash
# r4 on-chip backlog runner. Fire this the moment the axon tunnel is back:
#   bash scripts/run_onchip_backlog.sh [outdir]
# Runs each backlog item with its own timeout, logging to $outdir; a hung
# tunnel kills one item, not the batch. Items are ordered by value: the
# bench number of record first, then the new-in-r4 measurements.
# NEVER launch these with PYTHONPATH=/root/repo (kills the axon plugin —
# CLAUDE.md); every script sys.path-inserts /root/repo itself.
set -u
cd /root/repo
OUT=${1:-/root/repo/onchip_r4}
mkdir -p "$OUT"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc  (tail below)"; tail -3 "$OUT/$name.log"
}

# 1. bench of record (the driver reruns it too; this warms caches + proves it)
run bench           2400 python bench.py

# 2. SFT step-time number of record (VERDICT r3 #4)
run sft_step        2400 python scripts/profile_sft_step.py

# 3. ragged MoE decode latency at judge shapes (VERDICT r3 Missing #2 evidence)
run moe_ragged      1800 python scripts/profile_moe_ragged.py

# 3b. GMM MoE prefill latency (exact vs einsum cf=0/cf=1.25 at judge shape)
run moe_gmm         1800 python scripts/profile_moe_gmm.py

# 3c. GMM fwd+bwd Mosaic compile smoke (grad parity vs einsum on chip)
run moe_gmm_bwd     1800 python scripts/smoke_gmm_bwd.py

# 4. GRPO rollouts/hr with spec sampling (r3 backlog headline candidate)
run rollout_spec    3600 python scripts/profile_rollout_spec.py

# 5. spec decode batch endpoints + continuous-engine spec (paged spec /
#    multi-query paged kernel compiles inside the continuous run)
run spec_batch      2400 python scripts/profile_spec_decode.py
run spec_continuous 2400 python scripts/profile_continuous_spec.py

# 6. warm-video-cache eval throughput (VERDICT r3 Missing #3 validation):
#    run twice with the cache on — the second pass skips host decode
run eval_warmcache  3600 env VR2_VIDEO_CACHE=/tmp/vr2cache python scripts/profile_eval.py 32
run eval_warmcache2 3600 env VR2_VIDEO_CACHE=/tmp/vr2cache python scripts/profile_eval.py 32

# 7. ViT remat-segment sweep (depth-32 backward workaround evidence)
run remat_segment   2400 python scripts/profile_vit_remat_segment.py

# 8. Qwen3-Next hybrid judge (r4 late): chunked delta rule + recurrent
#    decode compile/run on the chip, int8 1/6-depth 80B-A3B slice
run qwen3_next      2400 python scripts/profile_qwen3_next.py

echo "=== done; logs in $OUT ==="
grep -H . "$OUT"/*.log | grep -iE "json|tok/s|ms/step|samples/s|rollouts" | tail -30
