#!/bin/bash
# r5 on-chip backlog runner — VERDICT r4 #1 priority order.
#   bash scripts/run_onchip_backlog_r5.sh [outdir]
# Each item gets its own timeout so a hung tunnel kills one item, not the
# batch. NEVER launch with PYTHONPATH=/root/repo (kills the axon plugin —
# CLAUDE.md); every script sys.path-inserts /root/repo itself.
# sft_step is NOT here: it reruns separately after the LoRA jit-arg fix
# (VERDICT r4 #3) so the log shows the fixed compile time.
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

# 0. bench of record first (short; warms caches + proves the tunnel)
run bench           2400 python bench.py

# 1. GMM fwd+bwd Mosaic compile smoke — highest-risk unproven kernel
run moe_gmm_bwd     1800 python scripts/smoke_gmm_bwd.py

# 2. ragged MoE decode + GMM prefill latency at judge shapes
run moe_ragged      1800 python scripts/profile_moe_ragged.py
run moe_gmm         1800 python scripts/profile_moe_gmm.py

# 3. Qwen3-Next hybrid judge: first-ever on-chip execution
run qwen3_next      2400 python scripts/profile_qwen3_next.py

# 4. warm-video-cache eval throughput (x2: second pass skips host decode)
run eval_warmcache  3600 env VR2_VIDEO_CACHE=/tmp/vr2cache python scripts/profile_eval.py 32
run eval_warmcache2 3600 env VR2_VIDEO_CACHE=/tmp/vr2cache python scripts/profile_eval.py 32

# 5. GRPO rollouts/hr with spec sampling (two-round-old headline candidate)
run rollout_spec    3600 python scripts/profile_rollout_spec.py

# 6. spec decode batch + continuous re-profiles
run spec_batch      2400 python scripts/profile_spec_decode.py
run spec_continuous 2400 python scripts/profile_continuous_spec.py

# 7. ViT remat-segment sweep (depth-32 backward workaround evidence)
run remat_segment   2400 python scripts/profile_vit_remat_segment.py

echo "=== done; logs in $OUT ==="
grep -H . "$OUT"/*.log | grep -iE "json|tok/s|ms/step|samples/s|rollouts" | tail -40
