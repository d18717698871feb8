#!/bin/bash
# r6 on-chip backlog runner. r5 burned the historical backlog to zero
# (onchip_r5/); what remains is forward-looking. Each item gets its own
# timeout; NEVER launch with PYTHONPATH=/root/repo (kills the axon
# plugin, CLAUDE.md).
set -u
cd /root/repo
OUT=${1:-/root/repo/onchip_r6}
mkdir -p "$OUT"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc  (tail below)"; tail -3 "$OUT/$name.log"
}

# 0. bench of record (short; proves the tunnel)
run bench            2400 python bench.py

# 1. Qwen3-Next slot-continuous serving re-profile (r5 numbers: plain
#    175 tok/s, spec k=8 w4 877 tok/s on the 1/6-depth slice)
run next_continuous  3600 python scripts/profile_next_continuous.py

# 2. Next serving-quant + spec rows
run qwen3_next       3600 python scripts/profile_qwen3_next.py

# 3. paged spec smoke (multi-query kernel, bf16 + int8 pages)
run paged_spec       2400 python scripts/smoke_paged_spec.py

# 4. LAST (crashes the TPU worker — it recovers in ~1 min, but do not
#    run before anything that needs the chip): the GMM-decode kernel
#    fault repro (CLAUDE.md r5: scan-context-specific; isolated kernels
#    pass at every block_rows). Root-cause before cfg.moe_gmm_decode
#    defaults on — batched judge decode saturates ~850 tok/s on the
#    einsum path without it.
run gmm_decode_fault 1800 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from video_r2_tpu.engine.sampling import SamplingParams
from video_r2_tpu.models.qwen3_next import (Qwen3NextConfig, generate_packed,
    init_qwen3_next_params, quantize_qwen3_next_params)
cfg = Qwen3NextConfig(num_hidden_layers=8, num_experts=64, dtype="bfloat16",
                      moe_gmm_decode=True)
params = quantize_qwen3_next_params(
    init_qwen3_next_params(cfg, method="zeros"), consume=True)
rng = np.random.default_rng(0)
ids = rng.integers(2, 1000, (64, 512))
lens = np.full((64,), 512, np.int32)
sp = SamplingParams(max_new_tokens=32, eos_token_ids=())
out = generate_packed(params, cfg, ids, lens, sp)
print("gmm-decode B=64 survived:", out.sequences.shape)
EOF

echo "=== done; logs in $OUT ==="
