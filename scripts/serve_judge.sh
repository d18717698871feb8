#!/usr/bin/env bash
# Judge serving launch (train/serve_llm/serve_qwen3.sh parity, TPU-native).
#
# The reference serves its judge (Qwen3-Next-80B-A3B, sparse MoE) by
# shelling out to vLLM at --tensor-parallel-size 4; this serves the same
# model CLASS on our own engine: paged continuous batching (the vLLM
# serving core), automatic prefix caching (judge calls repeat the same
# system+rubric prefix), n-gram speculative decoding (judge outputs quote
# the prompt), int8 KV pages, and — on a multi-chip mesh — tensor-parallel
# KV/pool sharding with expert-parallel MoE weights.
#
# Usage:
#   MODEL_CKPT=/path/to/hf_checkpoint bash scripts/serve_judge.sh
# Env knobs:
#   HOST_PORT (8011)  TP (4)  EP (1)  MAX_LEN (32768)  SPEC (8)
set -euo pipefail

MODEL_CKPT="${MODEL_CKPT:?set MODEL_CKPT to the judge HF checkpoint dir}"
HOST_PORT="${HOST_PORT:-8011}"
TP="${TP:-4}"           # serve_qwen3.sh:13 --tensor-parallel-size 4
EP="${EP:-1}"           # experts over "ep" (MoE judges)
MAX_LEN="${MAX_LEN:-32768}"   # serve_qwen3.sh:14 --max-model-len 32768
SPEC="${SPEC:-8}"       # n-gram speculative decode drafts per dispatch

python -m video_r2_tpu.apps.serve \
  --run.model_preset qwen3-moe-30b-a3b \
  --run.checkpoint "$MODEL_CKPT" \
  --run.weight_quant int8 \
  --run.tp "$TP" --run.ep "$EP" \
  --port "$HOST_PORT" \
  --paged \
  --max-len "$MAX_LEN" \
  --spec-decode "$SPEC" \
  --prefill-chunk 2048 \
  --decode-window 8
