"""GRPO rollout throughput on the real chip: batch vs paged backend.

Config mirrors the r1 measurement (README): 3B int8 policy, 8-frame video
prompts, G=8 rollouts x 256 completion tokens per prompt, flash prefill.

Usage: python scripts/profile_grpo_rollouts.py [n_prompts_per_cycle]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

NP = int(sys.argv[1]) if len(sys.argv) > 1 else 2
G = 8
C = 256

import cv2

vids = []
rng = np.random.default_rng(0)
for i in range(4):
    path = f"/tmp/grporoll_{i}.mp4"
    vids.append(path)
    if os.path.exists(path):
        continue
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (640, 360))
    base = rng.integers(0, 255, size=(360, 640, 3), dtype=np.uint8)
    for f in range(80):
        vw.write(np.roll(base, f * 11, axis=1))
    vw.release()

import jax

from video_r2_tpu.engine.chat import ByteTokenizer
from video_r2_tpu.models.config import qwen25vl_3b
from video_r2_tpu.models.quant import init_params_quantized_zeros
from video_r2_tpu.train.grpo import GRPOConfig
from video_r2_tpu.train.grpo_runner import GRPORunner

cfg = qwen25vl_3b()
params = init_params_quantized_zeros(cfg, bits=8)
jax.block_until_ready(params)
print(f"3B int8 params on {jax.devices()[0].platform}", flush=True)

samples = [{
    "prompt": [{"role": "user", "content": [
        {"type": "video", "video": vids[i % len(vids)], "max_frames": 8,
         "max_pixels": 151200, "min_pixels": 100352},
        {"type": "text", "text": f"Describe clip {i} in detail."}]}],
    "assistant": "a moving pattern",
} for i in range(NP)]

for backend, steps in (("batch", 8), ("paged", 8), ("paged", 32)):
    gcfg = GRPOConfig(num_generations=G, max_completion_length=C,
                      temperature=1.0, rollout_backend=backend, beta=0.0,
                      rollout_decode_steps=steps)
    runner = GRPORunner(params, cfg, gcfg, ByteTokenizer(),
                        reward_funcs=[lambda completions, **kw:
                                      [0.0] * len(completions)],
                        reward_func_names=["zero"], step_fn=None,
                        attn_impl="flash", act_quant="int8", kv_quant="int8")
    t0 = time.time()
    runner.rollout_and_score(samples)   # warm-up (compiles)
    warm = time.time() - t0
    t0 = time.time()
    n_cycles = 3
    for _ in range(n_cycles):
        runner.rollout_and_score(samples)
    dt = time.time() - t0
    per_hr = n_cycles * NP * G / dt * 3600
    tag = backend if backend == "batch" else f"{backend} steps={steps}"
    print(f"backend={tag}: {dt/n_cycles:.1f}s/cycle ({NP}x{G} rollouts "
          f"x {C} tok) -> {per_hr:.0f} rollouts/hr (warm-up {warm:.0f}s)",
          flush=True)
