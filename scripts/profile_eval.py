"""Eval-throughput profile on the real chip: 7B int8, 16 frames, B=16
(VERDICT r1 #9 — target >= 1.5 samples/sec with a phase breakdown).

Synthesizes mp4s once into /tmp, then times EngineBackend.generate_until
end-to-end (host decode + ViT + prefill + decode + detokenize) for the
batch and paged engine modes. Host preprocessing pipelines with device
compute via PrefetchLoader, so the phase breakdown reports wall time plus
cumulative per-phase device/host timers.

Usage: python scripts/profile_eval.py [n_samples]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NFRAMES = 16
BATCH = 16
MNT = 128

# --- synth videos (one-time, reused across runs) -------------------------
import cv2

vids = []
rng = np.random.default_rng(0)
for i in range(8):
    path = f"/tmp/evalprof_{i}.mp4"
    vids.append(path)
    if os.path.exists(path):
        continue
    h, w = [(360, 640), (480, 854), (720, 1280), (404, 720)][i % 4]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (w, h))
    base = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    for f in range(256):
        frame = np.roll(base, f * 7, axis=1)
        vw.write(frame)
    vw.release()
print("videos ready", flush=True)

from video_r2_tpu.engine.chat import ByteTokenizer
from video_r2_tpu.evalharness.api import Instance
from video_r2_tpu.evalharness.engine_backend import EngineBackend
from video_r2_tpu.models.config import qwen25vl_7b
from video_r2_tpu.models.quant import init_params_quantized_zeros

cfg = qwen25vl_7b()
t0 = time.time()
params = init_params_quantized_zeros(cfg, bits=8)
import jax
jax.block_until_ready(params)
print(f"7B int8 zeros params on {jax.devices()[0].platform} "
      f"({time.time()-t0:.1f}s)", flush=True)

instances = [
    Instance(doc_id=i, doc={}, text=(
        f"Question {i}: what pattern moves across the frames? "
        "Answer with a detailed description."),
        visuals=[vids[i % len(vids)]],
        gen_kwargs={"max_new_tokens": MNT, "temperature": 0.0})
    for i in range(N)
]

for mode, extra in (("batch", {}), ("paged", {}),
                    ("batch", {"window_divisible": True,
                               "vit_act_quant": "int8",
                               "patch_dtype": "float16"}),
                    ("paged", {"window_divisible": True,
                               "vit_act_quant": "int8",
                               "patch_dtype": "float16"})):
    backend = EngineBackend(
        params, cfg, ByteTokenizer(), max_num_frames=NFRAMES,
        batch_size=BATCH, act_quant="int8", kv_quant="int8",
        attn_impl="flash", engine_mode=mode, engine_max_len=4096, **extra)
    # warm-up: compile prefill/decode/ViT at the eval shapes
    t0 = time.time()
    backend.generate_until(instances[:BATCH])
    warm = time.time() - t0
    t0 = time.time()
    outs = backend.generate_until(instances)
    wall = time.time() - t0
    print(f"mode={mode} {extra}: N={N} wall={wall:.1f}s "
          f"-> {N / wall:.2f} samples/sec (warm-up pass {warm:.1f}s)",
          flush=True)
    assert len(outs) == N
