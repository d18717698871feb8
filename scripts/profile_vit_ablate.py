"""Ablate the ViT forward at the eval shape: which piece costs what.

Variants: full tower / all-windowed (no full-attn layers) / fewer layers
(slope) / matmul-only blocks (no attention). Eval pixel budget
(max_pixels=151200) to match EngineBackend defaults.
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from video_r2_tpu.models.config import qwen25vl_7b
from video_r2_tpu.models.vision import plan_vision_layout, vit_forward
from video_r2_tpu.video.geometry import plan_video_geometry

V = qwen25vl_7b().vision
dt = jnp.bfloat16
NFRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MAXPX = 151200
MINPX = 100352


def tower(depth, v):
    def zeros(*shape):
        return jnp.zeros(shape, dtype=dt)

    def ones(*shape):
        return jnp.ones(shape, dtype=dt)

    D, I_ = v.hidden_size, v.intermediate_size
    return {
        "patch_embed": {"kernel": zeros(v.patch_input_dim, D)},
        "blocks": {
            "norm1": {"scale": ones(depth, D)},
            "norm2": {"scale": ones(depth, D)},
            "attn": {
                "qkv": {"kernel": zeros(depth, D, 3 * D), "bias": zeros(depth, 3 * D)},
                "proj": {"kernel": zeros(depth, D, D), "bias": zeros(depth, D)},
            },
            "mlp": {
                "gate": {"kernel": zeros(depth, D, I_), "bias": zeros(depth, I_)},
                "up": {"kernel": zeros(depth, D, I_), "bias": zeros(depth, I_)},
                "down": {"kernel": zeros(depth, I_, D), "bias": zeros(depth, D)},
            },
        },
        "merger": {
            "ln_q": {"scale": ones(D)},
            "fc1": {"kernel": zeros(4 * D, 4 * D), "bias": zeros(4 * D)},
            "fc2": {"kernel": zeros(4 * D, v.out_hidden_size), "bias": zeros(v.out_hidden_size)},
        },
    }


ele = {"video": "x", "nframes": NFRAMES, "max_pixels": MAXPX,
       "min_pixels": MINPX}
geo = plan_video_geometry(ele, total_frames=3000, video_fps=30.0,
                          native_height=480, native_width=854)
thw = geo.grid_thw
layout = plan_vision_layout([thw], V)
print(f"shape: resize {geo.resized_height}x{geo.resized_width} grid {thw} "
      f"real={layout.seq_len_real} pad={layout.s_pad} "
      f"({layout.s_pad/layout.seq_len_real:.2f}x)", flush=True)
patches = jnp.zeros((layout.seq_len_real, V.patch_input_dim), dtype=jnp.float32)


def run(tag, v):
    p = tower(v.depth, v)
    jax.block_until_ready(p)
    t0 = time.time()
    out = vit_forward(p, v, patches, layout)
    float(jnp.sum(out.astype(jnp.float32)))
    comp = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = vit_forward(p, v, patches, layout)
        float(jnp.sum(out.astype(jnp.float32)))
        times.append(time.time() - t0)
    print(f"{tag}: fwd={min(times)*1000:.0f}ms compile={comp:.0f}s", flush=True)
    del p


run("full-32L", V)
run("windowed-32L", dataclasses.replace(V, fullatt_block_indexes=()))
run("windowed-8L", dataclasses.replace(V, depth=8, fullatt_block_indexes=()))
run("fullattn-8L", dataclasses.replace(
    V, depth=8, fullatt_block_indexes=(0, 1, 2, 3, 4, 5, 6, 7)))
