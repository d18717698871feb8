"""On-chip ViT profile at the 128-frame eval shape, with/without
window-divisible resize bucketing (VERDICT r1 #8).

Builds ONLY the vision tower params (zeros, ~1.3 GB bf16) so the 7B decoder
never touches HBM. Timing via jitted scalar reduction (CLAUDE.md tunnel
quirk).

Usage: python scripts/profile_vit.py  (runs on the real chip)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from video_r2_tpu.models.config import qwen25vl_7b
from video_r2_tpu.models.vision import plan_vision_layout, vit_forward
from video_r2_tpu.video.geometry import plan_video_geometry

v = qwen25vl_7b().vision
dt = jnp.bfloat16


def zeros(*shape):
    return jnp.zeros(shape, dtype=dt)


def ones(*shape):
    return jnp.ones(shape, dtype=dt)


D, I_, nh = v.hidden_size, v.intermediate_size, v.num_heads
visual = {
    "patch_embed": {"kernel": zeros(v.patch_input_dim, D)},
    "blocks": {
        "norm1": {"scale": ones(v.depth, D)},
        "norm2": {"scale": ones(v.depth, D)},
        "attn": {
            "qkv": {"kernel": zeros(v.depth, D, 3 * D), "bias": zeros(v.depth, 3 * D)},
            "proj": {"kernel": zeros(v.depth, D, D), "bias": zeros(v.depth, D)},
        },
        "mlp": {
            "gate": {"kernel": zeros(v.depth, D, I_), "bias": zeros(v.depth, I_)},
            "up": {"kernel": zeros(v.depth, D, I_), "bias": zeros(v.depth, I_)},
            "down": {"kernel": zeros(v.depth, I_, D), "bias": zeros(v.depth, D)},
        },
    },
    "merger": {
        "ln_q": {"scale": ones(D)},
        "fc1": {"kernel": zeros(4 * D, 4 * D), "bias": zeros(4 * D)},
        "fc2": {"kernel": zeros(4 * D, v.out_hidden_size), "bias": zeros(v.out_hidden_size)},
    },
}
jax.block_until_ready(visual)
print(f"tower params on {jax.devices()[0].platform}")

for tag, wd in (("reference-resize", False), ("window-divisible", True)):
    ele = {"video": "x", "nframes": 128}
    if wd:
        ele["window_divisible"] = True
    geo = plan_video_geometry(ele, total_frames=3000, video_fps=30.0,
                              native_height=720, native_width=1280)
    thw = geo.grid_thw
    t0 = time.time()
    layout = plan_vision_layout([thw], v)
    plan_s = time.time() - t0
    n_real = layout.seq_len_real
    s_pad = layout.s_pad
    patches = jnp.zeros((n_real, v.patch_input_dim), dtype=jnp.float32)

    t0 = time.time()
    out = vit_forward(visual, v, patches, layout)
    val = float(jnp.sum(out.astype(jnp.float32)))
    compile_s = time.time() - t0

    times = []
    for _ in range(5):
        t0 = time.time()
        out = vit_forward(visual, v, patches, layout)
        val = float(jnp.sum(out.astype(jnp.float32)))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{tag}: resize {geo.resized_height}x{geo.resized_width} "
          f"grid {thw} real={n_real} pad={s_pad} ({s_pad/n_real:.2f}x) "
          f"plan={plan_s:.1f}s compile={compile_s:.1f}s "
          f"fwd={best*1000:.0f}ms (runs: {[f'{t*1000:.0f}' for t in times]}) "
          f"sum={val}")
