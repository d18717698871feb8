"""Piecewise cost of one ViT layer at the eval shape (S=61440 padded rows).

Times an 8-layer scan of: (1) matmuls only, (2) + norms/rotary/residual,
(3) + window attention, (4) full block via _vision_block. Differences
attribute the per-layer cost.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from video_r2_tpu.models.config import qwen25vl_7b
from video_r2_tpu.models.layers import apply_rotary, linear, rms_norm, swiglu_mlp
from video_r2_tpu.models.vision import (_vision_rotary, _window_attention,
                                        plan_vision_layout)
from video_r2_tpu.video.geometry import plan_video_geometry

V = qwen25vl_7b().vision
dt = jnp.bfloat16
DEPTH = 8
ele = {"video": "x", "nframes": 128, "max_pixels": 151200,
       "min_pixels": 100352}
geo = plan_video_geometry(ele, total_frames=3000, video_fps=30.0,
                          native_height=480, native_width=854)
layout = plan_vision_layout([geo.grid_thw], V)
S = layout.s_pad
D, I_, nh, hd = V.hidden_size, V.intermediate_size, V.num_heads, V.head_dim
wp = layout.window_patches
print(f"S_pad={S} D={D} I={I_} nh={nh} hd={hd} wp={wp}", flush=True)

p = {
    "norm1": jnp.ones((DEPTH, D), dt), "norm2": jnp.ones((DEPTH, D), dt),
    "qkv_w": jnp.zeros((DEPTH, D, 3 * D), dt), "qkv_b": jnp.zeros((DEPTH, 3 * D), dt),
    "proj_w": jnp.zeros((DEPTH, D, D), dt), "proj_b": jnp.zeros((DEPTH, D), dt),
    "gate_w": jnp.zeros((DEPTH, D, I_), dt), "gate_b": jnp.zeros((DEPTH, I_), dt),
    "up_w": jnp.zeros((DEPTH, D, I_), dt), "up_b": jnp.zeros((DEPTH, I_), dt),
    "down_w": jnp.zeros((DEPTH, I_, D), dt), "down_b": jnp.zeros((DEPTH, D), dt),
}
x0 = jnp.zeros((S, D), dt)
valid = jnp.asarray(layout.valid)
pos_hw = jnp.asarray(layout.pos_hw)
cos, sin = _vision_rotary(pos_hw, hd, V.rope_theta)
scale = hd ** -0.5


def matmuls_only(p, x):
    def body(x, pl):
        qkv = x @ pl["qkv_w"] + pl["qkv_b"]
        a = qkv[:, :D] @ pl["proj_w"] + pl["proj_b"]
        h = x + a
        mlp = (jax.nn.silu(h @ pl["gate_w"] + pl["gate_b"])
               * (h @ pl["up_w"] + pl["up_b"])) @ pl["down_w"] + pl["down_b"]
        return h + mlp, None
    return jax.lax.scan(body, x, p)[0]


def with_norms(p, x):
    def body(x, pl):
        h = rms_norm(pl["norm1"], x, V.rms_norm_eps)
        qkv = (h @ pl["qkv_w"] + pl["qkv_b"]).reshape(S, 3, nh, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = apply_rotary(q, k, cos[:, None, :], sin[:, None, :])
        a = (q + k + v).reshape(S, nh * hd)  # stand-in for attention output
        x = x + (a @ pl["proj_w"] + pl["proj_b"])
        h = rms_norm(pl["norm2"], x, V.rms_norm_eps)
        mlp = (jax.nn.silu(h @ pl["gate_w"] + pl["gate_b"])
               * (h @ pl["up_w"] + pl["up_b"])) @ pl["down_w"] + pl["down_b"]
        return x + mlp, None
    return jax.lax.scan(body, x, p)[0]


def with_window_attn(p, x):
    def body(x, pl):
        h = rms_norm(pl["norm1"], x, V.rms_norm_eps)
        qkv = (h @ pl["qkv_w"] + pl["qkv_b"]).reshape(S, 3, nh, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = apply_rotary(q, k, cos[:, None, :], sin[:, None, :])
        a = _window_attention(q, k, v, valid, wp, scale).reshape(S, nh * hd)
        x = x + (a @ pl["proj_w"] + pl["proj_b"])
        h = rms_norm(pl["norm2"], x, V.rms_norm_eps)
        mlp = (jax.nn.silu(h @ pl["gate_w"] + pl["gate_b"])
               * (h @ pl["up_w"] + pl["up_b"])) @ pl["down_w"] + pl["down_b"]
        return x + mlp, None
    return jax.lax.scan(body, x, p)[0]


for tag, fn in (("matmuls", matmuls_only), ("norms+rotary", with_norms),
                ("window-attn", with_window_attn)):
    f = jax.jit(fn)
    t0 = time.time()
    float(jnp.sum(f(p, x0).astype(jnp.float32)))
    comp = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(f(p, x0).astype(jnp.float32)))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{tag}: {best*1000:.0f}ms total, {best*1000/DEPTH:.1f}ms/layer "
          f"(compile {comp:.0f}s)", flush=True)
