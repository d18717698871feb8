"""ViT train-step (fwd+bwd) profile: XLA window attention vs the fused
Pallas window kernel, now that the kernel has a custom VJP
(ops/vit_window_attention.py) and flash full-attention has its FA2-style
backward (ops/flash.py).

This isolates VERDICT r2 Missing #5's claim: an UNFROZEN vision tower
(vision_lr, train_sft.sh:56) used to pay the XLA window path in SFT because
the kernel had no VJP. Runs on the real chip (no env overrides).

Timing per CLAUDE.md: jitted scalar reduction + float(), dispatch floor
subtracted is unnecessary here (ms-scale work amortizes the tunnel).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from video_r2_tpu.models import plan_vision_layout, qwen25vl_7b
from video_r2_tpu.models.loader import init_params
from video_r2_tpu.models.vision import vit_forward


def main():
    cfg = qwen25vl_7b()
    params = init_params(cfg, method="zeros", dtype="bfloat16")["visual"]
    # GRPO-scale 32-frame clip: FPS_MAX_FRAMES=32 (train_grpo.sh:24),
    # video_max_pixels=360*420 -> grid ~ (16, 26, 30)
    grid = (16, 26, 30)
    layout = plan_vision_layout([grid], cfg.vision)
    patches = jnp.zeros((int(np.prod(grid)), cfg.vision.patch_input_dim),
                        jnp.float32)
    print(f"grid={grid} S_pad={layout.s_pad} real={layout.seq_len_real}")

    results = {}
    for impl in ("kernel", "xla"):
        def loss(p, x, impl=impl):
            # remat=True: the SFT embed path's configuration (per-layer
            # gradient checkpointing, train_sft.sh:62)
            out = vit_forward(p, cfg.vision, x, layout, attn_impl=impl,
                              remat=True)
            return (out.astype(jnp.float32) ** 2).sum()

        @jax.jit
        def step(p, x):
            val, grads = jax.value_and_grad(loss)(p, x)
            # one scalar out: the tunnel's block_until_ready can return
            # early, so force a full reduction on device (CLAUDE.md)
            return val + sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                             for g in jax.tree_util.tree_leaves(grads))

        def run():
            return float(step(params, patches))

        try:
            run()  # compile
        except Exception as e:
            print(f"{impl:7s}: fwd+bwd FAILED ({type(e).__name__}: "
                  f"{str(e)[:160]})")
            results[impl] = (float("inf"), float("inf"))
            continue
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            run()
        dt = (time.perf_counter() - t0) / n * 1e3
        fwd = jax.jit(loss)
        float(fwd(params, patches))
        t0 = time.perf_counter()
        for _ in range(n):
            float(fwd(params, patches))
        dt_f = (time.perf_counter() - t0) / n * 1e3
        results[impl] = (dt, dt_f)
        print(f"{impl:7s}: fwd+bwd {dt:8.1f} ms | fwd-only {dt_f:8.1f} ms")

    if results["xla"][0] != float("inf"):
        speedup = results["xla"][0] / results["kernel"][0]
        print(f"fwd+bwd speedup kernel vs xla: {speedup:.2f}x")


if __name__ == "__main__":
    main()
