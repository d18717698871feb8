"""Depth-32 ViT tower BACKWARD through the axon remote compiler, by remat
granularity (VERDICT r3 #9 workaround attempt).

r3 finding: per-layer remat backward compiles/runs at depth 2/8 but the
FULL depth-32 tower exceeds the remote compiler's limits at big grids.
This sweeps cfg.remat_segment in {0 (per-layer), 16, 8, 4} at the GRPO
32-frame grid and reports, per mode: compile outcome, compile seconds,
fwd+bwd ms. If all fail, the exact failing shape is printed for a
pod-attached one-shot.

Run on the real chip: python scripts/profile_vit_remat_segment.py [grid_t]
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from video_r2_tpu.models import plan_vision_layout, qwen25vl_7b  # noqa: E402
    from video_r2_tpu.models.loader import init_params  # noqa: E402
    from video_r2_tpu.models.vision import vit_forward  # noqa: E402

    cfg = qwen25vl_7b()
    params = init_params(cfg, method="zeros", dtype="bfloat16")["visual"]
    gt = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    grid = (gt, 26, 30)          # 32-frame GRPO shape at gt=16
    layout = plan_vision_layout([grid], cfg.vision)
    patches = jnp.zeros((int(np.prod(grid)), cfg.vision.patch_input_dim),
                        jnp.float32)
    print(f"grid={grid} S_pad={layout.s_pad} depth={cfg.vision.depth}",
          flush=True)

    for seg in (0, 16, 8, 4):
        vcfg = dataclasses.replace(cfg.vision, remat_segment=seg)

        def loss(p):
            out = vit_forward(p, vcfg, patches, layout, attn_impl="kernel",
                              remat=True)
            return (out.astype(jnp.float32) ** 2).sum()

        @jax.jit
        def step(p):
            val, grads = jax.value_and_grad(loss)(p)
            return val + sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                             for g in jax.tree_util.tree_leaves(grads))

        label = f"remat_segment={seg or 'per-layer'}"
        t0 = time.perf_counter()
        try:
            float(step(params))
        except Exception as e:
            print(f"{label:24s}: FAILED after {time.perf_counter()-t0:.0f}s "
                  f"({type(e).__name__}: {str(e)[:140]})", flush=True)
            continue
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            float(step(params))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label:24s}: compile {t_compile:6.0f}s | fwd+bwd "
              f"{dt:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
