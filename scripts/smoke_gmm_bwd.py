"""Mosaic compile smoke for the GMM forward + backward kernels on chip.

The recompute VJP (ops/moe_gmm.gmm_expert_ffn_diff) is interpret-verified;
this checks the three Pallas kernels (fwd grouped FFN, dX, per-expert dW
with consecutive-run output revisiting) actually compile and run through
Mosaic at a judge-block-shaped slice, and that grads match the einsum on
the real chip.

Run on the real chip: python scripts/smoke_gmm_bwd.py [E H I T]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from video_r2_tpu.models.moe import moe_mlp  # noqa: E402
    from video_r2_tpu.ops.moe_gmm import moe_mlp_gmm_diff  # noqa: E402

    E, H, I, T, k = 16, 2048, 768, 256, 8
    if len(sys.argv) > 4:
        E, H, I, T = (int(a) for a in sys.argv[1:5])
        k = min(k, E)
    r = np.random.default_rng(0)
    p = {
        "router": {"kernel": jnp.asarray(r.normal(0, H ** -0.5, (H, E)),
                                         jnp.float32)},
        "experts": {
            "gate": {"kernel": jnp.asarray(r.normal(0, 0.02, (E, H, I)),
                                           jnp.float32)},
            "up": {"kernel": jnp.asarray(r.normal(0, 0.02, (E, H, I)),
                                         jnp.float32)},
            "down": {"kernel": jnp.asarray(r.normal(0, 0.02, (E, I, H)),
                                           jnp.float32)},
        },
    }
    x = jnp.asarray(r.normal(0, 1, (T, H)), jnp.float32)
    cot = jnp.asarray(r.normal(0, 1, (T, H)), jnp.float32)

    g_gmm = jax.jit(jax.grad(lambda p, x: jnp.sum(
        moe_mlp_gmm_diff(p, x, k, True) * cot), argnums=(0, 1)))
    g_ein = jax.jit(jax.grad(lambda p, x: jnp.sum(
        moe_mlp(p, x[None], k, True, capacity_factor=0.0)[0] * cot),
        argnums=(0, 1)))

    t0 = time.perf_counter()
    gp, gx = g_gmm(p, x)
    jax.block_until_ready(gx)
    print(f"gmm fwd+bwd Mosaic compile+run OK in "
          f"{time.perf_counter()-t0:.1f}s (E={E} H={H} I={I} T={T})",
          flush=True)
    rp, rx = g_ein(p, x)
    err = float(jnp.max(jnp.abs(gx - rx)))
    ref = float(jnp.max(jnp.abs(rx)))
    print(f"dX max|diff| {err:.3e} vs einsum (scale {ref:.3e})", flush=True)
    for path in (("experts", "gate", "kernel"), ("experts", "down", "kernel"),
                 ("router", "kernel")):
        a, b = gp, rp
        for key in path:
            a, b = a[key], b[key]
        e = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(b)))
        print(f"d{'/'.join(path)}: max|diff| {e:.3e} (scale {s:.3e})",
              flush=True)


if __name__ == "__main__":
    main()
