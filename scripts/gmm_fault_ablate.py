"""Ablation ladder for the r5 GMM-decode TPU worker kernel fault.

CLAUDE.md (r5): generate_packed(moe_gmm_decode=True) at B=64 crashes the
TPU worker inside the decode scan, while the ISOLATED moe_mlp_gmm at the
exact decode geometry passes at every block_rows. Each mode below adds one
ingredient of the decode-scan context; run each in its OWN subprocess (a
hit kills the worker; it recovers in ~1 min):

  python scripts/gmm_fault_ablate.py <mode>

  loop        32 sequential GMM launches (one layer, lax.scan over steps)
  stacked     8-layer inner scan with STACKED expert weights as scan xs
              (dynamic-slice-fed kernel operands), 32 outer steps = 256
              launches — the repro's launch count and weight feed
  cache       stacked + a per-layer KV-strip dynamic_update_slice at a
              traced position + an attention-ish read between launches
              (the decode scan's memory-op interleaving)
  linears     stacked + the decode step's surrounding int8 linears
              (q/k/v/o-style matmuls) around each GMM call

Matches the repro geometry: B=64, E=64, k=10, H=2048, I=512, int8 expert
weights, zeros-init (routing then picks experts 0..9 for every token,
exactly the fault run's id table)."""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from video_r2_tpu.models.moe import route
from video_r2_tpu.ops.moe_gmm import (_gmm_apply, auto_block_rows,
                                      moe_mlp_gmm)

B = int(os.environ.get("VR2AB_B", "64"))
E, K, H, I, L, STEPS = 64, 10, 2048, 512, 8, 32
BM = int(os.environ.get("VR2AB_BM", "0"))          # 0 = auto_block_rows
BARRIER = os.environ.get("VR2AB_BARRIER", "") == "1"


def make_params(stacked: bool):
    lead = (L,) if stacked else ()
    z8 = lambda *s: jnp.zeros(lead + s, jnp.int8)  # noqa: E731
    zf = lambda *s: jnp.zeros(lead + s, jnp.float32)  # noqa: E731
    return {
        "router": {"kernel": jnp.zeros(lead + (H, E), jnp.bfloat16)},
        "experts": {
            "gate": {"kernel_q": z8(E, H, I), "scale": zf(E, I)},
            "up": {"kernel_q": z8(E, H, I), "scale": zf(E, I)},
            "down": {"kernel_q": z8(E, I, H), "scale": zf(E, H)},
        },
    }


def gmm(p, x):
    if not BM and not BARRIER:
        return moe_mlp_gmm(p, x, K, True, interpret=False)
    # knob path: moe_mlp_gmm's body with bm override / an
    # optimization_barrier pinning the layout arrays before the kernel
    bm = BM or auto_block_rows(x.shape[0] * K, E)
    topv, topi = route(p["router"]["kernel"], x, K, True)
    return _gmm_apply(x, topv, topi, E, p["experts"]["gate"],
                      p["experts"]["up"], p["experts"]["down"], bm, False)


def main(mode: str) -> None:
    x0 = jnp.ones((B, H), jnp.bfloat16)

    if mode == "loop":
        p = make_params(False)

        @jax.jit
        def run(p, x):
            def step(x, _):
                return (x + gmm(p, x)).astype(x.dtype), ()

            return jax.lax.scan(step, x, None, length=STEPS)[0]

        out = run(p, x0)

    elif mode.startswith(("stacked", "cache", "linears")):
        p = make_params(True)
        wq = jnp.zeros((L, H, H), jnp.int8)
        sq = jnp.zeros((L, H), jnp.float32)
        cache0 = jnp.zeros((L, B, 512, 2, 256), jnp.bfloat16)

        @jax.jit
        def run(p, wq, sq, cache, x):
            def outer(carry, t):
                x, cache = carry

                def layer(x, op):
                    lp, lw, ls, lc = op
                    if mode == "linears":
                        x = (jnp.dot(x, lw.astype(x.dtype),
                                     preferred_element_type=jnp.float32)
                             * ls[None, :]).astype(x.dtype) + x
                    if mode.startswith("cache"):
                        if "nodus" not in mode:  # frontier scatter
                            rows = x.reshape(B, 1, 8, 256)[:, :, :2]
                            pos = 0 if "statict" in mode else t
                            lc = jax.lax.dynamic_update_slice(
                                lc, rows, (0, pos, 0, 0))
                        if "noread" not in mode:  # attention-ish read
                            att = jnp.einsum("bskd,bd->bs", lc,
                                             x[:, :256].astype(lc.dtype))
                            w = jax.nn.softmax(att.astype(jnp.float32), -1)
                            rd = jnp.einsum("bs,bskd->bkd",
                                            w.astype(lc.dtype),
                                            lc).reshape(B, -1)
                            x = x + jnp.pad(
                                rd, ((0, 0), (0, H - rd.shape[1]))
                            ).astype(x.dtype)
                    if BARRIER:
                        # serialize the cache scatter against the kernel:
                        # one opt-barrier HLO over (x, lc) makes every
                        # consumer of x wait for the DUS too
                        x, lc = jax.lax.optimization_barrier((x, lc))
                    if "nogmm" in mode:  # control: exact einsum, no Pallas
                        from video_r2_tpu.models.moe import moe_mlp

                        x = (x + moe_mlp(lp, x[None], K, True,
                                         capacity_factor=0.0)[0]
                             ).astype(x.dtype)
                    else:
                        x = (x + gmm(lp, x)).astype(x.dtype)
                    return x, lc

                x, cache = jax.lax.scan(layer, x, (p, wq, sq, cache))
                return (x, cache), ()

            (x, cache), _ = jax.lax.scan(outer, (x, cache),
                                         jnp.arange(STEPS))
            return x

        out = run(p, wq, sq, cache0, x0)

    else:
        raise SystemExit(f"unknown mode {mode}")

    print(f"{mode}: OK value={float(out.sum()):.3f}")


if __name__ == "__main__":
    main(sys.argv[1])
