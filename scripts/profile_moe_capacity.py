"""MoE capacity-drop telemetry at judge batch shapes (VERDICT r3 #7).

The grouped dispatch drops over-capacity tokens (GShard semantics); the
reference judge's vLLM serves exact outputs, so before trusting a
capacity_factor for TAC/VAS judging we measure what it actually drops at
the judge routing shape (E=128, top-8 — the Qwen3-30B/80B-A3B family) for
prefill- and decode-sized steps, under increasing expert-popularity skew
(real routers are skewed; uniform is the best case).

Pure routing math — runs anywhere (CPU fine): python scripts/profile_moe_capacity.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # CLAUDE.md: the ambient sitecustomize imports jax at interpreter
    # start; forcing CPU needs the live-config update too
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp  # noqa: E402

    from video_r2_tpu.models.moe import capacity_drop_stats  # noqa: E402

    E, k, H = 128, 8, 1024
    rng = np.random.default_rng(0)
    rows = []
    for skew in (0.0, 0.5, 1.0):
        # expert popularity skew: scale router columns by exp(N(0, skew))
        w = rng.normal(0, H ** -0.5, (H, E))
        w = w * np.exp(rng.normal(0.0, skew, (1, E)))
        p = {"router": {"kernel": jnp.asarray(w, jnp.float32)}}
        for label, B, S in (("prefill", 8, 256), ("decode", 8, 1)):
            x = jnp.asarray(rng.normal(0, 1, (B, S, H)), jnp.float32)
            for cf in (1.0, 1.25, 2.0):
                st = capacity_drop_stats(p, x, k, True, capacity_factor=cf,
                                         group_size=256)
                rows.append({"skew": skew, "shape": label, "cf": cf, **st})
                print(f"skew={skew:.1f} {label:7s} cf={cf:<5} C={st['capacity']:4d} "
                      f"slot_drop={st['slot_drop_rate']*100:6.2f}% "
                      f"weight_drop={st['weight_drop_rate']*100:6.2f}% "
                      f"max_fill={st['expert_max_fill']}", flush=True)
    print(json.dumps({"metric": "moe_capacity_drop_sweep", "rows": rows},
                     default=float))


if __name__ == "__main__":
    main()
