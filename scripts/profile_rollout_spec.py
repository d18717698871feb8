"""On-chip profile: GRPO rollout throughput with speculative SAMPLING.

Measures rollouts/hr for the batch rollout backend at the r2/r3 headline
config shape (3B int8 policy, 8 rollouts x 256 tokens per cycle) with
gcfg.rollout_spec_decode in {0, 4, 8}. Rollout completions at temperature
1.0 accept drafts with probability p(draft) — the zero-weight walk model
is maximally self-repetitive, so this measures the HIGH-acceptance end;
the honest floor comes from scripts/profile_spec_decode.py's _reject_all
numbers (verify rounds cost ~a plain step on-device).

Run on the real chip: python scripts/profile_rollout_spec.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from video_r2_tpu.engine import SamplingParams  # noqa: E402
    from video_r2_tpu.engine.generate import generate  # noqa: E402
    from video_r2_tpu.models import qwen25vl_3b  # noqa: E402
    from video_r2_tpu.models.quant import init_params_quantized_zeros  # noqa: E402

    cfg = qwen25vl_3b()
    params = init_params_quantized_zeros(cfg)
    V, H = cfg.text.vocab_size, cfg.text.hidden_size
    params["model"]["embed_tokens"]["embedding"] = (
        jax.random.normal(jax.random.PRNGKey(0), (V, H), jnp.bfloat16) * 0.02)

    B, S, T = 8, 512, 256   # one GRPO group: 8 rollouts, 256-token budget
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 150000, size=(B, S)).astype(np.int32)
    lengths = np.full((B,), S, np.int32)
    sp = SamplingParams(do_sample=True, temperature=1.0, top_k=50,
                        max_new_tokens=T, pad_token_id=cfg.pad_token_id,
                        eos_token_ids=())

    def run(spec_k, label):
        def go(seed):
            return generate(params, cfg, ids, lengths, sp, seed=seed,
                            attn_impl="flash", act_quant="int8",
                            kv_quant=None if spec_k else "int8",
                            spec_decode=spec_k)
        go(0)  # compile
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            go(i + 1)
        dt = (time.perf_counter() - t0) / n
        per_hr = B * 3600 / dt
        print(f"{label}: {dt*1e3:.0f} ms/group -> {per_hr:.0f} rollouts/hr",
              flush=True)
        return dt

    base = run(0, "plain sampled rollouts (int8 KV)")
    for k in (4, 8):
        dt = run(k, f"spec-sampled k={k} rollouts")
        print(f"  k={k}: {base/dt:.2f}x vs plain", flush=True)


if __name__ == "__main__":
    main()
