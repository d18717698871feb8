"""On-chip profile: speculative decoding INSIDE the continuous slot engine
(per-slot frontier verification) vs the plain continuous loop, at the judge
serving shape (7B int8 weights, 8 slots, S=1024 prompts, T=128 greedy).

Same best/worst endpoints as scripts/profile_spec_decode.py (batch mode):
- best: the prompt embeds the model's own greedy continuation (acceptance
  ~1 — the judge/TAC "answer quotes the context" workload);
- worst: fully random prompts (acceptance ~0 — pure verify overhead).

Run on the real chip: python scripts/profile_continuous_spec.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from video_r2_tpu.engine import SamplingParams  # noqa: E402
    from video_r2_tpu.engine.continuous import ContinuousEngine  # noqa: E402
    from video_r2_tpu.engine.generate import generate  # noqa: E402
    from video_r2_tpu.models import qwen25vl_7b  # noqa: E402
    from video_r2_tpu.models.quant import init_params_quantized_zeros  # noqa: E402

    cfg = qwen25vl_7b()
    params = init_params_quantized_zeros(cfg)
    V, H = cfg.text.vocab_size, cfg.text.hidden_size
    k0 = jax.random.PRNGKey(0)
    params["model"]["embed_tokens"]["embedding"] = (
        jax.random.normal(k0, (V, H), jnp.bfloat16) * 0.02)
    if "kernel_q" in params.get("lm_head", {}):
        params["lm_head"]["kernel_q"] = jax.random.randint(
            jax.random.PRNGKey(1), params["lm_head"]["kernel_q"].shape,
            -127, 128, jnp.int8)

    B, S, T = 8, 1024, 128
    rng = np.random.default_rng(0)
    sp = SamplingParams(max_new_tokens=T, pad_token_id=cfg.pad_token_id,
                        eos_token_ids=())
    t_last = 777
    probe = rng.integers(2, 150000, size=(1, 64)).astype(np.int32)
    probe[0, -1] = t_last
    cont = generate(params, cfg, probe, np.array([64]), sp,
                    act_quant="int8").sequences[0]
    print("walk head:", cont[:8], flush=True)

    def prompts(embed_walk: bool):
        ids = rng.integers(2, 150000, size=(B, S)).astype(np.int32)
        if embed_walk:
            ids[:, -(T + 2):-1] = np.concatenate([[t_last], cont[:T]])
        ids[:, -1] = t_last
        return ids

    def run(ids, spec_k, label, steps=8, reject_all=False):
        # ONE cache width for every engine: decode-dispatch geometries are
        # keyed on it, so a per-k width would recompile the plain fallback
        # windows per engine and pollute the timing
        eng = ContinuousEngine(
            params, cfg, num_slots=B, max_len=S + T + 16,
            sp=SamplingParams(pad_token_id=cfg.pad_token_id,
                              eos_token_ids=()),
            prompt_buckets=(S,), spec_decode=spec_k)
        eng._spec_reject_all = reject_all
        for b in range(B):
            eng.submit(list(ids[b]), max_new_tokens=T)
        t0 = time.perf_counter()
        n_tok = 0
        dispatches = 0
        while eng.num_active:
            fin = eng.step(steps=steps)
            dispatches += 1
            n_tok += sum(len(t) for _, t in fin)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt*1e3:.0f} ms, {dispatches} step() calls -> "
              f"{n_tok/dt:.0f} tok/s", flush=True)
        return dt

    # warm both compile paths once (prefill + decode geometries). NOTE the
    # zero-weight 7B decodes self-repetitively (constant argmax), so the
    # n-gram drafter reaches acceptance ~1 on ANY prompt — "best" here means
    # full acceptance; the honest floor is the forced-rejection run.
    run(prompts(False), 0, "warmup plain")
    base = run(prompts(True), 0, "plain continuous")
    for k in (4, 8):
        run(prompts(True), k, f"warmup spec k={k}")
        dt_b = run(prompts(True), k, f"cont-spec k={k} accept~1")
        dt_w = run(prompts(False), k, f"cont-spec k={k} reject-all floor",
                   reject_all=True)
        print(f"  k={k}: accept~1 {base/dt_b:.2f}x, zero-acceptance floor "
              f"{base/dt_w:.2f}x vs plain continuous", flush=True)


if __name__ == "__main__":
    main()
