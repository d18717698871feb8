"""On-chip profile: speculative decoding (n-gram prompt lookup) vs plain
greedy decode at a judge/TAC-shaped workload (7B int8 weights, B=8,
S=1024 prompt, T=128 greedy tokens).

Acceptance rate is workload-dependent, so this measures BOTH endpoints with
the same 7B compute cost:
- best case: the prompt embeds the model's own greedy continuation (the
  zeros-decoder 7B's next token is a fixed walk of the current token, so the
  continuation can be planted verbatim — the "answer quotes the context"
  workload), acceptance ~= 1;
- worst case: fully random prompt, acceptance ~= 0 — measures pure verify
  overhead (the W-row verify matmuls are nearly free next to the weight
  reads, but rejected rounds emit 1 token for W rows of lm_head work).

Run on the real chip: python scripts/profile_spec_decode.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from video_r2_tpu.engine import SamplingParams  # noqa: E402
    from video_r2_tpu.engine.generate import generate, prefill  # noqa: E402
    from video_r2_tpu.engine.spec_decode import spec_decode  # noqa: E402
    from video_r2_tpu.models import qwen25vl_7b  # noqa: E402
    from video_r2_tpu.models.quant import init_params_quantized_zeros  # noqa: E402

    cfg = qwen25vl_7b()
    params = init_params_quantized_zeros(cfg)
    # zeros decoder + unit norms make the next token a fixed walk of the
    # current token; randomize embed + head so the walk is non-degenerate
    V, H = cfg.text.vocab_size, cfg.text.hidden_size
    k0 = jax.random.PRNGKey(0)
    params["model"]["embed_tokens"]["embedding"] = (
        jax.random.normal(k0, (V, H), jnp.bfloat16) * 0.02)
    if "kernel_q" in params.get("lm_head", {}):
        params["lm_head"]["kernel_q"] = jax.random.randint(
            jax.random.PRNGKey(1), params["lm_head"]["kernel_q"].shape,
            -127, 128, jnp.int8)
    else:
        params["lm_head"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(1), (H, V), jnp.bfloat16)
            * 0.02)

    B, S, T = 8, 1024, 128
    rng = np.random.default_rng(0)
    sp = SamplingParams(max_new_tokens=T, pad_token_id=cfg.pad_token_id,
                        eos_token_ids=())
    t_last = 777

    # probe: the model's actual greedy continuation from t_last
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

    lengths = np.full((B,), S, np.int32)

    def run(ids, spec_k, label):
        def go(seed):
            return generate(params, cfg, ids, lengths, sp, seed=seed,
                            attn_impl="flash", act_quant="int8",
                            spec_decode=spec_k)
        r = go(0)  # compile
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            r = go(i + 1)
        dt = (time.perf_counter() - t0) / n
        tps = B * T / dt
        print(f"{label}: {dt*1e3:.0f} ms -> {tps:.0f} tok/s", flush=True)
        return dt

    base_best = run(prompts(True), 0, "plain  greedy (walk prompt)")
    base_worst = run(prompts(False), 0, "plain  greedy (random prompt)")
    for k in (4, 8):
        dt_b = run(prompts(True), k, f"spec k={k} best  (walk prompt)")
        dt_w = run(prompts(False), k, f"spec k={k} worst (random prompt)")
        # verify-iteration count at the best-case workload
        ids = prompts(True)
        pos = np.broadcast_to(np.arange(S)[None, None], (3, B, S)).copy()
        lg, cache = prefill(params, cfg, jnp.asarray(ids), jnp.asarray(pos),
                            jnp.asarray(lengths), S + T + k + 1,
                            attn_impl="flash", act_quant="int8")
        *_, iters = spec_decode(params, cfg, sp, lg, cache,
                                jnp.asarray(lengths),
                                jnp.asarray(np.zeros(B, np.int64)),
                                jnp.asarray(ids), s_pad=S, spec_k=k,
                                act_quant=None)
        print(f"  k={k}: best {base_best/dt_b:.2f}x, worst "
              f"{base_worst/dt_w:.2f}x, verify iters (best) = "
              f"{int(iters)} vs {T} plain steps", flush=True)

    # acceptance-0 floor: _reject_all forces every draft wrong, so each
    # verify round emits exactly one token — T rounds of W-row work
    ids = prompts(False)
    pos = np.broadcast_to(np.arange(S)[None, None], (3, B, S)).copy()
    for k in (4, 8):
        def floor_run(seed):
            lg, cache = prefill(params, cfg, jnp.asarray(ids),
                                jnp.asarray(pos), jnp.asarray(lengths),
                                S + T + k + 1, attn_impl="flash",
                                act_quant="int8")
            toks, _, _, it = spec_decode(
                params, cfg, sp, lg, cache, jnp.asarray(lengths),
                jnp.asarray(np.zeros(B, np.int64)), jnp.asarray(ids),
                s_pad=S, spec_k=k, _reject_all=True)
            return float(jnp.sum(toks)), int(it)
        floor_run(0)
        t0 = time.perf_counter()
        _, it = floor_run(1)
        dt = time.perf_counter() - t0
        print(f"  k={k} reject-all floor: {dt*1e3:.0f} ms "
              f"({base_worst/dt:.2f}x vs plain, {it} iters)", flush=True)


if __name__ == "__main__":
    main()
