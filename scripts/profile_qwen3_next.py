"""On-chip Qwen3-Next (hybrid DeltaNet judge) decode/prefill profile.

The reference judge is Qwen3-Next-80B-A3B on vLLM TP=4
(serve_qwen3.sh:11-17); models/qwen3_next.py hosts the architecture
natively. One v5e chip can't hold 80B, so this measures a proportionally
trimmed single-chip config (same layer pattern, head geometry, and expert
shape; fewer layers/experts) to validate:
  - the chunked delta rule compiles + runs through the remote compiler;
  - decode step latency (recurrent DeltaNet state + 1/4-layers KV);
  - prefill throughput at judge-ish prompt lengths.

Run on the real chip:   python scripts/profile_qwen3_next.py
CPU smoke (tiny):       JAX_PLATFORMS=cpu python scripts/profile_qwen3_next.py tiny
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import os  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from video_r2_tpu.engine.sampling import SamplingParams  # noqa: E402
from video_r2_tpu.models.qwen3_next import (  # noqa: E402
    Qwen3NextConfig,
    decode_step,
    generate_packed,
    init_qwen3_next_params,
    prefill,
    quantize_qwen3_next_params,
)


def main():
    tiny = len(sys.argv) > 1 and sys.argv[1] == "tiny"
    if tiny:
        cfg = Qwen3NextConfig(
            vocab_size=256, hidden_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            linear_num_key_heads=2, linear_num_value_heads=4,
            linear_key_head_dim=16, linear_value_head_dim=16,
            num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
            shared_expert_intermediate_size=32, moe_ragged_decode=False,
            moe_gmm_prefill=False, dtype="float32")
        B, S, T = 2, 96, 8
    else:
        # ~1/6-depth 80B-A3B slice: real head geometry + expert shape,
        # 8 layers (2 groups), E=64 experts -> ~2.4 GB int8
        cfg = Qwen3NextConfig(num_hidden_layers=8, num_experts=64,
                              dtype="bfloat16")
        B, S, T = 8, 1024, 32
    params = init_qwen3_next_params(cfg, method="zeros")
    if not tiny:
        params = quantize_qwen3_next_params(params, consume=True)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size - 1, (B, S))
    lens = np.full((B,), S, np.int32)

    # prefill latency (jitted sum + float() — the tunnel-safe timing)
    pre = jax.jit(lambda p, i, l: prefill(p, cfg, i, l, S + T)[0].sum())
    _ = float(pre(params, jnp.asarray(ids), jnp.asarray(lens)))
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(pre(params, jnp.asarray(ids), jnp.asarray(lens)))
    t_pre = (time.perf_counter() - t0) / 3
    print(f"prefill B={B} S={S}: {t_pre*1e3:.1f} ms "
          f"({B*S/t_pre:.0f} tok/s)")

    # decode step latency through generate_packed's scan
    sp = SamplingParams(max_new_tokens=T)
    t0 = time.perf_counter()
    res = generate_packed(params, cfg, ids, lens, sp)
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = generate_packed(params, cfg, ids, lens, sp)
    t_gen = time.perf_counter() - t0
    print(f"generate B={B} T={T}: {t_gen*1e3:.1f} ms warm "
          f"({B*T/t_gen:.0f} tok/s, first-call {t_warm:.1f}s) "
          f"-> {res.sequences.shape}")

    # speculative greedy (judge bursts echo prompt text): repetitive
    # prompt = high acceptance ceiling; random prompt = floor
    from video_r2_tpu.models.qwen3_next import generate_spec
    rep_ids = np.tile(ids[:, :8], (1, S // 8))[:, :S]
    for name, pids in (("rep", rep_ids), ("rnd", ids)):
        _ = generate_spec(params, cfg, pids, lens, sp, spec_k=8)
        t0 = time.perf_counter()
        res_s = generate_spec(params, cfg, pids, lens, sp, spec_k=8)
        t_s = time.perf_counter() - t0
        print(f"spec k=8 ({name}): {t_s*1e3:.1f} ms "
              f"({B*T/t_s:.0f} tok/s, {t_gen/t_s:.2f}x plain)")

    # single decode-step cost (amortized inside one jit via scan of 8)
    _, cache = jax.jit(lambda p, i, l: prefill(p, cfg, i, l, S + T))(
        params, jnp.asarray(ids), jnp.asarray(lens))

    @jax.jit
    def steps8(p, cache, tok):
        # params ride as an ARGUMENT — a closure bakes the whole int8
        # slice (2.84 GB) into the executable as constants (the LoRA-step
        # lesson, VERDICT r4 #3)
        def body(c, _):
            cache, tok = c
            logits, cache = decode_step(p, cfg, tok, cache)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), ()
        (cache, tok), _ = jax.lax.scan(body, (cache, tok), length=8)
        return tok.sum()

    tok0 = jnp.zeros((B,), jnp.int32) + 5
    _ = float(steps8(params, cache, tok0))
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(steps8(params, cache, tok0))
    dt = (time.perf_counter() - t0) / 3 / 8
    print(f"decode step: {dt*1e3:.2f} ms ({B/dt:.0f} tok/s)")

    # r5 serving quantization: int8 KV strips on the full-attention
    # layers (kv_quant — halves the 32k-context judge KV) and W8A8
    # prefill linears (act_quant, int8 weights -> integer MXU)
    for label, qcfg in (("kv_quant=int8", cfg.replace(kv_quant="int8")),
                        ("act_quant=int8", cfg.replace(act_quant="int8")),
                        ("kv+act int8", cfg.replace(kv_quant="int8",
                                                    act_quant="int8"))):
        t0 = time.perf_counter()
        _ = generate_packed(params, qcfg, ids, lens, sp)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = generate_packed(params, qcfg, ids, lens, sp)
        tq = time.perf_counter() - t0
        print(f"generate {label}: {tq*1e3:.1f} ms warm "
              f"({B*T/tq:.0f} tok/s, {t_gen/tq:.2f}x bf16-KV plain, "
              f"first-call {warm:.1f}s)")


if __name__ == "__main__":
    main()
