"""On-chip throughput of Qwen3-Next slot-continuous serving (r5).

The judge deployment shape served natively: N slots over the ~1/6-depth
80B-A3B int8 slice (real head geometry, E=64 experts), plain decode vs
per-slot speculative decode (repetitive prompts = the judge's
quote-the-rubric acceptance regime), plus a chunked-prefill admission
row. Timing per CLAUDE.md: step() host loop wall-clock around jitted
dispatches (the engine's own cadence), never bare block_until_ready.

Run on the real chip: python scripts/profile_next_continuous.py [tiny]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp  # noqa: E402

    from video_r2_tpu.engine.next_continuous import (  # noqa: E402
        Qwen3NextContinuousEngine,
    )
    from video_r2_tpu.engine.sampling import SamplingParams  # noqa: E402
    from video_r2_tpu.models.qwen3_next import (  # noqa: E402
        Qwen3NextConfig,
        init_qwen3_next_params,
        quantize_qwen3_next_params,
    )

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
        N, S, T, max_len = 4, 96, 16, 256
    else:
        cfg = Qwen3NextConfig(num_hidden_layers=8, num_experts=64,
                              dtype="bfloat16")
        N, S, T, max_len = 8, 1024, 64, 2048
    params = init_qwen3_next_params(cfg, method="zeros")
    if not tiny:
        params = quantize_qwen3_next_params(params, consume=True)
    rng = np.random.default_rng(0)
    # repetitive prompts: the n-gram drafting acceptance regime judge
    # outputs live in (they echo the prompt's rubric/answer strings)
    base = rng.integers(2, cfg.vocab_size - 1, 16).tolist()
    prompts = [(base * (S // 16 + 1))[:S] for _ in range(N)]
    sp = SamplingParams(max_new_tokens=T, eos_token_ids=(),
                        pad_token_id=cfg.pad_token_id)

    def drain(eng, label, steps=1):
        t_admit0 = time.perf_counter()
        rids = [eng.submit(p, T) for p in prompts]
        assert all(r is not None for r in rids)
        # chunked admission completes inside the step loop
        t0 = time.perf_counter()
        ndone, calls = 0, 0
        while eng.num_active:
            ndone += len(eng.step(steps))
            calls += 1
        dt = time.perf_counter() - t0
        admit = t0 - t_admit0
        toks = N * T
        print(f"{label}: admit {admit*1e3:.0f} ms | decode {dt*1e3:.0f} ms "
              f"({toks/dt:.0f} tok/s, {calls} step() calls) "
              f"[done={ndone}]", flush=True)
        return toks / dt

    # warmup + measurement per engine config (fresh engine per run keeps
    # slot state clean; compiles cache across engines via jit identity)
    for label, kw, steps in (
            ("plain", {}, 1),
            ("plain w8", {}, 8),
            ("spec k=8", {"spec_decode": 8}, 1),
            ("spec k=8 w4", {"spec_decode": 8}, 4),
            ("spec k=8 + chunked prefill", {"spec_decode": 8,
                                            "prefill_chunk_tokens": 256}, 1),
    ):
        if tiny and "chunk" in label:
            kw = dict(kw, prefill_chunk_tokens=32)
        eng = Qwen3NextContinuousEngine(params, cfg, num_slots=N,
                                        max_len=max_len, sp=sp, **kw)
        drain(eng, f"warmup {label}", steps)
        eng2 = Qwen3NextContinuousEngine(params, cfg, num_slots=N,
                                         max_len=max_len, sp=sp, **kw)
        drain(eng2, label, steps)
        if getattr(eng2, "spec_stats", None) and kw.get("spec_decode"):
            s = eng2.spec_stats
            # spec_tokens sums over all N slots per round
            acc = s["spec_tokens"] / max(s["spec_rounds"], 1) / N - 1
            print(f"  accept/round: {acc:.2f} drafts/slot "
                  f"({s['spec_rounds']} rounds)", flush=True)


if __name__ == "__main__":
    main()
