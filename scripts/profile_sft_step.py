"""On-chip SFT step-time number of record (VERDICT r3 #4).

The reference training shape scaled to one chip: train_sft.sh runs global
batch 32 over 8 GPUs (= 4/device), LoRA r64 on a frozen-tower base, flash
attention, gradient checkpointing. Here: Qwen2.5-VL-7B weight-only int8
base (QLoRA form — y = base(x) + x@A@B, the int8 base never dequantizes
into a dense W+AB), LoRA r64 text targets, one 16-frame video per row
(grid (8,18,32) -> 1152 video tokens), S=1536, B=4.

Prints ms/step, tokens/s, and ONE JSON line for PARITY.md. Timing per
CLAUDE.md: the jitted step returns scalars (loss/grad_norm) that are
float()ed — never bare dispatch + block_until_ready through the tunnel.

Run on the real chip: python scripts/profile_sft_step.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from video_r2_tpu.models import (  # noqa: E402
        get_rope_index,
        plan_vision_layout,
        qwen25vl_7b,
    )
    from video_r2_tpu.models.quant import init_params_quantized_zeros  # noqa: E402
    from video_r2_tpu.ops.fused_ce import IGNORE_INDEX  # noqa: E402
    from video_r2_tpu.train import (  # noqa: E402
        LoRAConfig,
        LoRATrainState,
        OptimConfig,
        SFTConfig,
        init_lora_for_quantized,
        make_lora_sft_step,
        make_optimizer,
    )

    cfg = qwen25vl_7b()
    params = init_params_quantized_zeros(cfg)
    lcfg = LoRAConfig(r=64, alpha=64)          # train_sft.sh LoRA shape
    lora = init_lora_for_quantized(params, lcfg, seed=0)
    n_lora = sum(int(np.prod(x.shape))
                 for x in jax.tree_util.tree_leaves(lora))
    print(f"LoRA params: {n_lora/1e6:.1f}M (r={lcfg.r})", flush=True)

    B, S = 4, 1536
    grid = (8, 18, 32)                         # 16 frames @ 504x896
    n_tok = int(np.prod(grid)) // 4            # after 2x2 merge: 1152
    layout = plan_vision_layout([grid] * B, cfg.vision)
    patches = jnp.zeros((B * int(np.prod(grid)),
                         cfg.vision.patch_input_dim), jnp.float32)

    rng = np.random.default_rng(0)
    row_len = 8 + 1 + n_tok + 1 + 64           # text | vs | video | ve | text
    assert row_len <= S
    ids = np.full((B, S), cfg.pad_token_id, np.int64)
    for b in range(B):
        row = ([int(x) for x in rng.integers(10, 1000, 8)]
               + [cfg.vision_start_token_id] + [cfg.video_token_id] * n_tok
               + [cfg.vision_end_token_id]
               + [int(x) for x in rng.integers(10, 1000, 64)])
        ids[b, :len(row)] = row
    mask = (np.arange(S)[None] < row_len).astype(np.int64) * np.ones((B, 1), np.int64)
    labels = ids.copy()
    labels[:, :row_len - 64] = IGNORE_INDEX    # answer-only loss
    labels[mask == 0] = IGNORE_INDEX
    pos, _ = get_rope_index(
        ids, cfg, video_grid_thw=np.asarray([grid] * B),
        second_per_grid_ts=np.asarray([1.0] * B), attention_mask=mask)

    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(pos),
        "attention_mask": jnp.asarray(mask),
        "video_patches": patches,
    }
    scfg = SFTConfig(attn_impl="flash", ce_chunk_size=1024,
                     gradient_checkpointing=True)
    opt = make_optimizer(OptimConfig(learning_rate=1e-4, total_steps=100),
                         lora)
    step = make_lora_sft_step(params, cfg, scfg, lcfg, opt,
                              video_layout=layout, donate=True)
    state = LoRATrainState(lora, opt.init(lora), jnp.int32(0))

    t0 = time.perf_counter()
    state, m = step(state, batch)
    loss = float(m["loss"])                    # forces the step
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s "
          f"loss={loss:.4f}", flush=True)

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
        loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    toks = B * int(mask.sum() // B)
    # Model-FLOPs accounting (VERDICT r4 #6). Decoder: 3x the per-token
    # matmul+attention forward census (forward + remat recompute + dgrad;
    # dW is skipped — the base is frozen, only the tiny LoRA factors get
    # weight grads). ViT: forward ONLY — the tower is frozen AND unadapted,
    # so no gradient flows through it and XLA prunes its backward (patches
    # need no grad). MFU is against the v5e bf16 peak (bf16-equivalent
    # convention; the int8-base matmuls run the integer MXU at 2x).
    from bench import V5E_BF16_PEAK_FLOPS, decode_model_flops_per_token
    f_dec = 3.0 * decode_model_flops_per_token(cfg, row_len / 2.0)
    vit_params = sum(int(np.prod(x.shape))
                     for x in jax.tree_util.tree_leaves(params["visual"])
                     if hasattr(x, "ndim") and x.ndim >= 2)
    f_vit = 2.0 * vit_params * (B * int(np.prod(grid)))
    total_flops = f_dec * toks + f_vit
    tflops = total_flops / dt / 1e12
    mfu = tflops * 1e12 / V5E_BF16_PEAK_FLOPS
    print(f"SFT step: {dt*1e3:.0f} ms | {toks/dt:.0f} tokens/s "
          f"(B={B}, S={S}, {n_tok} video tokens/row, 7B int8 + LoRA r64, "
          f"flash, remat)", flush=True)
    print(f"model FLOPs: {tflops:.1f} TFLOP/s sustained = {mfu*100:.1f}% "
          f"of v5e bf16 peak (3x decoder fwd census + 1x frozen-ViT fwd)",
          flush=True)
    print(json.dumps({
        "metric": "sft_step_ms_qwen25vl7b_int8_lora64_b4_s1536_16f",
        "value": round(dt * 1e3, 1), "unit": "ms/step",
        "tokens_per_sec": round(toks / dt, 1),
        "model_tflops_per_sec": round(tflops, 1),
        "mfu_bf16_peak": round(mfu, 3)}))


if __name__ == "__main__":
    main()
