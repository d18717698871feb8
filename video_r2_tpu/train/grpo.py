"""GRPO trainer: group rollouts -> rewards -> advantages -> PPO-clipped loss.

Behavioral spec: train/src/trainer/grpo_trainer.py (the reference's largest
file). TPU-first decomposition:

- Rollouts run through the generation engine (engine/generate.py) on the same
  params — no ZeRO-3 gather-for-generation dance (grpo_trainer.py:779-786);
  a resharding handoff slots in here when train/infer layouts diverge.
- Rewards are host python (reward fns + judge HTTP happen off-mesh), so the
  group advantage normalization (:964-974), MAPO mixed advantage (:922-962),
  positive-reinforcement gating (:910-917) and weighted nansum (:920) are
  plain numpy on the single controller — the reference's cross-process
  `gather` disappears by construction.
- The loss (:1085-1178) runs jitted: chunked per-token logps (152k vocab, no
  [B,L,V]), KL estimator exp(d)-d-1, token or GMPO sequence-geometric ratio,
  PPO clip with (eps_low, eps_high), grpo/bnpo/dr_grpo aggregations, clip-
  fraction telemetry.
- EOS masking (:793-798) and mask_truncated_completions (:801-803) reproduce
  the reference exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import ModelConfig
from ..models.decoder import causal_mask_bias, decoder_forward
from ..models.model import embed_inputs
from ..models.mrope import mrope_cos_sin
from ..ops.logprobs import chunked_token_logprobs


@dataclass(frozen=True)
class GRPOConfig:
    """Parity: GRPOArguments (train/src/params.py:119-200) + TRL GRPOConfig."""

    num_generations: int = 8
    beta: float = 0.04
    epsilon_low: float = 0.2
    epsilon_high: float = 0.2
    loss_type: str = "grpo"        # grpo | bnpo | dr_grpo | gmpo | mapo | mapo_bnpo
    scale_rewards: bool = True
    mask_truncated_completions: bool = False
    num_iterations: int = 1        # mu: optimizer steps per generation batch
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 50
    max_completion_length: int = 256
    max_prompt_length: int = 512
    reward_weights: tuple[float, ...] | None = None
    positive_reinforcement: str = ""   # comma-joined reward names gated on accuracy
    length_reinforcement_buffer: int = 0
    buffer_seconds: float = 2.0
    similarity_threshold: float = 0.75
    logp_chunk_size: int = 1024
    pp_microbatches: int = 0       # GPipe microbatches when the mesh has pp>1
    # ViT attention in the loss's embed path (mirrors SFTConfig.vit_attn_
    # impl): "auto" = fused Pallas kernels on TPU; make_grpo_step downgrades
    # auto -> "xla" under a mesh (tracer params can't be device-inspected;
    # the Pallas window kernel is single-device — GSPMD shards the xla
    # tower from the weight annotations)
    vit_attn_impl: str = "auto"
    # rollout infrastructure (TRL's use_vllm analog): "batch" = static batch
    # generate; "paged" = continuous batching over the paged KV pool, so
    # rollouts that hit EOS early free their slot for the next request
    rollout_backend: str = "batch"
    # paged backend: decode tokens per dispatch (multi-step window) —
    # rollouts are throughput-bound, so window freely
    rollout_decode_steps: int = 8
    # "int8": int8 page pool for rollouts (half the KV bytes per token ->
    # ~2x pool capacity; scale pages factored out of both attention dots)
    rollout_kv_quant: str | None = None
    # K > 0: speculative SAMPLING for rollouts (batch AND paged backends) — n-gram
    # prompt-lookup drafts verified by rejection sampling (exact target
    # distribution, engine/spec_decode.py). Rollout completions quote the
    # prompt's subtitles/options/format strings, the drafting workload
    rollout_spec_decode: int = 0


# ---------------------------------------------------------------------------
# Host-side: completion masking, rewards -> advantages
# ---------------------------------------------------------------------------

def completion_mask_from_ids(completion_ids: np.ndarray, eos_token_id: int,
                             mask_truncated: bool = False) -> np.ndarray:
    """Mask everything after the first EOS (inclusive); optionally zero
    truncated (no-EOS) completions. Parity: grpo_trainer.py:793-803."""
    is_eos = completion_ids == eos_token_id
    B, L = completion_ids.shape
    eos_idx = np.full((B,), L, np.int64)
    any_eos = is_eos.any(axis=1)
    eos_idx[any_eos] = is_eos.argmax(axis=1)[any_eos]
    mask = (np.arange(L)[None, :] <= eos_idx[:, None]).astype(np.int32)
    if mask_truncated:
        mask = mask * any_eos[:, None].astype(np.int32)
    return mask


def combine_rewards(
    rewards_per_func: np.ndarray,      # [B*G, F] (NaN = reward abstained)
    reward_func_names: list[str],
    cfg: GRPOConfig,
) -> np.ndarray:
    """Positive-reinforcement gating + weighted nansum -> total rewards [B*G].
    Parity: grpo_trainer.py:909-920."""
    r = rewards_per_func.astype(np.float64).copy()
    if cfg.positive_reinforcement:
        gated = [x.strip() for x in cfg.positive_reinforcement.split(",") if x.strip()]
        acc_idx = reward_func_names.index("accuracy_reward")
        ok = r[:, acc_idx] > 0.1
        for j, name in enumerate(reward_func_names):
            if name in gated and name != "accuracy_reward":
                r[:, j] = r[:, j] * ok
    w = (np.asarray(cfg.reward_weights, np.float64)
         if cfg.reward_weights is not None else np.ones(r.shape[1]))
    return np.nansum(r * w[None, :], axis=1)


def compute_advantages(
    rewards: np.ndarray,               # [B*G] combined
    rewards_per_func: np.ndarray,      # [B*G, F] (for MAPO success ratio)
    reward_func_names: list[str],
    cfg: GRPOConfig,
) -> np.ndarray:
    """Group-normalized advantages; MAPO mixed z/percent-deviation variant.
    Parity: grpo_trainer.py:922-974."""
    G = cfg.num_generations
    rg = rewards.reshape(-1, G)
    if cfg.loss_type in ("mapo", "mapo_bnpo"):
        mu = rg.mean(axis=1, keepdims=True)
        sigma = rg.std(axis=1, keepdims=True)          # ddof=0 (unbiased=False)
        eps = np.finfo(rg.dtype).eps
        if "accuracy_reward" in reward_func_names:
            acc = rewards_per_func[:, reward_func_names.index("accuracy_reward")]
            successes = (acc.reshape(-1, G) >= 0.5).sum(axis=1, keepdims=True)
        else:
            successes = (rg >= mu).sum(axis=1, keepdims=True)
        p = successes / G
        lam = np.clip(1.0 - 4.0 * p * (1.0 - p), 0.0, 1.0)
        z = (rg - mu) / (sigma + eps)
        apd = (rg - mu) / (mu + eps)
        return ((1.0 - lam) * z + lam * apd).reshape(-1)
    mean = rg.mean(axis=1, keepdims=True)
    adv = (rg - mean).reshape(-1)
    if cfg.scale_rewards:
        std = rg.std(axis=1, ddof=1, keepdims=True)    # torch.std default ddof=1
        adv = adv / (np.repeat(std, G, axis=1).reshape(-1) + 1e-4)
    return adv


# ---------------------------------------------------------------------------
# Device-side: per-token logps and the GRPO loss
# ---------------------------------------------------------------------------

def per_token_logps(
    params, cfg: ModelConfig, input_ids, position_ids, attention_mask,
    completion_len: int, temperature: float, chunk_size: int = 1024,
    video_patches=None, video_layout=None, video_embeds=None,
    attn_impl: str = "xla", pp_mesh=None, pp_microbatches: int = 0,
    vit_attn_impl: str = "auto",
):
    """log p(token) for the last `completion_len` tokens. [B, completion_len].
    `video_embeds` short-circuits the ViT with precomputed merged embeddings
    (rollouts and loss share one vision pass per prompt). With `pp_mesh`
    (a mesh whose "pp" axis is >1) the decoder runs as a GPipe pipeline
    (parallel/pipeline.py); the [prompt_pad | completion] gap rides as
    segment ids (flash) or the mask bias (xla) per microbatch."""
    if video_embeds is not None:
        from ..models.model import merge_vision_embeddings

        h = params["model"]["embed_tokens"]["embedding"][input_ids]
        h = merge_vision_embeddings(input_ids, h, video_embeds, cfg.video_token_id)
    else:
        h = embed_inputs(params, cfg, input_ids, video_patches, video_layout,
                         vit_attn_impl=vit_attn_impl)
    cos, sin = mrope_cos_sin(position_ids, cfg, dtype=h.dtype)
    if pp_mesh is not None:
        from ..parallel.pipeline import pipeline_decoder_forward

        flash = attn_impl == "flash"
        hidden = pipeline_decoder_forward(
            params["model"], cfg.text, h, cos, sin, pp_mesh,
            num_microbatches=pp_microbatches or None,
            attn_impl="flash" if flash else "xla",
            attention_mask=attention_mask,
            # flash expresses the mid-sequence gap via segment ids over the
            # FULL kv span; xla builds the mask bias per microbatch
            kv_lengths=(jnp.full((h.shape[0],), h.shape[1], jnp.int32)
                        if flash else None),
            segment_ids=(jnp.where(attention_mask == 1, 1, -1).astype(jnp.int32)
                         if flash else None))
    elif attn_impl in ("flash", "sp"):
        # the [prompt_pad | completion] mid-sequence gap is expressed as
        # segment ids: valid tokens segment 1, pads -1 ("sp" additionally
        # shards the sequence axis — segments shard with it)
        bias = None
        seg = jnp.where(attention_mask == 1, 1, -1).astype(jnp.int32)
        hidden, _ = decoder_forward(
            params["model"], cfg.text, h, cos, sin, None,
            attn_impl=attn_impl,
            kv_lengths=jnp.full((h.shape[0],), h.shape[1], jnp.int32),
            causal=True, segment_ids=seg, remat=True)
    else:
        bias = causal_mask_bias(input_ids.shape[1], attention_mask)
        hidden, _ = decoder_forward(params["model"], cfg.text, h, cos, sin,
                                    bias, attn_impl="xla", remat=True)
    B, S, H = hidden.shape
    # hidden[t] predicts token[t+1]; completion tokens are the last C of ids
    hs = hidden[:, S - completion_len - 1: S - 1].reshape(-1, H)
    toks = input_ids[:, S - completion_len:].reshape(-1)
    from ..models.model import lm_head_weight

    w = lm_head_weight(params, cfg)
    lp = chunked_token_logprobs(hs, w, toks, temperature, chunk_size)
    return lp.reshape(B, completion_len)


def grpo_loss(
    params,
    cfg: ModelConfig,
    gcfg: GRPOConfig,
    batch: dict,
    video_layout=None,
    attn_impl: str = "xla",
    pp_mesh=None,
):
    """batch keys: input_ids [B, P+C] (prompt+completion), position_ids,
    attention_mask, completion_mask [B, C], advantages [B],
    old_per_token_logps [B, C] | None, ref_per_token_logps [B, C] | None,
    optional video_patches. Returns (loss, metrics)."""
    C = batch["completion_mask"].shape[1]
    lp = per_token_logps(
        params, cfg, batch["input_ids"], batch["position_ids"],
        batch["attention_mask"], C, gcfg.temperature, gcfg.logp_chunk_size,
        batch.get("video_patches"), video_layout,
        batch.get("video_embeds"), attn_impl,
        pp_mesh, gcfg.pp_microbatches, gcfg.vit_attn_impl)

    cmask = batch["completion_mask"].astype(jnp.float32)
    adv = batch["advantages"].astype(jnp.float32)
    old_lp = batch.get("old_per_token_logps")
    old_lp = jax.lax.stop_gradient(lp) if old_lp is None else old_lp

    if gcfg.loss_type == "gmpo":
        delta = lp - old_lp
        tok_counts = jnp.clip(cmask.sum(-1), 1.0)
        seq_log_ratio = (delta * cmask).sum(-1) / tok_counts
        coef_1 = jnp.exp(seq_log_ratio)[:, None] * jnp.ones_like(lp)
    else:
        coef_1 = jnp.exp(lp - old_lp)
    coef_2 = jnp.clip(coef_1, 1 - gcfg.epsilon_low, 1 + gcfg.epsilon_high)
    pt_loss = -jnp.minimum(coef_1 * adv[:, None], coef_2 * adv[:, None])

    metrics = {}
    if gcfg.beta != 0.0:
        ref_lp = batch["ref_per_token_logps"]
        kl = jnp.exp(ref_lp - lp) - (ref_lp - lp) - 1
        pt_loss = pt_loss + gcfg.beta * kl
        metrics["kl"] = (kl * cmask).sum() / jnp.clip(cmask.sum(), 1.0)

    if gcfg.loss_type in ("grpo", "gmpo", "mapo"):
        loss = ((pt_loss * cmask).sum(-1) / jnp.clip(cmask.sum(-1), 1.0)).mean()
    elif gcfg.loss_type in ("bnpo", "mapo_bnpo"):
        loss = (pt_loss * cmask).sum() / jnp.clip(cmask.sum(), 1.0)
    elif gcfg.loss_type == "dr_grpo":
        loss = (pt_loss * cmask).sum() / (pt_loss.shape[0] * gcfg.max_completion_length)
    else:
        raise ValueError(f"Unknown loss type: {gcfg.loss_type}")

    low = (coef_1 < 1 - gcfg.epsilon_low) & (adv[:, None] < 0)
    high = (coef_1 > 1 + gcfg.epsilon_high) & (adv[:, None] > 0)
    tot = jnp.clip(cmask.sum(), 1.0)
    metrics["clip_ratio/low"] = (low * cmask).sum() / tot
    metrics["clip_ratio/high"] = (high * cmask).sum() / tot
    metrics["clip_ratio/region"] = ((low | high) * cmask).sum() / tot
    return loss, metrics


class GRPOTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_grpo_step(cfg: ModelConfig, gcfg: GRPOConfig, optimizer,
                   video_layout=None, attn_impl: str = "xla",
                   donate: bool = True, mesh=None):
    """Build the jitted GRPO step. With a mesh, params/opt state are
    FSDP/TP-sharded (reference bar: 8-way ZeRO-3 GRPO, train_grpo.sh:41-42,
    grpo_trainer.py:329,579-585) and batches shard over (dp, fsdp); XLA
    inserts the reduce-scatter/all-gather collectives from the annotations.
    A mesh with pp>1 runs the loss forward through the GPipe pipeline."""
    pp = dict(mesh.shape).get("pp", 1) if mesh is not None else 1
    if pp > 1 and attn_impl == "sp":
        raise ValueError("pp and sp cannot combine: the sp shard_map cannot "
                         "nest inside the pp stage schedule")
    if mesh is not None and gcfg.vit_attn_impl == "auto":
        # tracer params inside the sharded jit can't be device-inspected;
        # the Pallas window kernel is single-device — same downgrade as
        # make_sft_step (SFTConfig.vit_attn_impl)
        import dataclasses

        gcfg = dataclasses.replace(gcfg, vit_attn_impl="xla")
    if getattr(cfg.text, "moe_gmm_prefill", False):
        # the GRPO loss forward always takes the einsum — same
        # conservative downgrade (and rationale) as make_sft_step
        import dataclasses

        cfg = cfg.replace(text=dataclasses.replace(
            cfg.text, moe_gmm_prefill=False))
    pp_mesh = mesh if pp > 1 else None

    def step_fn(state: GRPOTrainState, batch: dict):
        (loss, metrics), grads = jax.value_and_grad(grpo_loss, has_aux=True)(
            state.params, cfg, gcfg, batch, video_layout, attn_impl, pp_mesh)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return GRPOTrainState(params, opt_state, state.step + 1), metrics

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    if mesh is None:
        return jitted

    # sequence-parallel GRPO loss: long prompts (the reference trains 32k,
    # train_grpo.sh:24) shard over "sp"; the gap mask shards with them
    seq_axis = None
    if attn_impl == "sp":
        from ..ops.sp_attention import set_sp_context

        set_sp_context(mesh, batch_axes=("dp", "fsdp"),
                       head_axis="tp" if mesh.shape.get("tp", 1) > 1 else None)
        seq_axis = "sp" if mesh.shape.get("sp", 1) > 1 else None

    from ..parallel.sharding import batch_sharding, replicated

    def shard_batch(batch):
        # batch-divisibility validation (grpo_trainer.py:523-552 parity):
        # the B*G rollout rows must split evenly over the data axes, else
        # device_put fails with an opaque sharding error
        n_data = 1
        for ax in ("dp", "fsdp"):
            if ax in mesh.shape:
                n_data *= mesh.shape[ax]
        rows = next((np.asarray(v).shape[0] for k, v in batch.items()
                     if v is not None and k not in ("position_ids",
                                                    "video_embeds")), None)
        if rows is not None and rows % n_data:
            raise ValueError(
                f"rollout batch of {rows} rows (prompts x num_generations) "
                f"must be divisible by dp*fsdp={n_data}; adjust the prompt "
                f"batch or num_generations")
        out = {}
        for k, v in batch.items():
            if v is None:
                continue
            nd = np.asarray(v).ndim if not hasattr(v, "ndim") else v.ndim
            if k == "position_ids":          # [3, B, S] — batch is dim 1
                sh = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(None, ("dp", "fsdp"),
                                                     seq_axis))
            elif k in ("video_embeds", "video_patches", "image_patches"):
                # ragged token/patch concat across the batch, no batch dim:
                # replicate; GSPMD partitions the ViT from weight shardings
                # (same rule as make_sft_step.shard_batch)
                sh = replicated(mesh)
            elif k in ("input_ids", "attention_mask") and seq_axis:
                # full-sequence [B, P+C] tensors shard S over "sp";
                # completion-length tensors ([B, C]) stay batch-only
                sh = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(("dp", "fsdp"), seq_axis))
            else:
                sh = batch_sharding(mesh, nd)
            out[k] = jax.device_put(v, sh)
        return out

    jitted.shard_batch = shard_batch
    return jitted
