"""SFT: masked next-token cross-entropy trainer over the sharded mesh.

Parity surface: the reference SFT path (train/src/train/train_sft.py — HF
Trainer + patched forward + Liger FLCE + ZeRO-3). Here: one jitted train step
with FSDP/TP shardings on params and (dp,fsdp)-sharded batches; loss is the
chunked fused CE (ops/fused_ce.py) on shift-by-one labels with IGNORE_INDEX
masking; optimizer is the 6-group AdamW (optim.py); gradient checkpointing via
jax.checkpoint on the layer body is handled by scan remat policy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import ModelConfig
from ..models.decoder import causal_mask_bias, decoder_forward
from ..models.model import embed_inputs, lm_head
from ..models.mrope import mrope_cos_sin
from ..ops.fused_ce import IGNORE_INDEX, fused_linear_cross_entropy
from ..parallel.sharding import batch_sharding, param_shardings, replicated


@dataclass(frozen=True)
class SFTConfig:
    ce_chunk_size: int = 1024
    attn_impl: str = "xla"
    sp_impl: str = "gather"           # "gather" | "ring" (attn_impl="sp")
    gradient_checkpointing: bool = True
    pp_microbatches: int = 0          # 0 -> min(B, 2*pp) when pp>1
    vit_attn_impl: str = "auto"       # ViT attention in the embed path;
                                      # make_sft_step(mesh) downgrades
                                      # "auto" -> "xla" (the Pallas window
                                      # kernel is single-device; GSPMD
                                      # shards the xla tower)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def sft_loss(params, cfg: ModelConfig, batch: dict, scfg: SFTConfig,
             video_layout=None, image_layout=None):
    """batch: input_ids [B,S], labels [B,S] (IGNORE_INDEX-masked),
    position_ids [3,B,S], attention_mask [B,S], optional video/image patches."""
    h = embed_inputs(params, cfg, batch["input_ids"],
                     batch.get("video_patches"), video_layout,
                     batch.get("image_patches"), image_layout,
                     vit_attn_impl=scfg.vit_attn_impl)
    cos, sin = mrope_cos_sin(batch["position_ids"], cfg, dtype=h.dtype)
    mask = batch.get("attention_mask")
    if scfg.attn_impl in ("flash", "sp"):
        bias = None
        kv_lengths = (mask.sum(-1).astype(jnp.int32) if mask is not None
                      else jnp.full((h.shape[0],), h.shape[1], jnp.int32))
    else:
        bias = causal_mask_bias(batch["input_ids"].shape[1], mask)
        kv_lengths = None
    hidden, _ = decoder_forward(params["model"], cfg.text, h, cos, sin, bias,
                                attn_impl=scfg.attn_impl,
                                kv_lengths=kv_lengths, causal=True,
                                remat=scfg.gradient_checkpointing)
    # predict token t+1 from hidden t
    hs = hidden[:, :-1].reshape(-1, hidden.shape[-1])
    labels = batch["labels"][:, 1:].reshape(-1)
    from ..models.model import lm_head_weight

    w = lm_head_weight(params, cfg)
    return fused_linear_cross_entropy(hs, w, labels, scfg.ce_chunk_size)


def pipeline_sft_loss(params, cfg: ModelConfig, batch: dict, scfg: SFTConfig,
                      mesh, video_layout=None, image_layout=None):
    """sft_loss with the decoder run as a GPipe pipeline over the "pp" mesh
    axis (parallel/pipeline.py). Embedding / lm_head / CE stay outside the
    pipeline, replicated over pp."""
    h = embed_inputs(params, cfg, batch["input_ids"],
                     batch.get("video_patches"), video_layout,
                     batch.get("image_patches"), image_layout,
                     vit_attn_impl=scfg.vit_attn_impl)
    cos, sin = mrope_cos_sin(batch["position_ids"], cfg, dtype=h.dtype)
    from ..parallel.pipeline import pipeline_decoder_forward

    hidden = pipeline_decoder_forward(
        params["model"], cfg.text, h, cos, sin, mesh,
        num_microbatches=scfg.pp_microbatches or None,
        attn_impl="flash" if scfg.attn_impl == "flash" else "xla",
        attention_mask=batch.get("attention_mask"),
        remat=scfg.gradient_checkpointing)
    hs = hidden[:, :-1].reshape(-1, hidden.shape[-1])
    labels = batch["labels"][:, 1:].reshape(-1)
    from ..models.model import lm_head_weight

    w = lm_head_weight(params, cfg)
    return fused_linear_cross_entropy(hs, w, labels, scfg.ce_chunk_size)


def make_sft_step(cfg: ModelConfig, scfg: SFTConfig, optimizer, mesh=None,
                  video_layout=None, image_layout=None, donate: bool = True):
    """Build the jitted train step. With a mesh, params/opt state are
    FSDP/TP-sharded and batches are (dp,fsdp)-sharded; XLA inserts the
    reduce-scatter/all-gather collectives. A mesh with pp>1 runs the decoder
    through the GPipe pipeline (parallel/pipeline.py)."""
    pp = dict(mesh.shape).get("pp", 1) if mesh is not None else 1
    if pp > 1 and scfg.attn_impl == "sp":
        raise ValueError("pp and sp cannot combine: the sp shard_map cannot "
                         "nest inside the pp stage schedule")
    if getattr(cfg.text, "moe_gmm_prefill", False):
        # training always takes the einsum: the SHARDED GMM and the
        # int8/W8A8 variants have no VJP (the float single-device path
        # does — ops/moe_gmm.gmm_expert_ffn_diff — but this builder can't
        # see the weights, so it stays conservative; custom loops can call
        # moe_mlp(gmm_prefill=True) directly for exact GMM training)
        import dataclasses

        cfg = cfg.replace(text=dataclasses.replace(
            cfg.text, moe_gmm_prefill=False))
    if mesh is not None and scfg.vit_attn_impl == "auto":
        import dataclasses

        scfg = dataclasses.replace(scfg, vit_attn_impl="xla")

    def loss_fn(params, batch):
        if pp > 1:
            return pipeline_sft_loss(params, cfg, batch, scfg, mesh,
                                     video_layout, image_layout)
        return sft_loss(params, cfg, batch, scfg, video_layout, image_layout)

    def step_fn(state: TrainState, batch: dict):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    # sequence (context) parallelism: register the SP context so the
    # decoder's attention dispatch can cross shard boundaries, and shard
    # the batch's sequence dim over "sp" (everything but attention is
    # elementwise along S and shards for free under GSPMD)
    sp = mesh.shape.get("sp", 1) if scfg.attn_impl == "sp" else 1
    if scfg.attn_impl == "sp":
        from ..ops.sp_attention import set_sp_context

        set_sp_context(mesh, batch_axes=("dp", "fsdp"),
                       head_axis="tp" if mesh.shape.get("tp", 1) > 1 else None,
                       sp_impl=scfg.sp_impl)
    seq_axis = "sp" if sp > 1 else None

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    jitted.shard_batch = make_batch_sharder(mesh, seq_axis)
    return jitted


def make_batch_sharder(mesh, seq_axis=None):
    """Place a train batch on the mesh: batch dims over (dp, fsdp), the
    sequence dim over `seq_axis` when sequence parallelism is on,
    position_ids' [3, B, S] layout special-cased, and ragged vision patch
    concats replicated (GSPMD partitions the ViT compute from the weight
    shardings — the reference always trains the tower under ZeRO-3,
    train_sft.py:124-129). Shared by the full-parameter and LoRA steps."""

    def shard_batch(batch):
        def sharding_for(k, v):
            if k == "position_ids":  # [3, B, S]: batch is dim 1
                return jax.sharding.NamedSharding(
                    mesh,
                    jax.sharding.PartitionSpec(None, ("dp", "fsdp"), seq_axis))
            if k in ("video_patches", "image_patches"):
                return replicated(mesh)
            nd = np.asarray(v).ndim
            if nd >= 2 and seq_axis is not None:  # [B, S, ...] token-led
                return jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(
                        ("dp", "fsdp"), seq_axis, *([None] * (nd - 2))))
            return batch_sharding(mesh, nd)

        return {k: jax.device_put(v, sharding_for(k, v))
                for k, v in batch.items()}

    return shard_batch


def init_train_state(params, optimizer, mesh=None) -> TrainState:
    if mesh is not None:
        from ..parallel.sharding import shard_params

        params = shard_params(params, mesh)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))
