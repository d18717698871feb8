"""Full Qwen2.5-VL multimodal model: ViT + embedding merge + M-RoPE decoder.

The reference's in-repo definition of this forward is the monkey patch
(train/src/train/monkey_patch_forward.py:329-493): ViT over pixel values,
masked_scatter of vision embeds into <|image_pad|>/<|video_pad|> slots,
get_rope_index positions, decoder, LM head. Here the scatter is a
cumsum-gather (XLA-friendly, no data-dependent shapes) and positions come from
the host planner (mrope.get_rope_index).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .decoder import KVCache, causal_mask_bias, decoder_forward
from .mrope import mrope_cos_sin
from .vision import VisionLayout, plan_vision_layout, vit_forward


def merge_vision_embeddings(
    input_ids: jax.Array,     # [B, S]
    text_embeds: jax.Array,   # [B, S, H]
    vision_embeds: jax.Array,  # [N, H] concatenated in scan order
    token_id: int,
) -> jax.Array:
    """Place vision embeddings into their pad-token slots.

    Equivalent to torch masked_scatter over the batch-flattened sequence
    (monkey_patch_forward.py:372-406) but expressed as cumsum + gather.
    """
    B, S, H = text_embeds.shape
    mask = (input_ids == token_id).reshape(-1)
    pos = jnp.cumsum(mask) - 1
    pos = jnp.clip(pos, 0, vision_embeds.shape[0] - 1)
    gathered = vision_embeds[pos].reshape(B, S, H)
    return jnp.where(mask.reshape(B, S, 1), gathered.astype(text_embeds.dtype),
                     text_embeds)


def validate_vision_tokens(
    input_ids,
    cfg: ModelConfig,
    n_video_features: int = 0,
    n_image_features: int = 0,
) -> None:
    """Host-side invariant: pad-token count must equal vision feature count
    (reference raises the same way — monkey_patch_forward.py:375-398).
    Call from the data/engine layer before handing arrays to the jitted step."""
    import numpy as np

    ids = np.asarray(input_ids)
    n_vid = int((ids == cfg.video_token_id).sum())
    n_img = int((ids == cfg.image_token_id).sum())
    if n_video_features and n_vid != n_video_features:
        raise ValueError(
            f"Video features and video tokens do not match: tokens {n_vid}, "
            f"features {n_video_features}")
    if n_image_features and n_img != n_image_features:
        raise ValueError(
            f"Image features and image tokens do not match: tokens {n_img}, "
            f"features {n_image_features}")


def embed_inputs(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    video_patches: jax.Array | None = None,
    video_layout: VisionLayout | None = None,
    image_patches: jax.Array | None = None,
    image_layout: VisionLayout | None = None,
    vit_attn_impl: str = "auto",
) -> jax.Array:
    """Token embeddings with vision features merged into pad slots.

    This is the TRAINING/loss embed path (SFT differentiates through the
    ViT). attn_impl="auto" picks the fused Pallas window kernel on TPU —
    both it and the flash full-attention groups carry custom recompute VJPs
    (ops/vit_window_attention.py, ops/flash.py), so an unfrozen vision
    tower (vision_lr, train_sft.sh:56) trains through the fast kernels the
    same way the reference trains through FlashAttention-2's backward."""
    h = params["model"]["embed_tokens"]["embedding"][input_ids]
    if video_patches is not None:
        vemb = vit_forward(params["visual"], cfg.vision, video_patches,
                           video_layout, attn_impl=vit_attn_impl, remat=True)
        h = merge_vision_embeddings(input_ids, h, vemb, cfg.video_token_id)
    if image_patches is not None:
        iemb = vit_forward(params["visual"], cfg.vision, image_patches,
                           image_layout, attn_impl=vit_attn_impl, remat=True)
        h = merge_vision_embeddings(input_ids, h, iemb, cfg.image_token_id)
    return h


def lm_head_weight(params: dict, cfg: ModelConfig) -> jax.Array:
    """Dense [H, V] head weight (dequantized if the head is int8) for the
    chunked CE/logprob ops."""
    if cfg.text.tie_word_embeddings:
        return params["model"]["embed_tokens"]["embedding"].T
    head = params["lm_head"]
    if "kernel" in head:
        return head["kernel"]
    return (head["kernel_q"].astype(jnp.float32)
            * head["scale"][None, :]).astype(jnp.bfloat16)


def lm_head(params: dict, cfg: ModelConfig, hidden: jax.Array,
            act_quant: str | None = None) -> jax.Array:
    if cfg.text.tie_word_embeddings:
        w = params["model"]["embed_tokens"]["embedding"].T
        return jnp.einsum("...h,hv->...v", hidden, w)
    from .layers import linear

    return linear(params["lm_head"], hidden, act_quant)


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,               # [B, S]
    position_ids: jax.Array,            # [3, B, S] from mrope.get_rope_index
    attention_mask: jax.Array | None = None,  # [B, S] 1=valid
    video_patches: jax.Array | None = None,
    video_layout: VisionLayout | None = None,
    image_patches: jax.Array | None = None,
    image_layout: VisionLayout | None = None,
    cache: KVCache | None = None,
    cache_position: int = 0,
    attn_impl: str = "xla",
    return_hidden: bool = False,
    mesh=None,                          # sharded scoring: MoE ragged decode
                                        # needs it (short sequences would
                                        # otherwise trace the single-device
                                        # ragged kernel on sharded weights)
) -> tuple[jax.Array, KVCache | None]:
    """Full forward. Returns (logits [B,S,V] or hidden [B,S,H], cache)."""
    if not isinstance(input_ids, jax.core.Tracer):
        validate_vision_tokens(
            input_ids, cfg,
            n_video_features=(video_layout.seq_len_real // cfg.vision.spatial_merge_unit
                              if video_layout is not None else 0),
            n_image_features=(image_layout.seq_len_real // cfg.vision.spatial_merge_unit
                              if image_layout is not None else 0))
    h = embed_inputs(params, cfg, input_ids, video_patches, video_layout,
                     image_patches, image_layout)
    cos, sin = mrope_cos_sin(position_ids, cfg, dtype=h.dtype)
    bias = causal_mask_bias(input_ids.shape[1], attention_mask)
    h, cache = decoder_forward(params["model"], cfg.text, h, cos, sin, bias,
                               cache=cache, cache_position=cache_position,
                               attn_impl=attn_impl, cache_fill=True,
                               mesh=mesh)
    if return_hidden:
        return h, cache
    return lm_head(params, cfg, h), cache
