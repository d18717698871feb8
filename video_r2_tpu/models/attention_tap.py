"""Attention tap: last-layer attention mass from generated tokens to video
tokens.

The paper's quantitative VAS variant (eval/README.md:38: "mean attention of
generated tokens over video tokens, last layer, averaged across heads") is
absent from the shipped reference code (SURVEY §2.3 notes the naming-bug
placeholder); BASELINE requires it as a first-class capability. Flash/paged
kernels never materialize probabilities, so this runs a dedicated eager pass
over ONLY the last decoder layer: recompute its q/k with rotary, softmax in
fp32, and reduce the probability mass landing on video-token key positions —
no [S, S] materialization beyond one layer, no generation-path slowdown.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .decoder import causal_mask_bias, decoder_forward
from .layers import apply_rotary, linear, rms_norm
from .model import embed_inputs, merge_vision_embeddings
from .mrope import mrope_cos_sin


def attention_to_video_scores(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,          # [B, S] full prompt+completion sequence
    position_ids: jax.Array,       # [3, B, S]
    attention_mask: jax.Array,     # [B, S] 1 = valid
    query_mask: jax.Array,         # [B, S] 1 = generated-token queries
    video_mask: jax.Array | None = None,  # [B, S] 1 = video keys
                                   # (default: input_ids == video_token_id)
    video_embeds: jax.Array | None = None,
    video_patches=None,
    video_layout=None,
) -> jax.Array:
    """[B] mean (over generated tokens and heads) attention mass on video
    tokens in the LAST decoder layer."""
    tcfg = cfg.text
    if video_mask is None:
        video_mask = (input_ids == cfg.video_token_id).astype(jnp.int32)

    if video_embeds is not None:
        h = params["model"]["embed_tokens"]["embedding"][input_ids]
        h = merge_vision_embeddings(input_ids, h, video_embeds,
                                    cfg.video_token_id)
    else:
        h = embed_inputs(params, cfg, input_ids, video_patches, video_layout)
    cos, sin = mrope_cos_sin(position_ids, cfg, dtype=h.dtype)
    bias = causal_mask_bias(input_ids.shape[1], attention_mask)

    layers = params["model"]["layers"]
    L = tcfg.num_hidden_layers
    last = jax.tree_util.tree_map(lambda a: a[L - 1], layers)

    # run layers [0, L-1) keeping the raw residual stream (no final norm)
    from .decoder import _layer

    def body(x, p):
        x, _ = _layer(p, x, cos, sin, bias, tcfg)
        return x, None

    head = jax.tree_util.tree_map(lambda a: a[: L - 1], layers)
    x, _ = jax.lax.scan(body, h, head)

    # last layer attention probabilities
    B, S, _ = x.shape
    nh, kh, hd = tcfg.num_attention_heads, tcfg.num_key_value_heads, tcfg.head_dim
    g = nh // kh
    hn = rms_norm(last["input_layernorm"]["scale"], x, tcfg.rms_norm_eps)
    q = linear(last["attn"]["q"], hn).reshape(B, S, nh, hd)
    k = linear(last["attn"]["k"], hn).reshape(B, S, kh, hd)
    q, k = apply_rotary(q, k, cos[:, :, None, :], sin[:, :, None, :])
    qg = q.reshape(B, S, kh, g, hd)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    scores = scores + bias[:, :, None].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)          # [B, kh, g, Sq, Sk]

    vmass = jnp.einsum("bhgqk,bk->bhgq", probs,
                       video_mask.astype(jnp.float32))  # [B, kh, g, Sq]
    vmass = vmass.mean(axis=(1, 2))                     # over heads -> [B, Sq]
    qm = query_mask.astype(jnp.float32)
    return (vmass * qm).sum(-1) / jnp.clip(qm.sum(-1), 1.0)
