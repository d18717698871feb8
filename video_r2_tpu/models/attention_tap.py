"""Attention tap: last-layer attention mass from generated tokens to video
tokens.

The paper's quantitative VAS variant (eval/README.md:38: "mean attention of
generated tokens over video tokens, last layer, averaged across heads") is
absent from the shipped reference code (SURVEY §2.3 notes the naming-bug
placeholder); BASELINE requires it as a first-class capability. Flash/paged
kernels never materialize probabilities, so this runs a dedicated eager pass
over ONLY the last decoder layer — and never the [S, S] probability matrix:
queries are restricted to a trailing window (the generated tokens) and keys
stream through a flash-style online-softmax scan in fixed chunks, so peak
memory is O(W x key_chunk x heads) even at the 128-frame eval shape
(S ≈ 33k, where a full last-layer probs tensor would be ~120 GB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .decoder import causal_mask_bias, decoder_forward
from .layers import apply_rotary, linear, rms_norm
from .model import embed_inputs, merge_vision_embeddings
from .mrope import mrope_cos_sin

NEG_INF = -1e30


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
    completion_window: int | None = None,  # static: query rows = last W cols
                                   # (None = all rows; pass the completion
                                   # budget, e.g. 1024, at eval scale)
    key_chunk: int = 2048,         # static: online-softmax key chunk
    attn_impl: str = "xla",        # "flash" at eval scale: the layers-[0,L-1)
                                   # pass must not materialize [S, S] either
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

    layers = params["model"]["layers"]
    L = tcfg.num_hidden_layers
    last = jax.tree_util.tree_map(lambda a: a[L - 1], layers)

    # run layers [0, L-1) keeping the raw residual stream (no final norm)
    from .decoder import _layer

    B, S, _ = h.shape
    if attn_impl == "flash":
        bias = None
        kv_lengths = attention_mask.sum(-1).astype(jnp.int32)

        def body(x, p):
            x, _ = _layer(p, x, cos, sin, None, tcfg, attn_impl="flash",
                          kv_lengths=kv_lengths, causal=True)
            return x, None
    else:
        bias = causal_mask_bias(S, attention_mask)

        def body(x, p):
            x, _ = _layer(p, x, cos, sin, bias, tcfg)
            return x, None

    head = jax.tree_util.tree_map(lambda a: a[: L - 1], layers)
    x, _ = jax.lax.scan(body, h, head)

    # last layer attention probabilities, streamed: queries = trailing window
    # of W rows, keys in chunks with flash-style (m, l, n) accumulation where
    # n additionally carries the video-mask-weighted probability numerator.
    nh, kh, hd = tcfg.num_attention_heads, tcfg.num_key_value_heads, tcfg.head_dim
    g = nh // kh
    W = S if completion_window is None else min(completion_window, S)
    hn = rms_norm(last["input_layernorm"]["scale"], x, tcfg.rms_norm_eps)
    q = linear(last["attn"]["q"], hn[:, S - W:]).reshape(B, W, nh, hd)
    k = linear(last["attn"]["k"], hn).reshape(B, S, kh, hd)
    # rotary with per-tensor position slices: queries use the window's
    # cos/sin rows, keys the full-sequence rows
    q, _ = apply_rotary(q, q, cos[:, S - W:, None, :], sin[:, S - W:, None, :])
    _, k = apply_rotary(k, k, cos[:, :, None, :], sin[:, :, None, :])
    qg = q.reshape(B, W, kh, g, hd).astype(jnp.float32)
    scale = hd ** -0.5

    ck = min(key_chunk, S)
    nc = -(-S // ck)
    Sp = nc * ck
    pad = Sp - S
    k_pad = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    valid_pad = jnp.pad(attention_mask.astype(bool), ((0, 0), (0, pad)))
    vmask_pad = jnp.pad(video_mask.astype(jnp.float32), ((0, 0), (0, pad)))
    k_chunks = k_pad.reshape(B, nc, ck, kh, hd).transpose(1, 0, 2, 3, 4)
    valid_chunks = valid_pad.reshape(B, nc, ck).transpose(1, 0, 2)
    vmask_chunks = vmask_pad.reshape(B, nc, ck).transpose(1, 0, 2)

    abs_q = (S - W) + jnp.arange(W)                    # absolute query rows

    def chunk_body(carry, inp):
        m, l, n = carry                                # each [B, kh, g, W]
        k_c, valid_c, v_c, c_idx = inp
        s = jnp.einsum("bwhgd,bkhd->bhgwk", qg, k_c.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        jpos = c_idx * ck + jnp.arange(ck)
        allowed = (jpos[None, None, :] <= abs_q[None, :, None]) \
            & valid_c[:, None, :]                      # [B, W, ck]
        s = jnp.where(allowed[:, None, None], s, NEG_INF)
        m_new = jnp.maximum(m, s.max(-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l * alpha + p.sum(-1)
        n_new = n * alpha + jnp.einsum("bhgwk,bk->bhgw", p, v_c)
        return (m_new, l_new, n_new), None

    init = (jnp.full((B, kh, g, W), NEG_INF, jnp.float32),
            jnp.zeros((B, kh, g, W), jnp.float32),
            jnp.zeros((B, kh, g, W), jnp.float32))
    (m, l, n), _ = jax.lax.scan(
        chunk_body, init,
        (k_chunks, valid_chunks, vmask_chunks, jnp.arange(nc)))

    vmass = n / jnp.clip(l, 1e-30)                     # [B, kh, g, W]
    vmass = vmass.mean(axis=(1, 2))                    # over heads -> [B, W]
    qm = query_mask[:, S - W:].astype(jnp.float32)
    return (vmass * qm).sum(-1) / jnp.clip(qm.sum(-1), 1.0)
