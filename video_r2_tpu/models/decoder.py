"""Qwen2.5-VL text decoder (functional JAX, scan-over-layers).

TPU-first structure: all 28 layers' weights are stacked on a leading axis and
the layer loop is a `lax.scan` — one compiled layer body, FSDP-shardable
stacked params, O(1) compile time in depth. The KV cache is likewise a stacked
[L, B, Smax, kv_heads, head_dim] pair carried through the scan, updated with
`dynamic_update_slice` at `cache_position` (static-shape decode).

Attention runs through ops.attention.dot_product_attention, which dispatches
between a pure-XLA reference path and the Pallas flash kernel.

Behavioral spec: HF Qwen2_5_VLTextModel / Qwen2_5_VLAttention (GQA, bias on
qkv, rotary applied to q/k in fp32, fp32 softmax).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .config import TextConfig
from .layers import apply_rotary, linear, rms_norm, swiglu_mlp


class KVCache(NamedTuple):
    k: jax.Array  # [L, B, Smax, kv_heads, head_dim]
    v: jax.Array

    @classmethod
    def init(cls, cfg: TextConfig, batch: int, max_len: int, dtype) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, max_len,
                 cfg.num_key_value_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class QuantKVCache(NamedTuple):
    """int8-quantized KV cache (per-token, per-head absmax scales).

    Halves decode KV-read traffic and cache HBM footprint vs bf16 — the
    enabler for batch-256 decode on one 16 GB v5e (bf16 KV at B=256 does not
    fit next to the int8 7B weights). Dequant (convert + broadcast multiply)
    fuses into the attention matmul operand, so no dequantized copy
    materializes — same fusion XLA applies to int8 weight matmuls.
    """

    k: jax.Array        # [L, B, Smax, kh, hd] int8
    v: jax.Array
    k_scale: jax.Array  # [L, B, Smax, kh] float32
    v_scale: jax.Array

    @classmethod
    def init(cls, cfg: TextConfig, batch: int, max_len: int,
             dtype=None) -> "QuantKVCache":
        shape = (cfg.num_hidden_layers, batch, max_len,
                 cfg.num_key_value_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                   jnp.zeros(shape[:-1], jnp.float32),
                   jnp.zeros(shape[:-1], jnp.float32))


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., hd] -> (int8 values, float32 absmax scale over hd)."""
    x32 = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1), 1e-8) / 127.0
    q = jnp.round(x32 / s[..., None]).astype(jnp.int8)
    return q, s


class DecodeKVCache(NamedTuple):
    """Head-major stacked cache [L, B, kh, Smax, hd] for the batch-decode
    Pallas kernel (ops/decode_attention.py): one (layer, batch, head) slice
    is a contiguous [Smax, hd] run the kernel DMAs block-by-block — the
    stacked buffer never leaves HBM, no per-layer slice materialization
    (the measured ~100 MB/layer copy the seq-major XLA path pays at B=128)."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def init(cls, cfg: TextConfig, batch: int, max_len: int,
             dtype) -> "DecodeKVCache":
        shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads,
                 max_len, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _mlp(p_mlp: dict, h, cfg: TextConfig, act_quant=None, mesh=None):
    """Dense SwiGLU or sparse MoE (a "router" key marks MoE layers —
    Qwen3-MoE judge family, models/moe.py). mesh routes MoE ragged decode
    through its ep x tp shard_map (sharded judge serving)."""
    if "router" in p_mlp:
        from .moe import moe_mlp

        return moe_mlp(p_mlp, h, cfg.num_experts_per_tok, cfg.norm_topk_prob,
                       capacity_factor=cfg.moe_capacity_factor,
                       group_size=cfg.moe_group_size, act_quant=act_quant,
                       ragged_decode=cfg.moe_ragged_decode, mesh=mesh,
                       gmm_prefill=getattr(cfg, "moe_gmm_prefill", False))
    return swiglu_mlp(p_mlp, h, act_quant)


def _qk_norm(p_attn: dict, q, k, cfg: TextConfig):
    """Qwen3-family per-head q/k RMS norm (before rotary)."""
    if "q_norm" in p_attn:
        q = rms_norm(p_attn["q_norm"]["scale"], q, cfg.rms_norm_eps)
        k = rms_norm(p_attn["k_norm"]["scale"], k, cfg.rms_norm_eps)
    return q, k


def _layer(p, x, cos, sin, mask_bias, cfg: TextConfig, cache_kv=None,
           cache_position=None, layer_idx=None, attn_impl: str = "xla",
           kv_lengths=None, causal: bool = False, segment_ids=None,
           act_quant: str | None = None, head_major_fill: bool = False,
           mesh=None):
    """One decoder layer. With a cache, cache_kv is the FULL stacked
    (k, v) [L, B, Smax, kh, hd] pair carried through the layer scan; the new
    token rows are written in place (dynamic-update-slice on the scan carry —
    XLA aliases loop-state updates, so no per-step copy of the multi-GB cache,
    which a per-layer xs/ys cache costs). Returns (x, (k_stack, v_stack))."""
    B, S, _ = x.shape
    nh, kh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    h = rms_norm(p["input_layernorm"]["scale"], x, cfg.rms_norm_eps)
    pq = None
    if (act_quant == "int8" and "kernel_q" in p["attn"]["q"]
            and p["attn"]["q"]["kernel_q"].ndim == 2):
        from .layers import quantize_act

        pq = quantize_act(h)  # q/k/v share one activation quantization
    q = linear(p["attn"]["q"], h, act_quant, pq).reshape(B, S, nh, hd)
    k = linear(p["attn"]["k"], h, act_quant, pq).reshape(B, S, kh, hd)
    v = linear(p["attn"]["v"], h, act_quant, pq).reshape(B, S, kh, hd)
    q, k = _qk_norm(p["attn"], q, k, cfg)
    q, k = apply_rotary(q, k, cos[:, :, None, :], sin[:, :, None, :])

    if cache_kv is not None and layer_idx is None and head_major_fill:
        # head-major fill (batch prefill for the decode kernel): per-layer
        # [B, kh, Smax, hd] cache rides the scan as xs/ys; attention runs
        # over the LOCAL prompt-width k/v (equivalent under the prefix mask
        # and cheaper than attending over the padded cache width).
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(
            ck, k.swapaxes(1, 2).astype(ck.dtype), (0, 0, cache_position, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, v.swapaxes(1, 2).astype(cv.dtype), (0, 0, cache_position, 0))
        k_all, v_all, new_kv = k, v, (ck, cv)
    elif cache_kv is not None and layer_idx is None and len(cache_kv) == 4:
        # int8-quantized fill: store quantized values + scales, attend over
        # the LOCAL bf16 k/v (full-precision prefill attention)
        ck, cv, ksc, vsc = cache_kv
        kq, ks_new = quantize_kv(k)
        vq, vs_new = quantize_kv(v)
        ck = jax.lax.dynamic_update_slice(ck, kq, (0, cache_position, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, vq, (0, cache_position, 0, 0))
        ksc = jax.lax.dynamic_update_slice(ksc, ks_new, (0, cache_position, 0))
        vsc = jax.lax.dynamic_update_slice(vsc, vs_new, (0, cache_position, 0))
        k_all, v_all, new_kv = k, v, (ck, cv, ksc, vsc)
    elif cache_kv is not None and layer_idx is None:
        # fill mode (prefill): per-layer [B, Smax, kh, hd] cache rides the
        # layer scan as xs/ys. The zeros-initialized input lets XLA fold
        # DUS-into-zeros to a pad — no cache read traffic.
        ck, cv = cache_kv
        if isinstance(cache_position, jax.Array) and cache_position.ndim == 1:
            b_idx = jnp.arange(B)
            ck = ck.at[b_idx, cache_position].set(k[:, 0])
            cv = cv.at[b_idx, cache_position].set(v[:, 0])
        else:
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                              (0, cache_position, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                              (0, cache_position, 0, 0))
        k_all, v_all, new_kv = ck, cv, (ck, cv)
    elif cache_kv is not None and len(cache_kv) == 4:
        # int8-quantized decode: write the new token quantized, dequantize
        # the layer slice into the attention operand (fused, no copy)
        ck, cv, ksc, vsc = cache_kv
        kq, ks_new = quantize_kv(k)
        vq, vs_new = quantize_kv(v)
        if isinstance(cache_position, jax.Array) and cache_position.ndim == 1:
            # per-sample positions: multi-token frontier scatters (S > 1,
            # speculative-decode verify chunks — row b's W tokens land at
            # [pos_b, pos_b + W)) or single-token continuous decode (S == 1)
            b_idx = jnp.arange(B)
            pos = cache_position[:, None] + jnp.arange(S)[None, :]
            ck = ck.at[layer_idx, b_idx[:, None], pos].set(kq)
            cv = cv.at[layer_idx, b_idx[:, None], pos].set(vq)
            ksc = ksc.at[layer_idx, b_idx[:, None], pos].set(ks_new)
            vsc = vsc.at[layer_idx, b_idx[:, None], pos].set(vs_new)
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, kq[None], (layer_idx, 0, cache_position, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vq[None], (layer_idx, 0, cache_position, 0, 0))
            ksc = jax.lax.dynamic_update_slice(
                ksc, ks_new[None], (layer_idx, 0, cache_position, 0))
            vsc = jax.lax.dynamic_update_slice(
                vsc, vs_new[None], (layer_idx, 0, cache_position, 0))
        from ..ops.attention import quant_dot_product_attention

        attn = quant_dot_product_attention(
            q,
            jax.lax.dynamic_index_in_dim(ck, layer_idx, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(ksc, layer_idx, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(cv, layer_idx, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(vsc, layer_idx, 0, keepdims=False),
            mask_bias)
        x = x + linear(p["attn"]["o"], attn.reshape(B, S, nh * hd), act_quant)
        h = rms_norm(p["post_attention_layernorm"]["scale"], x, cfg.rms_norm_eps)
        return x + _mlp(p["mlp"], h, cfg, act_quant, mesh), (ck, cv, ksc, vsc)
    elif cache_kv is not None:
        ck, cv = cache_kv
        if (isinstance(cache_position, jax.Array) and cache_position.ndim == 1
                and S > 1):
            # per-sample multi-token write (speculative-decode verify chunks:
            # row b's W tokens land at [pos_b, pos_b + W))
            b_idx = jnp.arange(B)
            pos = cache_position[:, None] + jnp.arange(S)[None, :]
            ck = ck.at[layer_idx, b_idx[:, None], pos].set(k.astype(ck.dtype))
            cv = cv.at[layer_idx, b_idx[:, None], pos].set(v.astype(cv.dtype))
        elif isinstance(cache_position, jax.Array) and cache_position.ndim == 1:
            # per-sample positions (continuous-batching decode, S==1)
            b_idx = jnp.arange(B)
            ck = ck.at[layer_idx, b_idx, cache_position].set(k[:, 0])
            cv = cv.at[layer_idx, b_idx, cache_position].set(v[:, 0])
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, k[None].astype(ck.dtype), (layer_idx, 0, cache_position, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v[None].astype(cv.dtype), (layer_idx, 0, cache_position, 0, 0))
        k_all = jax.lax.dynamic_index_in_dim(ck, layer_idx, 0, keepdims=False)
        v_all = jax.lax.dynamic_index_in_dim(cv, layer_idx, 0, keepdims=False)
        new_kv = (ck, cv)
    else:
        k_all, v_all, new_kv = k, v, (k, v)

    attn = dot_product_attention(q, k_all, v_all, bias=mask_bias,
                                 kv_lengths=kv_lengths, causal=causal,
                                 segment_ids=segment_ids, impl=attn_impl,
                                 mesh=mesh)
    x = x + linear(p["attn"]["o"], attn.reshape(B, S, nh * hd), act_quant)
    h = rms_norm(p["post_attention_layernorm"]["scale"], x, cfg.rms_norm_eps)
    return x + _mlp(p["mlp"], h, cfg, act_quant, mesh), new_kv


def _has_stacked_q4(layers: dict) -> bool:
    def walk(node):
        if isinstance(node, dict):
            if "kernel_q4" in node:
                return True
            return any(walk(v) for v in node.values())
        return False
    return walk(layers)


def _stacked_quant_view(layers: dict, l: jax.Array) -> dict:
    """Per-layer parameter view for the index-scan decode body: int4 weight
    stacks stay whole (tagged with the traced layer index for the stacked
    Pallas matmul); every other leaf is dynamically indexed at l (fuses into
    its consumer — these are small: norms, biases, int8 stacks, LoRA)."""
    def walk(node):
        if isinstance(node, dict):
            if "kernel_q4" in node:
                out = {}
                for k, v in node.items():
                    if k in ("kernel_q4", "scale4"):
                        out[k] = v
                    else:
                        out[k] = jax.lax.dynamic_index_in_dim(
                            v, l, 0, keepdims=False)
                out["_layer_idx"] = l
                return out
            return {k: walk(v) for k, v in node.items()}
        return jax.lax.dynamic_index_in_dim(node, l, 0, keepdims=False)
    return walk(layers)


def decoder_forward(
    params: dict,
    cfg: TextConfig,
    hidden: jax.Array,            # [B, S, H] input embeddings
    cos: jax.Array,               # [B, S, head_dim] (mrope-combined)
    sin: jax.Array,
    mask_bias: jax.Array | None,  # [B, 1, S, Skv] additive, or None
    cache: KVCache | None = None,
    cache_position: jax.Array | int = 0,
    attn_impl: str = "xla",
    kv_lengths: jax.Array | None = None,  # [B], enables the flash path
    causal: bool = False,
    segment_ids: jax.Array | None = None,  # [B, S] packed/gap masking (flash)
    remat: bool = False,                  # gradient checkpointing per layer
    cache_fill: bool = False,             # prefill: build the cache via xs/ys
    act_quant: str | None = None,         # "int8": W8A8 on the integer MXU
    mesh=None,                            # TP serving: flash prefill runs
                                          # head-sharded in a shard_map
) -> tuple[jax.Array, KVCache | None]:
    """Run the stacked decoder. Returns (final hidden [B,S,H], updated cache).

    remat=True rematerializes each layer on the backward pass (the reference's
    --gradient_checkpointing, train_sft.sh:62) — activation memory drops from
    O(L x S x H) to O(S x H) at ~33% extra forward FLOPs."""
    layers = params["layers"]

    if cache is None:
        def body(x, p):
            x, _ = _layer(p, x, cos, sin, mask_bias, cfg, attn_impl=attn_impl,
                          kv_lengths=kv_lengths, causal=causal,
                          segment_ids=segment_ids, act_quant=act_quant,
                          mesh=mesh)
            return x, None

        if remat:
            body = jax.checkpoint(body)
        hidden, _ = jax.lax.scan(body, hidden, layers)
        new_cache = None
    elif cache_fill and isinstance(cache, QuantKVCache):
        def body(x, inp):
            p, ck, cv, ksc, vsc = inp
            x, new_kv = _layer(p, x, cos, sin, mask_bias, cfg,
                               cache_kv=(ck, cv, ksc, vsc),
                               cache_position=cache_position,
                               attn_impl=attn_impl,
                               kv_lengths=kv_lengths, causal=causal,
                               segment_ids=segment_ids,
                               act_quant=act_quant, mesh=mesh)
            return x, new_kv

        hidden, ys = jax.lax.scan(body, hidden, (layers, *cache))
        new_cache = QuantKVCache(*ys)
    elif cache_fill:
        head_major = isinstance(cache, DecodeKVCache)

        def body(x, inp):
            p, ck, cv = inp
            x, (nk, nv) = _layer(p, x, cos, sin, mask_bias, cfg,
                                 cache_kv=(ck, cv),
                                 cache_position=cache_position,
                                 attn_impl=attn_impl,
                                 kv_lengths=kv_lengths, causal=causal,
                                 segment_ids=segment_ids,
                                 act_quant=act_quant,
                                 head_major_fill=head_major, mesh=mesh)
            return x, (nk, nv)

        hidden, (ks, vs) = jax.lax.scan(body, hidden,
                                        (layers, cache.k, cache.v))
        new_cache = (DecodeKVCache if head_major else KVCache)(ks, vs)
    elif isinstance(cache, QuantKVCache):
        n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]

        def body(carry, inp):
            x, ck, cv, ksc, vsc = carry
            l, p = inp
            x, new_kv = _layer(p, x, cos, sin, mask_bias, cfg,
                               cache_kv=(ck, cv, ksc, vsc),
                               cache_position=cache_position,
                               layer_idx=l, attn_impl=attn_impl,
                               kv_lengths=kv_lengths, causal=causal,
                               act_quant=act_quant, mesh=mesh)
            return (x, *new_kv), None

        (hidden, *ys), _ = jax.lax.scan(
            body, (hidden, *cache), (jnp.arange(n_layers), layers))
        new_cache = QuantKVCache(*ys)
    else:
        n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]

        if _has_stacked_q4(layers):
            # int4 decode: keep the packed weight stacks WHOLE and scan over
            # layer indices; linear() streams tiles of the [L, K/2, N]
            # buffers via the scalar-prefetch Pallas kernel (no slice copy).
            def body(carry, l):
                x, ck, cv = carry
                p = _stacked_quant_view(layers, l)
                x, (ck, cv) = _layer(p, x, cos, sin, mask_bias, cfg,
                                     cache_kv=(ck, cv),
                                     cache_position=cache_position,
                                     layer_idx=l, attn_impl=attn_impl,
                                     kv_lengths=kv_lengths, causal=causal,
                                     mesh=mesh)
                return (x, ck, cv), None

            (hidden, ks, vs), _ = jax.lax.scan(
                body, (hidden, cache.k, cache.v), jnp.arange(n_layers))
        else:
            def body(carry, inp):
                x, ck, cv = carry
                l, p = inp
                x, (ck, cv) = _layer(p, x, cos, sin, mask_bias, cfg,
                                     cache_kv=(ck, cv),
                                     cache_position=cache_position,
                                     layer_idx=l, attn_impl=attn_impl,
                                     kv_lengths=kv_lengths, causal=causal,
                                     act_quant=act_quant, mesh=mesh)
                return (x, ck, cv), None

            (hidden, ks, vs), _ = jax.lax.scan(
                body, (hidden, cache.k, cache.v),
                (jnp.arange(n_layers), layers))
        new_cache = KVCache(ks, vs)

    hidden = rms_norm(params["norm"]["scale"], hidden, cfg.rms_norm_eps)
    return hidden, new_cache


def _decode_layer_kernel(p, x, cos, sin, cfg: TextConfig, ck, cv, layer_idx,
                         lengths, s_pad: int, t, interpret: bool):
    """One decoder layer of single-token batch decode through the stacked-
    cache Pallas kernel. ck/cv are the FULL head-major [L, B, kh, Smax, hd]
    stacks carried through the layer scan; the new token's KV is written in
    place at slot s_pad + t (uniform over the batch), then the kernel reads
    the layer's blocks straight from HBM (no per-layer slice copy)."""
    from ..ops.decode_attention import decode_attention_stacked

    B, S, _ = x.shape  # S == 1
    nh, kh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    h = rms_norm(p["input_layernorm"]["scale"], x, cfg.rms_norm_eps)
    q = linear(p["attn"]["q"], h).reshape(B, S, nh, hd)
    k = linear(p["attn"]["k"], h).reshape(B, S, kh, hd)
    v = linear(p["attn"]["v"], h).reshape(B, S, kh, hd)
    q, k = _qk_norm(p["attn"], q, k, cfg)
    q, k = apply_rotary(q, k, cos[:, :, None, :], sin[:, :, None, :])

    slot = s_pad + t
    k_w = k[:, 0][None, :, :, None, :]   # [1, B, kh, 1, hd]
    v_w = v[:, 0][None, :, :, None, :]
    ck = jax.lax.dynamic_update_slice(ck, k_w.astype(ck.dtype),
                                      (layer_idx, 0, 0, slot, 0))
    cv = jax.lax.dynamic_update_slice(cv, v_w.astype(cv.dtype),
                                      (layer_idx, 0, 0, slot, 0))
    attn = decode_attention_stacked(q[:, 0], ck, cv, lengths,
                                    slot_end=slot, layer=layer_idx,
                                    s_pad_static=s_pad, interpret=interpret)
    x = x + linear(p["attn"]["o"], attn.reshape(B, 1, nh * hd))
    h = rms_norm(p["post_attention_layernorm"]["scale"], x, cfg.rms_norm_eps)
    return x + _mlp(p["mlp"], h, cfg), ck, cv


def decoder_decode_step(
    params: dict,
    cfg: TextConfig,
    hidden: jax.Array,        # [B, 1, H]
    cos: jax.Array,           # [B, 1, head_dim]
    sin: jax.Array,
    cache: DecodeKVCache,
    lengths: jax.Array,       # [B] prompt lengths (keys [0, len_b) valid)
    s_pad: int,               # static: decode slots start here
    t: jax.Array,             # step index — this token writes slot s_pad + t
) -> tuple[jax.Array, DecodeKVCache]:
    """Single-token batch decode across all layers via the stacked-cache
    kernel. Equivalent math to decoder_forward's decode branch; avoids the
    materialized per-layer KV slice (see DecodeKVCache)."""
    layers = params["layers"]
    n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
    interpret = jax.default_backend() != "tpu"

    if _has_stacked_q4(layers):
        def body(carry, l):
            x, ck, cv = carry
            p = _stacked_quant_view(layers, l)
            x, ck, cv = _decode_layer_kernel(p, x, cos, sin, cfg, ck, cv, l,
                                             lengths, s_pad, t, interpret)
            return (x, ck, cv), None

        (hidden, ks, vs), _ = jax.lax.scan(
            body, (hidden, cache.k, cache.v), jnp.arange(n_layers))
    else:
        def body(carry, inp):
            x, ck, cv = carry
            l, p = inp
            x, ck, cv = _decode_layer_kernel(p, x, cos, sin, cfg, ck, cv, l,
                                             lengths, s_pad, t, interpret)
            return (x, ck, cv), None

        (hidden, ks, vs), _ = jax.lax.scan(
            body, (hidden, cache.k, cache.v),
            (jnp.arange(n_layers), layers))

    hidden = rms_norm(params["norm"]["scale"], hidden, cfg.rms_norm_eps)
    return hidden, DecodeKVCache(ks, vs)


def causal_mask_bias(seq_len: int, attention_mask: jax.Array | None,
                     dtype=jnp.float32) -> jax.Array:
    """[B, 1, S, S] additive bias: causal + padding."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    causal = j <= i
    if attention_mask is not None:
        allowed = causal[None] & (attention_mask[:, None, :] == 1)
    else:
        allowed = causal[None]
    return jnp.where(allowed[:, None], 0.0, -1e30).astype(dtype)


def decode_mask_bias(max_len: int, lengths: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, 1, 1, max_len] bias for single-token decode: keys < lengths valid."""
    j = jnp.arange(max_len)[None, :]
    allowed = j < lengths[:, None]
    return jnp.where(allowed[:, None, None], 0.0, -1e30).astype(dtype)
