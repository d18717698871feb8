"""Attention ops: XLA reference path + Pallas TPU flash kernel dispatch.

TPU-native replacement for FlashAttention-2 (reference binds it via
attn_implementation="flash_attention_2", train/src/train/train_sft.py:127).
The XLA path is the numerics reference (fp32 softmax, GQA via reshape); the
Pallas kernel (flash.py) is used on TPU for long sequences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def dot_product_attention(
    q: jax.Array,            # [B, Sq, num_heads, head_dim]
    k: jax.Array,            # [B, Skv, kv_heads, head_dim]
    v: jax.Array,            # [B, Skv, kv_heads, head_dim]
    bias: jax.Array | None = None,   # [B, 1, Sq, Skv] additive (xla path)
    kv_lengths: jax.Array | None = None,  # [B] prefix-valid keys (flash path)
    causal: bool = False,
    segment_ids: jax.Array | None = None,  # [B, S] (flash path, Sq==Sk)
    impl: str = "xla",
    mesh=None,       # TP-sharded flash prefill (heads over "tp"); the xla
                     # path partitions via GSPMD and ignores this
) -> jax.Array:
    """GQA attention, fp32 accumulation. Returns [B, Sq, num_heads, head_dim].

    The xla path consumes an arbitrary additive bias; the flash path consumes
    (kv_lengths, causal) — prefix-valid masking only. Callers with
    non-prefix masks (e.g. GRPO's padded prompt+completion layout) must use
    the xla path.
    """
    if impl == "sp":
        if q.shape[1] != k.shape[1] or q.shape[1] <= 8:
            # decode / cache cross-attention: the sequence is not sp-sharded
            # there (rollout and serving stay single-shard); use flash/xla
            impl = "flash"
        else:
            # sequence-parallel: S sharded over the mesh's "sp" axis; the
            # registered context names the mesh + batch/head shardings
            from .sp_attention import get_sp_context, sp_flash_attention

            assert bias is None and causal, \
                "sp attention: causal prefix/segment masking only"
            ctx = get_sp_context()
            return sp_flash_attention(q, k, v, ctx["mesh"], axis=ctx["axis"],
                                      kv_lengths=kv_lengths, causal=True,
                                      segment_ids=segment_ids,
                                      batch_axes=ctx["batch_axes"],
                                      head_axis=ctx["head_axis"],
                                      sp_impl=ctx.get("sp_impl", "gather"))
    if impl == "flash" and mesh is not None:
        tp = dict(mesh.shape).get("tp", 1)
        if tp > 1 and (q.shape[2] % tp or k.shape[2] % tp):
            impl = "xla"   # heads don't split: GSPMD's einsum path instead
    if impl == "flash" and kv_lengths is not None and q.shape[1] > 8:
        # single-token decode (Sq==1) degenerates to 1-row kernel blocks —
        # the XLA batched matmul path is faster there
        from .flash import flash_attention

        return flash_attention(q, k, v, kv_lengths=kv_lengths, causal=causal,
                               segment_ids=segment_ids,
                               interpret=jax.default_backend() != "tpu",
                               mesh=mesh)
    if bias is None and kv_lengths is not None:
        # build the bias the xla path needs from prefix lengths
        B, Sq, _, _ = q.shape
        Sk = k.shape[1]
        j = jnp.arange(Sk)[None, :]
        allowed = j[None] < kv_lengths[:, None, None]
        if causal:
            i = jnp.arange(Sq)[:, None]
            allowed = allowed & (j <= i)[None]
        bias = jnp.where(allowed[:, None], 0.0, NEG_INF).astype(jnp.float32)
    return _xla_attention(q, k, v, bias)


def quant_dot_product_attention(
    q: jax.Array,        # [B, Sq, num_heads, head_dim] (Sq == 1 decode)
    k_q: jax.Array,      # [B, Skv, kv_heads, head_dim] int8
    k_scale: jax.Array,  # [B, Skv, kv_heads] float32 per-row absmax scales
    v_q: jax.Array,
    v_scale: jax.Array,
    bias: jax.Array,     # [B, 1, Sq, Skv] additive
) -> jax.Array:
    """GQA attention over an int8-quantized KV cache WITHOUT dequantizing a
    copy: per-row scales factor out of both dot products —
    q.(k_q*s_k) == (q.k_q)*s_k  and  sum_k p*(v_q*s_v) == sum_k (p*s_v)*v_q —
    so the matmul operands are int8-with-convert (XLA fuses convert into the
    dot, exactly as for int8 weights) and the scales apply elementwise to the
    [.., Sq, Skv] score/prob tensors. A naive `(k_q * s).astype(bf16)` operand
    materializes the dequantized slice in HBM (measured: erases the entire
    int8 traffic win at B=256)."""
    B, Sq, nh, hd = q.shape
    kh = k_q.shape[2]
    g = nh // kh
    dt = q.dtype
    qg = q.reshape(B, Sq, kh, g, hd)
    scale = hd ** -0.5
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_q.astype(dt),
                        preferred_element_type=jnp.float32) * scale
    scores = scores * k_scale.transpose(0, 2, 1)[:, :, None, None, :]
    scores = scores + bias[:, :, None].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = (probs * v_scale.transpose(0, 2, 1)[:, :, None, None, :]).astype(dt)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v_q.astype(dt))
    return out.reshape(B, Sq, nh, hd)


def _xla_attention(q, k, v, bias):
    B, Sq, nh, hd = q.shape
    kh = k.shape[2]
    g = nh // kh
    qg = q.reshape(B, Sq, kh, g, hd)
    scale = hd ** -0.5
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias[:, :, None].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(B, Sq, nh, hd)
