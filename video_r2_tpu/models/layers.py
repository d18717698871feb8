"""Shared functional building blocks (params are plain pytrees of jnp arrays).

Numerics match HF Qwen2: RMSNorm in fp32 with cast-back-before-scale, gated
SiLU MLP, rotate-half rotary application in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_act(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-token int8 activation quant: [..., K] ->
    (int8 [M, K], float32 scale [M, 1]) with rows flattened. Compute it ONCE
    per shared matmul input (q/k/v share one, gate/up share one) — each
    quantize pass re-reads the full activation from HBM, so redundant passes
    are measurable at prefill shapes."""
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(x2), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(x2 / a), -127, 127).astype(jnp.int8)
    return xq, a


def linear(params: dict, x: jax.Array, act_quant: str | None = None,
           pre_quant: tuple[jax.Array, jax.Array] | None = None) -> jax.Array:
    """x @ kernel (+ bias). kernel is [in, out]; int8 weight-only quantized
    leaves ({kernel_q, scale}) route through the dequant-fused Pallas matmul
    for decode-sized activations; int4 leaves ({kernel_q4, scale4}) through
    the packed-nibble kernel. A leaf carrying "_layer_idx" is a STACKED view
    (decoder decode scan): the full [L, ...] weight buffer plus a traced
    layer index, letting the Pallas kernels stream tiles straight from the
    stacked HBM buffer (no per-layer slice copy). A {lora_a, lora_b,
    lora_scale} triple adds a low-rank delta WITHOUT materializing W + AB
    (the QLoRA matmul structure: y = quant_matmul(x) + (x @ A) @ B * s)."""
    if "kernel_q4" in params:
        y = _int4_linear(params, x)
    elif "kernel_q" in params:
        if act_quant == "int8" and params["kernel_q"].ndim == 2:
            y = _w8a8_linear(params, x, pre_quant)
        elif params["kernel_q"].ndim == 2:
            from ..ops.int8_matmul import quantized_linear_auto

            y = quantized_linear_auto(x, params["kernel_q"], params["scale"])
        else:
            w = params["kernel_q"].astype(x.dtype)
            y = (jnp.einsum("...i,...io->...o", x, w)
                 * params["scale"].astype(x.dtype))
    else:
        y = jnp.einsum("...i,io->...o", x, params["kernel"])
    if "lora_a" in params:
        a = params["lora_a"].astype(x.dtype)
        b = params["lora_b"].astype(x.dtype)
        y = y + jnp.einsum("...r,ro->...o",
                           jnp.einsum("...i,ir->...r", x, a), b)
    if "bias" in params:
        y = y + params["bias"]
    return y


def _w8a8_linear(params: dict, x: jax.Array,
                 pre_quant: tuple[jax.Array, jax.Array] | None = None) -> jax.Array:
    """Dynamic per-token activation int8 x weight int8 on the integer MXU
    (2x bf16 peak). Opt-in via act_quant="int8" — used for PREFILL (matmuls
    compute-bound) and for large-batch decode (B>=~192 turns MXU-bound).
    pre_quant: already-quantized (xq, scale) shared across sibling matmuls."""
    wq, w_scale = params["kernel_q"], params["scale"]
    lead = x.shape[:-1]
    xq, a = quantize_act(x) if pre_quant is None else pre_quant
    y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * a * w_scale[None, :]).astype(x.dtype)
    return y.reshape(*lead, wq.shape[-1])


def _int4_linear(params: dict, x: jax.Array) -> jax.Array:
    from ..ops.int4_matmul import dequant_int4, int4_matmul_stacked

    kq, s4 = params["kernel_q4"], params["scale4"]
    K = 2 * kq.shape[-2]
    g = K // s4.shape[-2]
    if "_layer_idx" in params:
        lead = x.shape[:-1]
        x2 = x.reshape(-1, K)
        if jax.default_backend() == "tpu" and x2.shape[0] <= 1024:
            y = int4_matmul_stacked(x2, kq, s4, params["_layer_idx"],
                                    group_size=g)
        else:
            layer = params["_layer_idx"]
            w = dequant_int4(
                jax.lax.dynamic_index_in_dim(kq, layer, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(s4, layer, 0, keepdims=False),
                g, x.dtype)
            y = x2 @ w
        return y.reshape(*lead, kq.shape[-1])
    if kq.ndim == 2 and jax.default_backend() == "tpu":
        lead = x.shape[:-1]
        x2 = x.reshape(-1, K)
        if 0 < x2.shape[0] <= 1024:
            # e.g. decode-step lm_head: one-layer stacked call — never
            # materialize the dequantized [K, V] in HBM
            y = int4_matmul_stacked(x2, kq[None], s4[None], 0, group_size=g)
            return y.reshape(*lead, kq.shape[-1])
    w = dequant_int4(kq, s4, g, x.dtype)
    return jnp.einsum("...i,...io->...o", x, w)


def rms_norm(scale: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    """HF Qwen2RMSNorm: fp32 variance, cast back to input dtype, then scale."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = (x32 * jax.lax.rsqrt(var + eps)).astype(dtype)
    return scale * normed


def swiglu_mlp(params: dict, x: jax.Array,
               act_quant: str | None = None) -> jax.Array:
    """down(silu(gate(x)) * up(x)) — Qwen2MLP / Qwen2_5_VLMLP.
    Under W8A8 the gate/up matmuls share one activation quantization."""
    pq = None
    if (act_quant == "int8" and "kernel_q" in params["gate"]
            and "kernel_q4" not in params["gate"]
            and params["gate"]["kernel_q"].ndim == 2):
        pq = quantize_act(x)
    h = jax.nn.silu(linear(params["gate"], x, act_quant, pq)) \
        * linear(params["up"], x, act_quant, pq)
    return linear(params["down"], h, act_quant)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """Apply rotary embedding in fp32, preserving input dtype.
    cos/sin broadcast against q/k (already expanded by the caller)."""
    qd, kd = q.dtype, k.dtype
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    cos32, sin32 = cos.astype(jnp.float32), sin.astype(jnp.float32)
    q_out = q32 * cos32 + rotate_half(q32) * sin32
    k_out = k32 * cos32 + rotate_half(k32) * sin32
    return q_out.astype(qd), k_out.astype(kd)


def rotary_inv_freq(dim: int, theta: float) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
