"""Weight-only int8 quantization (per-output-channel scales).

Purpose: capacity, not (yet) bandwidth — int8 params put the 7B flagship on a
single 16 GB v5e chip (bf16 needs 15.2 GB for weights alone). The matmul path
dequantizes per-tile inside XLA; a Pallas dequant-fused matmul is the round-2
bandwidth lever. The reference's analogue is bitsandbytes 4/8-bit (N10,
optional there too).

A quantized linear leaf looks like {"kernel_q": int8 [.., in, out],
"scale": f32 [.., out]} (+ optional "bias"); layers.linear dispatches on it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

QUANT_SUFFIXES = (
    ("attn", "q", "kernel"), ("attn", "k", "kernel"), ("attn", "v", "kernel"),
    ("attn", "o", "kernel"), ("mlp", "gate", "kernel"), ("mlp", "up", "kernel"),
    ("mlp", "down", "kernel"), ("attn", "qkv", "kernel"),
    ("attn", "proj", "kernel"), ("fc1", "kernel"), ("fc2", "kernel"),
    ("lm_head", "kernel"),
)

# MoE expert FFNs (models/moe.py): int8 weight-only regardless of the
# requested bits — the grouped expert einsum consumes {kernel_q, scale}
# (per-output-channel) and XLA fuses the convert into the dot; the int4
# packed-nibble kernel path is 2D-stacked-only.
MOE_SUFFIXES = (
    ("experts", "gate", "kernel"), ("experts", "up", "kernel"),
    ("experts", "down", "kernel"),
)


def quantize_kernel(w: jax.Array) -> dict:
    """[.., in, out] -> int8 + per-out-channel scale."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)  # [.., 1, out]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale[..., 0, :].astype(jnp.float32)}


def dequantize_kernel(leaf: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (leaf["kernel_q"].astype(jnp.float32)
            * leaf["scale"][..., None, :]).astype(dtype)


INT4_GROUP_SIZE = 128


def quantize_kernel_int4(w: jax.Array, group_size: int = INT4_GROUP_SIZE) -> dict:
    """[.., K, N] -> half-split packed int4 ({kernel_q4 [.., K/2, N],
    scale4 [.., K/g, N]}), symmetric per-group along K (q in [-7, 7])."""
    from ..ops.int4_matmul import pack_int4_halves

    *lead, K, N = w.shape
    g = group_size
    assert K % (2 * g) == 0, (K, g)
    w32 = w.astype(jnp.float32).reshape(*lead, K // g, g, N)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)   # [.., K/g, 1, N]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w32 / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(*lead, K, N)
    return {"kernel_q4": pack_int4_halves(q),
            "scale4": scale[..., 0, :].astype(jnp.float32)}


def dequantize_kernel_int4(leaf: dict, dtype=jnp.bfloat16,
                           group_size: int = INT4_GROUP_SIZE) -> jax.Array:
    from ..ops.int4_matmul import dequant_int4

    return dequant_int4(leaf["kernel_q4"], leaf["scale4"], group_size, dtype)


def _path_tuple(keypath):
    return tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)


def quantize_params(params: dict, include_embedding: bool = False,
                    bits: int = 8,
                    group_size: int = INT4_GROUP_SIZE,
                    consume: bool = False,
                    extra_suffixes: tuple = ()) -> dict:
    """Replace targeted kernel leaves with quantized dicts (pytree-level
    rewrite; module dicts keep their biases). bits=4 uses group-wise int4
    where the input dim permits (K % 2*group_size == 0 — the 7B decoder and
    lm_head do; ViT fc dims don't and stay int8).

    consume=True MUTATES `params` (drops each full-precision kernel as its
    quantized leaves are built) so peak memory is the quantized tree plus
    ONE kernel, not two whole trees — the judge-scale load path
    (loader.load_hf_checkpoint(quantize=...)).

    extra_suffixes: additional path suffixes to quantize — model families
    with differently-named modules (Qwen3-Next) pass their own set."""
    assert bits in (4, 8), bits
    suffixes = QUANT_SUFFIXES + tuple(extra_suffixes)

    def quant_leaf(w, moe=False):
        if not moe and bits == 4 and w.shape[-2] % (2 * group_size) == 0:
            return quantize_kernel_int4(w, group_size)
        return quantize_kernel(w)

    def walk(node, path):
        if isinstance(node, dict):
            kp = path + ("kernel",)
            moe = any(kp[-len(s):] == s for s in MOE_SUFFIXES)
            if "kernel" in node and not isinstance(node["kernel"], dict) and (
                    moe or any(kp[-len(s):] == s for s in suffixes)):
                out = {k: v for k, v in node.items() if k != "kernel"}
                w = node.pop("kernel") if consume else node["kernel"]
                out.update(quant_leaf(w, moe))
                del w
                return out
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    out = walk(params, ())
    if include_embedding and "embed_tokens" in out.get("model", {}):
        emb = out["model"]["embed_tokens"]["embedding"]
        out["model"]["embed_tokens"] = {"embedding": emb.astype(jnp.bfloat16)}
    return out


def quantized_param_bytes(params: dict) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))


def init_params_quantized_zeros(cfg, bits: int = 8,
                                group_size: int = INT4_GROUP_SIZE) -> dict:
    """Zero-valued int8/int4 params built directly from shapes (no bf16
    intermediate anywhere) — benchmark-only: instant setup, peak HBM equals
    the final footprint."""
    from .loader import init_params

    shapes = jax.eval_shape(
        lambda: init_params(cfg, dtype="bfloat16", method="zeros"))

    def build(node, path):
        if isinstance(node, dict):
            kp = path + ("kernel",)
            moe = any(kp[-len(s):] == s for s in MOE_SUFFIXES)
            if "kernel" in node and not isinstance(node["kernel"], dict) and (
                    moe or any(kp[-len(s):] == s for s in QUANT_SUFFIXES)):
                k = node["kernel"]
                out = {kk: jnp.zeros(vv.shape, vv.dtype)
                       for kk, vv in node.items() if kk != "kernel"}
                K, N = k.shape[-2], k.shape[-1]
                lead = k.shape[:-2]
                if not moe and bits == 4 and K % (2 * group_size) == 0:
                    # packed zeros must decode to q=0, i.e. nibble value 8
                    out["kernel_q4"] = jnp.full(lead + (K // 2, N),
                                                (8 | (8 << 4)) - 256, jnp.int8)
                    out["scale4"] = jnp.full(lead + (K // group_size, N),
                                             1e-8, jnp.float32)
                else:
                    out["kernel_q"] = jnp.zeros(k.shape, jnp.int8)
                    out["scale"] = jnp.full(lead + (N,), 1e-8, jnp.float32)
                return out
            return {k: build(v, path + (k,)) for k, v in node.items()}
        return jnp.zeros(node.shape, node.dtype)

    return build(shapes, ())
