"""Sharding rules: param-path -> PartitionSpec.

FSDP+TP layout for the stacked-layer param tree (ZeRO-3 + megatron parity,
SURVEY §2.5). XLA/GSPMD inserts the collectives (all-gather for FSDP params,
all-reduce/reduce-scatter for TP partials and gradients) from these
annotations — no hand-written NCCL calls to translate.

Scheme (leading L axis on stacked decoder/ViT leaves is never sharded so scan
stays layerwise):
- attention q/k/v and mlp gate/up kernels: output dim on "tp", input on "fsdp"
- attention o and mlp down kernels:        input dim on "tp", output on "fsdp"
- embed/lm_head:                           vocab on "tp", hidden on "fsdp"
- norms/biases/small leaves:               replicated
- batch dims of data:                      ("dp", "fsdp")
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-suffix -> spec builder keyed on leaf ndim; leading layer-stack axis
# (ndim == base + 1) gets None prepended automatically.
_TEXT_RULES: list[tuple[tuple[str, ...], P]] = [
    (("attn", "q", "kernel"), P("fsdp", "tp")),
    (("attn", "k", "kernel"), P("fsdp", "tp")),
    (("attn", "v", "kernel"), P("fsdp", "tp")),
    (("attn", "q", "bias"), P("tp")),
    (("attn", "k", "bias"), P("tp")),
    (("attn", "v", "bias"), P("tp")),
    (("attn", "o", "kernel"), P("tp", "fsdp")),
    (("mlp", "gate", "kernel"), P("fsdp", "tp")),
    (("mlp", "up", "kernel"), P("fsdp", "tp")),
    (("mlp", "down", "kernel"), P("tp", "fsdp")),
    (("mlp", "gate", "bias"), P("tp")),
    (("mlp", "up", "bias"), P("tp")),
    (("mlp", "down", "bias"), P()),
    # MoE (models/moe.py): experts stacked on a leading E axis shard over
    # "ep"; within an expert the FFN shards like a dense MLP (in on "fsdp",
    # intermediate on "tp"). The router is a small [H, E] matmul — replicate
    # E so routing never pays a collective.
    (("experts", "gate", "kernel"), P("ep", "fsdp", "tp")),
    (("experts", "up", "kernel"), P("ep", "fsdp", "tp")),
    (("experts", "down", "kernel"), P("ep", "tp", "fsdp")),
    (("router", "kernel"), P("fsdp", None)),
    (("embed_tokens", "embedding"), P("tp", "fsdp")),
    (("lm_head", "kernel"), P("fsdp", "tp")),
    (("attn", "qkv", "kernel"), P("fsdp", "tp")),
    (("attn", "qkv", "bias"), P("tp")),
    (("attn", "proj", "kernel"), P("tp", "fsdp")),
    (("attn", "proj", "bias"), P()),
    (("patch_embed", "kernel"), P(None, "fsdp")),
    (("fc1", "kernel"), P("fsdp", "tp")),
    (("fc1", "bias"), P("tp")),
    (("fc2", "kernel"), P("tp", "fsdp")),
    (("fc2", "bias"), P()),
    # Qwen3-Next (models/qwen3_next.py) — leaves stack [G] (full-attention
    # role) or [G, 3] (DeltaNet role); _spec_for prepends a None per extra
    # leading stack axis. Fused projection outputs (qkvz, q+gate) are
    # per-head blocks: "tp" splits on head boundaries when tp divides the
    # head count (GSPMD stays correct otherwise, just reshards around the
    # per-head reshape). conv/dt_bias/A_log/ba outputs are small and feed
    # head-interleaved gathers — replicated.
    (("lin", "qkvz", "kernel"), P("fsdp", "tp")),
    (("lin", "ba", "kernel"), P("fsdp", None)),
    (("lin", "out", "kernel"), P("tp", "fsdp")),
    (("full", "q", "kernel"), P("fsdp", "tp")),
    (("full", "k", "kernel"), P("fsdp", "tp")),
    (("full", "v", "kernel"), P("fsdp", "tp")),
    (("full", "o", "kernel"), P("tp", "fsdp")),
    (("shared", "gate", "kernel"), P("fsdp", "tp")),
    (("shared", "up", "kernel"), P("fsdp", "tp")),
    (("shared", "down", "kernel"), P("tp", "fsdp")),
    (("embed", "weight"), P("tp", "fsdp")),
]


def _spec_for(path: tuple[str, ...], leaf) -> P:
    # quantized leaves (models/quant.py) inherit the kernel's rule:
    # kernel_q matches the kernel's shape; kernel_q4 [.., K/2, N] and
    # scale4 [.., K/g, N] keep its rank; a per-output-channel "scale"
    # [.., N] drops the K axis. Norm "scale" paths fall through (their
    # parent has no kernel rule) and stay replicated as before.
    name = path[-1] if path else ""
    reduce_k = False
    if name in ("kernel_q", "kernel_q4", "scale4"):
        lookup = path[:-1] + ("kernel",)
    elif name == "scale":
        lookup = path[:-1] + ("kernel",)
        reduce_k = True
    else:
        lookup = path
    for suffix, spec in _TEXT_RULES:
        if lookup[-len(suffix):] == suffix:
            axes = list(spec)
            if reduce_k and len(axes) >= 2:
                axes = axes[:-2] + [axes[-1]]
            base = len(axes)
            if leaf.ndim >= base:           # 1+ leading stack axes (layers,
                return P(*([None] * (leaf.ndim - base)), *axes)  # groups, E)
    return P()  # norms, scalars: replicated


def _path_tuple(keypath) -> tuple[str, ...]:
    out = []
    for k in keypath:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return tuple(out)


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params`."""
    pp = dict(mesh.shape).get("pp", 1)

    def f(keypath, leaf):
        path = _path_tuple(keypath)
        spec = _spec_for(path, leaf)
        # drop axes that don't divide evenly (or aren't in this mesh)
        # -> replicate that dim
        shape = dict(mesh.shape)
        fixed = []
        for dim, axis in enumerate(spec):
            if axis is None:
                fixed.append(None)
                continue
            if isinstance(axis, str):
                if axis not in shape:
                    fixed.append(None)
                    continue
                size = shape[axis]
            else:
                if any(a not in shape for a in axis):
                    fixed.append(None)
                    continue
                size = int(np.prod([shape[a] for a in axis]))
            fixed.append(axis if leaf.shape[dim] % size == 0 else None)
        # pipeline parallelism: the text decoder's stacked layer axis is the
        # stage axis — every leaf under model/layers (kernels, biases, norm
        # scales) shards its leading L dim over "pp" so each stage holds a
        # contiguous L/pp block (parallel/pipeline.py consumes this layout)
        if (pp > 1 and len(path) >= 2 and path[:2] == ("model", "layers")
                and leaf.ndim >= 1 and leaf.shape[0] % pp == 0):
            fixed += [None] * (leaf.ndim - len(fixed))
            fixed[0] = "pp"
        return NamedSharding(mesh, P(*fixed) if fixed else P())

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh per the rules (host -> sharded device arrays)."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch dim over (dp, fsdp)."""
    return NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (ndim - 1))))


def kv_head_axis(mesh: Mesh, kv_heads: int) -> str | None:
    """THE one place deciding which mesh axis KV caches/pools shard their
    kv-head dim over: "tp" when it divides the head count, else None
    (replicated heads). Every pin/placement (pin_kv_cache,
    kv_cache_sharding, the paged engine's pool placement and _pin_pool)
    must agree or GSPMD re-lays-out the multi-GB buffers each step."""
    return "tp" if kv_heads % dict(mesh.shape).get("tp", 1) == 0 else None


def pin_kv_cache(cache, mesh: Mesh, kv_heads: int):
    """with_sharding_constraint every KV-cache leaf to the kv-head "tp"
    layout inside a jit: 5-d [L, B, Smax, kh, hd] value leaves and 4-d
    [L, B, Smax, kh] QuantKVCache scale leaves. Preserves the cache TYPE
    over its leaves — the one shared implementation of this pin, because a
    hand-rolled KVCache(k, v) rebuild once silently dropped a
    QuantKVCache's scale pages (100% garbage tokens;
    tests/test_mesh_serving.py::test_batch_generate_int8_kv_under_mesh)."""
    axis = kv_head_axis(mesh, kv_heads)
    sh5 = NamedSharding(mesh, P(None, None, None, axis, None))
    sh4 = NamedSharding(mesh, P(None, None, None, axis))
    return type(cache)(*(jax.lax.with_sharding_constraint(
        c, sh5 if c.ndim == 5 else sh4) for c in cache))


def kv_cache_sharding(mesh: Mesh, kv_heads: int) -> NamedSharding:
    """KV cache [L, B, S, kv_heads, head_dim] sharded on heads over "tp"
    (megatron attention sharding: each tp shard holds its own heads' KV —
    the reference's only TP use is vLLM judge serving, serve_qwen3.sh:13).
    Falls back to replicated when tp doesn't divide the head count."""
    return NamedSharding(mesh, P(None, None, None,
                                 kv_head_axis(mesh, kv_heads), None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def next_cache_shardings(mesh: Mesh, kv_heads: int, nv_heads: int):
    """Shardings for the Qwen3-Next hybrid cache's five fields (the judge
    deployment: 80B at TP=4, reference serve_qwen3.sh:13). KV strips
    [G, B, Smax, kh, hd] shard kv-heads over "tp" (same megatron layout as
    the transformer engines, via kv_head_axis); the DeltaNet recurrent state
    [G, P1, B, nv, dk, dv] (float32 — the big persistent buffer) shards its
    value heads over "tp" when divisible; the conv tail [G, P1, B, K-1,
    conv_dim] and per-slot lengths are small and stay replicated."""
    kv_axis = kv_head_axis(mesh, kv_heads)
    nv_axis = "tp" if nv_heads % dict(mesh.shape).get("tp", 1) == 0 else None
    return {
        "conv": NamedSharding(mesh, P()),
        "rec": NamedSharding(mesh, P(None, None, None, nv_axis, None, None)),
        "k": NamedSharding(mesh, P(None, None, None, kv_axis, None)),
        "v": NamedSharding(mesh, P(None, None, None, kv_axis, None)),
        "length": NamedSharding(mesh, P()),
    }


def pin_next_cache(cache, mesh: Mesh, kv_heads: int, nv_heads: int):
    """with_sharding_constraint every hybrid-cache field to the layout above
    inside a jit — persistent engine state must keep ONE layout across
    admission/decode jits or GSPMD re-lays-out the multi-GB buffers each
    step (the paged engine's _pin_pool lesson). Type-preserving over the
    NamedTuple's fields (pin_kv_cache's QuantKVCache lesson)."""
    sh = next_cache_shardings(mesh, kv_heads, nv_heads)
    return type(cache)(**{
        name: jax.lax.with_sharding_constraint(getattr(cache, name), sh[name])
        for name in cache._fields})
