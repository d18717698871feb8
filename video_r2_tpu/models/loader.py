"""Weight loading: HF checkpoints (safetensors / torch state dicts) -> the
stacked-layer params pytree, plus random init for benchmarks.

The stacked layout (leading layer axis on every decoder/ViT block leaf) is what
lets the model scan over layers and shard every layer identically under FSDP
(SURVEY §2.4 N3: replaces ZeRO-3 parameter partitioning).
"""

from __future__ import annotations

import json
import math
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16) without importing torch at module scope
    import torch

    if t.dtype == torch.bfloat16:
        return t.float().numpy()
    return t.numpy()


def _normalize_key(k: str) -> str:
    """Map every known HF naming era onto one canonical scheme:
    visual.* and model.* (text), lm_head.*"""
    k = re.sub(r"^model\.language_model\.", "model.", k)
    k = re.sub(r"^model\.visual\.", "visual.", k)
    k = re.sub(r"^language_model\.model\.", "model.", k)
    return k


def convert_hf_state_dict(state: dict, cfg: ModelConfig,
                          dtype: str | None = None,
                          consume: bool = False) -> dict:
    """HF tensor dict -> params pytree. Accepts torch tensors or numpy arrays.

    consume=True takes ownership of `state` (clears it) and frees each host
    tensor as soon as its pytree leaf is built — judge-scale checkpoints
    (30B+) otherwise hold the full checkpoint in host RAM TWICE during
    conversion."""
    dtype = jnp.dtype(dtype or cfg.dtype)
    # map normalized -> raw keys WITHOUT touching values: `state` may be a
    # LazyStateDict whose tensors materialize one at a time on pop/[] —
    # an eager values copy would hold the whole checkpoint again
    keymap = {_normalize_key(k): k for k in list(state.keys())}

    def fetch(k):
        raw = keymap[k]
        return state.pop(raw) if consume else state[raw]

    def get(k, transpose=False):
        a = _np(fetch(k)).astype(np.float32)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    def stack(fmt, n, transpose=False):
        a = np.stack([_np(fetch(fmt.format(i))).astype(np.float32)
                      for i in range(n)])
        if transpose:
            a = a.transpose(0, *range(len(a.shape) - 1, 0, -1))
        return jnp.asarray(a, dtype=dtype)

    v, t = cfg.vision, cfg.text
    visual = None if not cfg.has_vision else {
        "patch_embed": {
            "kernel": jnp.asarray(
                _np(fetch("visual.patch_embed.proj.weight"))
                .astype(np.float32)
                .reshape(v.hidden_size, -1).T, dtype=dtype)
        },
        "blocks": {
            "norm1": {"scale": stack("visual.blocks.{}.norm1.weight", v.depth)},
            "norm2": {"scale": stack("visual.blocks.{}.norm2.weight", v.depth)},
            "attn": {
                "qkv": {"kernel": stack("visual.blocks.{}.attn.qkv.weight", v.depth, True),
                        "bias": stack("visual.blocks.{}.attn.qkv.bias", v.depth)},
                "proj": {"kernel": stack("visual.blocks.{}.attn.proj.weight", v.depth, True),
                         "bias": stack("visual.blocks.{}.attn.proj.bias", v.depth)},
            },
            "mlp": {
                "gate": {"kernel": stack("visual.blocks.{}.mlp.gate_proj.weight", v.depth, True),
                         "bias": stack("visual.blocks.{}.mlp.gate_proj.bias", v.depth)},
                "up": {"kernel": stack("visual.blocks.{}.mlp.up_proj.weight", v.depth, True),
                       "bias": stack("visual.blocks.{}.mlp.up_proj.bias", v.depth)},
                "down": {"kernel": stack("visual.blocks.{}.mlp.down_proj.weight", v.depth, True),
                         "bias": stack("visual.blocks.{}.mlp.down_proj.bias", v.depth)},
            },
        },
        "merger": {
            "ln_q": {"scale": get("visual.merger.ln_q.weight")},
            "fc1": {"kernel": get("visual.merger.mlp.0.weight", True),
                    "bias": get("visual.merger.mlp.0.bias")},
            "fc2": {"kernel": get("visual.merger.mlp.2.weight", True),
                    "bias": get("visual.merger.mlp.2.bias")},
        },
    }
    L = t.num_hidden_layers
    attn = {
        "q": {"kernel": stack("model.layers.{}.self_attn.q_proj.weight", L, True)},
        "k": {"kernel": stack("model.layers.{}.self_attn.k_proj.weight", L, True)},
        "v": {"kernel": stack("model.layers.{}.self_attn.v_proj.weight", L, True)},
        "o": {"kernel": stack("model.layers.{}.self_attn.o_proj.weight", L, True)},
    }
    if t.attention_bias:
        for proj in ("q", "k", "v"):
            attn[proj]["bias"] = stack(
                "model.layers.{}.self_attn.%s_proj.bias" % proj, L)
    if t.qk_norm:  # Qwen3 family: per-head q/k RMS norm weights [head_dim]
        attn["q_norm"] = {"scale": stack("model.layers.{}.self_attn.q_norm.weight", L)}
        attn["k_norm"] = {"scale": stack("model.layers.{}.self_attn.k_norm.weight", L)}
    if t.num_experts:
        # HF Qwen3MoeForCausalLM naming: mlp.gate (router, [E, H]) +
        # mlp.experts.{e}.{gate,up,down}_proj
        E = t.num_experts

        def stack2(fmt, transpose_last=True):
            a = np.stack([
                np.stack([_np(fetch(fmt.format(i, e))).astype(np.float32)
                          for e in range(E)]) for i in range(L)])
            if transpose_last:
                a = a.transpose(0, 1, 3, 2)
            return jnp.asarray(a, dtype=dtype)

        mlp = {
            "router": {"kernel": stack("model.layers.{}.mlp.gate.weight", L, True)},
            "experts": {
                "gate": {"kernel": stack2("model.layers.{}.mlp.experts.{}.gate_proj.weight")},
                "up": {"kernel": stack2("model.layers.{}.mlp.experts.{}.up_proj.weight")},
                "down": {"kernel": stack2("model.layers.{}.mlp.experts.{}.down_proj.weight")},
            },
        }
    else:
        mlp = {
            "gate": {"kernel": stack("model.layers.{}.mlp.gate_proj.weight", L, True)},
            "up": {"kernel": stack("model.layers.{}.mlp.up_proj.weight", L, True)},
            "down": {"kernel": stack("model.layers.{}.mlp.down_proj.weight", L, True)},
        }
    model = {
        "embed_tokens": {"embedding": get("model.embed_tokens.weight")},
        "layers": {
            "input_layernorm": {"scale": stack("model.layers.{}.input_layernorm.weight", L)},
            "post_attention_layernorm": {
                "scale": stack("model.layers.{}.post_attention_layernorm.weight", L)},
            "attn": attn,
            "mlp": mlp,
        },
        "norm": {"scale": get("model.norm.weight")},
    }
    params = {"model": model}
    if visual is not None:
        params["visual"] = visual
    if not t.tie_word_embeddings:
        params["lm_head"] = {"kernel": get("lm_head.weight", True)}
    return params


class LazyStateDict:
    """Checkpoint tensors materialized ONE AT A TIME from safetensors
    shards (mmap-backed handles stay open; get_tensor copies just the
    requested tensor). Peak host RSS during conversion is ~the converted
    tree + one tensor, NOT state-dict + tree: the eager loop this replaces
    held every tensor of every shard before converting (VERDICT r4 #5 —
    an 80B judge checkpoint is ~160 GB bf16). Duck-types the two dict ops
    the converters use: [] (read) and pop (consume)."""

    def __init__(self, shards, skip_prefixes: tuple = ()):
        from safetensors import safe_open

        self._handles = [safe_open(str(s), framework="np") for s in shards]
        self._where = {k: h for h in self._handles for k in h.keys()
                       if not any(k.startswith(p) for p in skip_prefixes)}

    def __getitem__(self, k):
        return self._where[k].get_tensor(k)

    def pop(self, k):
        return self._where.pop(k).get_tensor(k)

    def __contains__(self, k):
        return k in self._where

    def keys(self):
        return self._where.keys()

    def __len__(self):
        return len(self._where)


def _host_convert_ctx(mesh):
    """With a mesh, convert ONTO THE HOST CPU device so the full tree never
    materializes on one accelerator; the caller then device_puts each leaf
    to its NamedSharding (slices stream to their shards). Falls back to the
    default device when no CPU backend exists."""
    import contextlib

    import jax

    if mesh is None:
        return contextlib.nullcontext()
    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()


def load_hf_checkpoint(path: str | Path, cfg: ModelConfig,
                       dtype: str | None = None,
                       quantize: str | None = None, bits: int = 8,
                       mesh=None) -> dict:
    """Load a HF checkpoint directory (safetensors shards), STREAMING:
    each tensor materializes once, converts, and is freed (LazyStateDict)
    — peak host RAM stays ~one converted tree, which is what makes a
    judge-scale model loadable on a modest host before it serves
    TP-sharded (scripts/serve_judge.sh).

    quantize="int8" (or bits=4) quantizes ON LOAD, consuming bf16 leaves
    as they quantize. mesh: place every leaf with its parallel/sharding
    rule (sharded load == unsharded load, slices go straight to their
    shards)."""
    path = Path(path)
    shards = sorted(path.glob("*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"no safetensors in {path}")
    state = LazyStateDict(shards)
    with _host_convert_ctx(mesh):
        params = convert_hf_state_dict(state, cfg, dtype, consume=True)
        if quantize is not None:
            assert quantize == "int8", quantize
            from .quant import quantize_params

            params = quantize_params(params, bits=bits, consume=True)
    if mesh is not None:
        from ..parallel.sharding import shard_params

        params = shard_params(params, mesh)
    return params


def init_params(cfg: ModelConfig, seed: int = 0, dtype: str | None = None,
                method: str = "normal") -> dict:
    """Init with HF-matching shapes (benchmarks / smoke tests).
    method='zeros' skips host-side RNG — same compile geometry and FLOPs,
    instant setup for multi-billion-param benchmark models."""
    dtype = jnp.dtype(dtype or cfg.dtype)
    rng = np.random.default_rng(seed)
    v, t = cfg.vision, cfg.text

    def w(*shape, scale=None):
        if method == "zeros":
            return jnp.zeros(shape, dtype=dtype)
        scale = scale or 1.0 / math.sqrt(shape[0])
        return jnp.asarray(rng.normal(0, scale, shape), dtype=dtype)

    def zeros(*shape):
        return jnp.zeros(shape, dtype=dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype=dtype)

    D, I_, nh = v.hidden_size, v.intermediate_size, v.num_heads
    visual = None if not cfg.has_vision else {
        "patch_embed": {"kernel": w(v.patch_input_dim, D)},
        "blocks": {
            "norm1": {"scale": ones(v.depth, D)},
            "norm2": {"scale": ones(v.depth, D)},
            "attn": {
                "qkv": {"kernel": w(v.depth, D, 3 * D), "bias": zeros(v.depth, 3 * D)},
                "proj": {"kernel": w(v.depth, D, D), "bias": zeros(v.depth, D)},
            },
            "mlp": {
                "gate": {"kernel": w(v.depth, D, I_), "bias": zeros(v.depth, I_)},
                "up": {"kernel": w(v.depth, D, I_), "bias": zeros(v.depth, I_)},
                "down": {"kernel": w(v.depth, I_, D), "bias": zeros(v.depth, D)},
            },
        },
        "merger": {
            "ln_q": {"scale": ones(D)},
            "fc1": {"kernel": w(4 * D, 4 * D), "bias": zeros(4 * D)},
            "fc2": {"kernel": w(4 * D, v.out_hidden_size), "bias": zeros(v.out_hidden_size)},
        },
    }
    H, Ht, L = t.hidden_size, t.intermediate_size, t.num_hidden_layers
    qd = t.num_attention_heads * t.head_dim
    kvd = t.num_key_value_heads * t.head_dim
    # embedding drawn FIRST: keeps the sequential-RNG draw order identical to
    # the historical layout (tolerance-tuned tests seed on it)
    embed = {"embedding": w(t.vocab_size, H, scale=0.02)}
    attn = {
        "q": {"kernel": w(L, H, qd)},
        "k": {"kernel": w(L, H, kvd)},
        "v": {"kernel": w(L, H, kvd)},
        "o": {"kernel": w(L, qd, H)},
    }
    if t.attention_bias:
        attn["q"]["bias"] = zeros(L, qd)
        attn["k"]["bias"] = zeros(L, kvd)
        attn["v"]["bias"] = zeros(L, kvd)
    if t.qk_norm:
        attn["q_norm"] = {"scale": ones(L, t.head_dim)}
        attn["k_norm"] = {"scale": ones(L, t.head_dim)}
    if t.num_experts:
        E, Im = t.num_experts, t.moe_intermediate_size
        mlp = {
            "router": {"kernel": w(L, H, E)},
            "experts": {
                "gate": {"kernel": w(L, E, H, Im)},
                "up": {"kernel": w(L, E, H, Im)},
                "down": {"kernel": w(L, E, Im, H)},
            },
        }
    else:
        mlp = {
            "gate": {"kernel": w(L, H, Ht)},
            "up": {"kernel": w(L, H, Ht)},
            "down": {"kernel": w(L, Ht, H)},
        }
    model = {
        "embed_tokens": embed,
        "layers": {
            "input_layernorm": {"scale": ones(L, H)},
            "post_attention_layernorm": {"scale": ones(L, H)},
            "attn": attn,
            "mlp": mlp,
        },
        "norm": {"scale": ones(H)},
    }
    params = {"model": model}
    if visual is not None:
        params["visual"] = visual
    if not t.tie_word_embeddings:
        params["lm_head"] = {"kernel": w(H, t.vocab_size, scale=0.02)}
    return params


def param_count(params: dict) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
