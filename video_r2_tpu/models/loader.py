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
                          dtype: str | None = None) -> dict:
    """HF tensor dict -> params pytree. Accepts torch tensors or numpy arrays."""
    dtype = jnp.dtype(dtype or cfg.dtype)
    sd = {_normalize_key(k): v for k, v in state.items()}

    def get(k, transpose=False):
        a = _np(sd[k]).astype(np.float32)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    def stack(fmt, n, transpose=False):
        a = np.stack([_np(sd[fmt.format(i)]).astype(np.float32) for i in range(n)])
        if transpose:
            a = a.transpose(0, *range(len(a.shape) - 1, 0, -1))
        return jnp.asarray(a, dtype=dtype)

    v, t = cfg.vision, cfg.text
    visual = {
        "patch_embed": {
            "kernel": jnp.asarray(
                _np(sd["visual.patch_embed.proj.weight"]).astype(np.float32)
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
    model = {
        "embed_tokens": {"embedding": get("model.embed_tokens.weight")},
        "layers": {
            "input_layernorm": {"scale": stack("model.layers.{}.input_layernorm.weight", L)},
            "post_attention_layernorm": {
                "scale": stack("model.layers.{}.post_attention_layernorm.weight", L)},
            "attn": {
                "q": {"kernel": stack("model.layers.{}.self_attn.q_proj.weight", L, True),
                      "bias": stack("model.layers.{}.self_attn.q_proj.bias", L)},
                "k": {"kernel": stack("model.layers.{}.self_attn.k_proj.weight", L, True),
                      "bias": stack("model.layers.{}.self_attn.k_proj.bias", L)},
                "v": {"kernel": stack("model.layers.{}.self_attn.v_proj.weight", L, True),
                      "bias": stack("model.layers.{}.self_attn.v_proj.bias", L)},
                "o": {"kernel": stack("model.layers.{}.self_attn.o_proj.weight", L, True)},
            },
            "mlp": {
                "gate": {"kernel": stack("model.layers.{}.mlp.gate_proj.weight", L, True)},
                "up": {"kernel": stack("model.layers.{}.mlp.up_proj.weight", L, True)},
                "down": {"kernel": stack("model.layers.{}.mlp.down_proj.weight", L, True)},
            },
        },
        "norm": {"scale": get("model.norm.weight")},
    }
    params = {"visual": visual, "model": model}
    if not t.tie_word_embeddings:
        params["lm_head"] = {"kernel": get("lm_head.weight", True)}
    return params


def load_hf_checkpoint(path: str | Path, cfg: ModelConfig,
                       dtype: str | None = None) -> dict:
    """Load a HF checkpoint directory (safetensors shards)."""
    from safetensors import safe_open

    path = Path(path)
    state = {}
    shards = sorted(path.glob("*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"no safetensors in {path}")
    for shard in shards:
        with safe_open(shard, framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return convert_hf_state_dict(state, cfg, dtype)


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
    visual = {
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
    kvd = t.num_key_value_heads * t.head_dim
    model = {
        "embed_tokens": {"embedding": w(t.vocab_size, H, scale=0.02)},
        "layers": {
            "input_layernorm": {"scale": ones(L, H)},
            "post_attention_layernorm": {"scale": ones(L, H)},
            "attn": {
                "q": {"kernel": w(L, H, H), "bias": zeros(L, H)},
                "k": {"kernel": w(L, H, kvd), "bias": zeros(L, kvd)},
                "v": {"kernel": w(L, H, kvd), "bias": zeros(L, kvd)},
                "o": {"kernel": w(L, H, H)},
            },
            "mlp": {
                "gate": {"kernel": w(L, H, Ht)},
                "up": {"kernel": w(L, H, Ht)},
                "down": {"kernel": w(L, Ht, H)},
            },
        },
        "norm": {"scale": ones(H)},
    }
    params = {"visual": visual, "model": model}
    if not t.tie_word_embeddings:
        params["lm_head"] = {"kernel": w(H, t.vocab_size, scale=0.02)}
    return params


def param_count(params: dict) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
