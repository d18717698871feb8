"""Checkpointing: sharded Orbax save/resume + HF safetensors export.

Replaces the reference's ZeRO-3 gather-on-save dance (train_utils.py:6-55,
zero3.json stage3_gather_16bit_weights_on_save) with native sharded
checkpoints — every host writes its own shards, no parameter gathering.
Resume-from-latest parity: train_sft.py:206-209 (checkpoint-<step> dirs,
auto-pick highest). HF export is the merge_lora_weights.py equivalent for
interop with the reference ecosystem.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np


def _ckpt_dirs(root: Path) -> list[tuple[int, Path]]:
    out = []
    for p in root.glob("checkpoint-*"):
        m = re.fullmatch(r"checkpoint-(\d+)", p.name)
        if m and p.is_dir():
            out.append((int(m.group(1)), p))
    return sorted(out)


def latest_checkpoint(root: str | Path) -> Path | None:
    root = Path(root)
    if not root.exists():
        return None
    dirs = _ckpt_dirs(root)
    return dirs[-1][1] if dirs else None


def save_checkpoint(root: str | Path, state, step: int,
                    keep: int | None = 2, metadata: dict | None = None) -> Path:
    """Save TrainState (params/opt_state/step pytree) with Orbax; rotate old
    checkpoints (save_total_limit parity, train_grpo.sh:78-79)."""
    import orbax.checkpoint as ocp

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    path = root / f"checkpoint-{step}"
    if path.exists():
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.absolute() / "state", state)
    ckptr.wait_until_finished()
    if metadata:
        (path / "metadata.json").write_text(json.dumps(metadata, indent=2))
    if keep:
        for _, old in _ckpt_dirs(root)[:-keep]:
            shutil.rmtree(old, ignore_errors=True)
    return path


def load_checkpoint(path: str | Path, template) -> Any:
    """Restore into the structure/shardings of `template` (an abstract or
    concrete TrainState pytree)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute() / "state", target=template)


def resume_or_none(root: str | Path, template) -> tuple[Any, int] | None:
    last = latest_checkpoint(root)
    if last is None:
        return None
    state = load_checkpoint(last, template)
    step = int(re.fullmatch(r"checkpoint-(\d+)", last.name).group(1))
    return state, step


# ---------------------------------------------------------------------------
# HF export (inverse of models/loader.convert_hf_state_dict)
# ---------------------------------------------------------------------------

def params_to_hf_state_dict(params: dict, cfg) -> dict[str, np.ndarray]:
    """Our stacked pytree -> flat HF-named tensors (torch layout, [out, in])."""
    sd: dict[str, np.ndarray] = {}

    def t(x):
        return np.asarray(jax.device_get(x), dtype=np.float32)

    v, tc = cfg.vision, cfg.text
    vis = params.get("visual")   # text-only families (the MoE judge) skip it
    if vis is None:
        blocks = None
    else:
        sd["visual.patch_embed.proj.weight"] = t(vis["patch_embed"]["kernel"]).T.reshape(
            v.hidden_size, v.in_channels, v.temporal_patch_size, v.patch_size, v.patch_size)
        blocks = vis["blocks"]
    for i in range(v.depth if vis is not None else 0):
        p = f"visual.blocks.{i}"
        sd[f"{p}.norm1.weight"] = t(blocks["norm1"]["scale"][i])
        sd[f"{p}.norm2.weight"] = t(blocks["norm2"]["scale"][i])
        sd[f"{p}.attn.qkv.weight"] = t(blocks["attn"]["qkv"]["kernel"][i]).T
        sd[f"{p}.attn.qkv.bias"] = t(blocks["attn"]["qkv"]["bias"][i])
        sd[f"{p}.attn.proj.weight"] = t(blocks["attn"]["proj"]["kernel"][i]).T
        sd[f"{p}.attn.proj.bias"] = t(blocks["attn"]["proj"]["bias"][i])
        for hf, ours in (("gate_proj", "gate"), ("up_proj", "up"), ("down_proj", "down")):
            sd[f"{p}.mlp.{hf}.weight"] = t(blocks["mlp"][ours]["kernel"][i]).T
            sd[f"{p}.mlp.{hf}.bias"] = t(blocks["mlp"][ours]["bias"][i])
    if vis is not None:
        sd["visual.merger.ln_q.weight"] = t(vis["merger"]["ln_q"]["scale"])
        sd["visual.merger.mlp.0.weight"] = t(vis["merger"]["fc1"]["kernel"]).T
        sd["visual.merger.mlp.0.bias"] = t(vis["merger"]["fc1"]["bias"])
        sd["visual.merger.mlp.2.weight"] = t(vis["merger"]["fc2"]["kernel"]).T
        sd["visual.merger.mlp.2.bias"] = t(vis["merger"]["fc2"]["bias"])

    model = params["model"]
    sd["model.embed_tokens.weight"] = t(model["embed_tokens"]["embedding"])
    L = tc.num_hidden_layers
    lay = model["layers"]
    for i in range(L):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = t(lay["input_layernorm"]["scale"][i])
        sd[f"{p}.post_attention_layernorm.weight"] = t(
            lay["post_attention_layernorm"]["scale"][i])
        for hf, ours in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v")):
            sd[f"{p}.self_attn.{hf}.weight"] = t(lay["attn"][ours]["kernel"][i]).T
            if "bias" in lay["attn"][ours]:
                sd[f"{p}.self_attn.{hf}.bias"] = t(lay["attn"][ours]["bias"][i])
        sd[f"{p}.self_attn.o_proj.weight"] = t(lay["attn"]["o"]["kernel"][i]).T
        if "q_norm" in lay["attn"]:   # Qwen3 family per-head q/k norms
            sd[f"{p}.self_attn.q_norm.weight"] = t(lay["attn"]["q_norm"]["scale"][i])
            sd[f"{p}.self_attn.k_norm.weight"] = t(lay["attn"]["k_norm"]["scale"][i])
        if "router" in lay["mlp"]:    # MoE: router + per-expert projections
            sd[f"{p}.mlp.gate.weight"] = t(lay["mlp"]["router"]["kernel"][i]).T
            for hf, ours in (("gate_proj", "gate"), ("up_proj", "up"),
                             ("down_proj", "down")):
                w = t(lay["mlp"]["experts"][ours]["kernel"][i])  # [E, K, N]
                for e in range(w.shape[0]):
                    sd[f"{p}.mlp.experts.{e}.{hf}.weight"] = w[e].T
        else:
            for hf, ours in (("gate_proj", "gate"), ("up_proj", "up"),
                             ("down_proj", "down")):
                sd[f"{p}.mlp.{hf}.weight"] = t(lay["mlp"][ours]["kernel"][i]).T
    sd["model.norm.weight"] = t(model["norm"]["scale"])
    if not tc.tie_word_embeddings and "lm_head" in params:
        sd["lm_head.weight"] = t(params["lm_head"]["kernel"]).T
    return sd


def export_hf_checkpoint(params: dict, cfg, out_dir: str | Path,
                         dtype: str = "float32") -> Path:
    """Write HF-compatible safetensors (merge_lora_weights.py equivalent)."""
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sd = params_to_hf_state_dict(params, cfg)
    if dtype != "float32":
        sd = {k: v.astype(dtype) for k, v in sd.items()}
    save_file(sd, str(out_dir / "model.safetensors"))
    return out_dir
