"""LoRA adapters on the stacked param tree.

Parity surface: the reference trains LoRA r=64 alpha=64 on all linear modules
except lm_head/embeddings (train_sft.sh:30-36, train_sft.py:145-175 via peft),
with the adapter-disable trick providing the GRPO reference policy
(grpo_trainer.py:340-343). Here adapters are a separate pytree; the effective
weight W + (alpha/r) * A @ B is formed inside jit (XLA fuses it into the
consumer matmul), gradients flow only to adapter leaves, and `merge_lora`
produces plain params for export/serving (merge_lora_weights.py equivalent).
Disabling the adapter == using the base params — the ref-policy trick for
free.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# kernels eligible for adaptation: path suffixes (stacked or not)
DEFAULT_TARGETS = (
    ("attn", "q", "kernel"), ("attn", "k", "kernel"), ("attn", "v", "kernel"),
    ("attn", "o", "kernel"),
    ("mlp", "gate", "kernel"), ("mlp", "up", "kernel"), ("mlp", "down", "kernel"),
    ("attn", "qkv", "kernel"), ("attn", "proj", "kernel"),
)


@dataclass(frozen=True)
class LoRAConfig:
    r: int = 64
    alpha: int = 64
    targets: tuple = DEFAULT_TARGETS
    include_vision: bool = False   # freeze_vision default in train_sft.sh
    include_merger: bool = False

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def _path_tuple(keypath):
    return tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)


def _is_target(path: tuple[str, ...], cfg: LoRAConfig) -> bool:
    if path[0] == "visual":
        if "merger" in path and not cfg.include_merger:
            return False
        if "merger" not in path and not cfg.include_vision:
            return False
    return any(path[-len(t):] == t for t in cfg.targets)


def init_lora(params: dict, cfg: LoRAConfig, seed: int = 0,
              dtype=jnp.float32) -> dict:
    """A ~ kaiming-ish normal, B = 0 (peft default) for each targeted kernel.
    Stacked kernels [L, in, out] get stacked adapters [L, in, r] / [L, r, out]."""
    rng = np.random.default_rng(seed)

    def f(keypath, leaf):
        path = _path_tuple(keypath)
        if not _is_target(path, cfg):
            return None
        *lead, d_in, d_out = leaf.shape
        a = rng.normal(0, 1.0 / cfg.r, (*lead, d_in, cfg.r)).astype(np.float32)
        b = np.zeros((*lead, cfg.r, d_out), np.float32)
        return {"a": jnp.asarray(a, dtype), "b": jnp.asarray(b, dtype)}

    tree = jax.tree_util.tree_map_with_path(f, params)
    return _prune_none(tree)


def _prune_none(tree):
    if isinstance(tree, dict):
        out = {k: _prune_none(v) for k, v in tree.items()}
        return {k: v for k, v in out.items() if v is not None} or None
    return tree


def apply_lora(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Effective params: W + scaling * A @ B for adapted leaves (inside jit;
    the lora tree mirrors params with {a, b} dicts at the module level)."""

    def walk(p, l):
        if l is None:
            return p
        if isinstance(l, dict) and "a" in l and not isinstance(l["a"], dict):
            # p is the kernel array itself (lora mirrors down to the leaf)
            delta = jnp.einsum("...ir,...ro->...io", l["a"], l["b"]) * cfg.scaling
            return p + delta.astype(p.dtype)
        return {k: walk(v, l.get(k) if isinstance(l, dict) else None)
                for k, v in p.items()} if isinstance(p, dict) else p

    return walk(params, lora)


def merge_lora(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Concrete merged params for export/serving."""
    return jax.tree_util.tree_map(lambda x: x, apply_lora(params, lora, cfg))


def attach_lora(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Inject adapters as {lora_a, lora_b, lora_scale} next to the kernel so
    layers.linear computes y = base_matmul(x) + (x@A)@B*s WITHOUT forming
    W + AB. Works over dense AND int8-quantized bases (QLoRA)."""

    def walk(p, l):
        if l is None:
            return p
        if isinstance(l, dict) and "a" in l and not isinstance(l["a"], dict):
            # p is the kernel leaf; the module dict gets the lora triple —
            # handled one level up
            return p
        if isinstance(p, dict):
            out = {}
            for k, v in p.items():
                sub_l = l.get(k) if isinstance(l, dict) else None
                out[k] = walk(v, sub_l)
            # adapter for this module's kernel (dense or quantized)?
            kernel_lora = l.get("kernel") if isinstance(l, dict) else None
            if (isinstance(kernel_lora, dict) and "a" in kernel_lora
                    and not isinstance(kernel_lora["a"], dict)):
                out["lora_a"] = kernel_lora["a"]
                out["lora_b"] = kernel_lora["b"] * cfg.scaling
            return out
        return p

    return walk(params, lora)


def init_lora_for_quantized(params: dict, cfg: LoRAConfig, seed: int = 0,
                            dtype=jnp.float32) -> dict:
    """init_lora over a quantized base: targets kernel_q leaves with adapters
    shaped from the int8 kernels."""
    rng = np.random.default_rng(seed)

    def f(keypath, leaf):
        path = _path_tuple(keypath)
        if path[-1] != "kernel_q":
            return None
        mod_path = path[:-1] + ("kernel",)
        if not _is_target(mod_path, cfg):
            return None
        *lead, d_in, d_out = leaf.shape
        a = rng.normal(0, 1.0 / cfg.r, (*lead, d_in, cfg.r)).astype(np.float32)
        b = np.zeros((*lead, cfg.r, d_out), np.float32)
        return {"a": jnp.asarray(a, dtype), "b": jnp.asarray(b, dtype)}

    tree = jax.tree_util.tree_map_with_path(f, params)
    # rename kernel_q keys back to kernel so attach_lora finds them
    def rename(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                out["kernel" if k == "kernel_q" else k] = rename(v)
            return out
        return node

    return _prune_none(rename(tree))


class LoRATrainState(NamedTuple):
    lora: Any
    opt_state: Any
    step: jax.Array


def _finalize_lora_step(step_fn, base_params, mesh, donate: bool):
    """Shared tail of the LoRA step factories. The base params flow into
    the jitted step as an ARGUMENT (not a closure): closing over a 7B base
    bakes ~9 GB of constants into every compiled variant (603 s compile on
    chip, re-embedded per batch bucket — VERDICT r4 #3). As an argument the
    buffers are shared across variants and never re-shipped. With a mesh
    the base shards by the parallel/sharding rules (adapters are small and
    stay replicated; GSPMD partitions the x@A@B matmuls from the base's
    layout) and the step gains the standard .shard_batch."""
    if mesh is not None:
        from ..parallel.sharding import shard_params

        base_params = shard_params(base_params, mesh)  # idempotent

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def step(state: LoRATrainState, batch):
        return jitted(state, base_params, batch)

    step.jitted = jitted  # exposed so tests can lower + assert no baked base
    step.base_params = base_params
    if mesh is not None:
        from .sft import make_batch_sharder

        step.shard_batch = make_batch_sharder(mesh)
    return step


def make_lora_sft_step(base_params, model_cfg, sft_cfg, lora_cfg: LoRAConfig,
                       optimizer, video_layout=None, donate: bool = True,
                       mesh=None, image_layout=None):
    """SFT step where ONLY adapter weights train (the reference's shipped
    recipe: LoRA r=64 a=64 over a frozen base, train_sft.sh:30-44).
    Uses the attach form — y = base(x) + (x@A)@B — so the base can be int8
    (QLoRA) and W + AB is never materialized."""
    from .sft import sft_loss

    def loss_fn(lora, base, batch):
        eff = attach_lora(base, lora, lora_cfg)
        return sft_loss(eff, model_cfg, batch, sft_cfg, video_layout,
                        image_layout)

    def step_fn(state: LoRATrainState, base, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.lora, base, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        return LoRATrainState(lora, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": optax.global_norm(grads)}

    return _finalize_lora_step(step_fn, base_params, mesh, donate)


def make_lora_grpo_step(base_params, model_cfg, grpo_cfg, lora_cfg: LoRAConfig,
                        optimizer, video_layout=None, donate: bool = True,
                        mesh=None):
    """GRPO step training ONLY adapters. The reference policy is the base
    params with adapters disabled — exactly the reference's PEFT
    disable_adapter trick (grpo_trainer.py:340-343), so no reference-model
    copy exists at all. Works over dense or int8 (QLoRA) bases."""
    from .grpo import grpo_loss

    def loss_fn(lora, base, batch):
        eff = attach_lora(base, lora, lora_cfg)
        return grpo_loss(eff, model_cfg, grpo_cfg, batch, video_layout)

    def step_fn(state: LoRATrainState, base, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.lora, base, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return LoRATrainState(lora, opt_state, state.step + 1), metrics

    return _finalize_lora_step(step_fn, base_params, mesh, donate)


def lora_param_count(lora: dict) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora))
