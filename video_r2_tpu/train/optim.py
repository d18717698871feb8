"""Optimizer with per-component learning rates (SFT trainer parity).

The reference builds 6 param groups — {decoder, vision tower, merger} x
{decay, no-decay} with separate vision_lr / merger_lr
(train/src/trainer/sft_trainer.py:37-135). Here the same grouping is an
optax.multi_transform keyed by param path; schedule is cosine with linear
warmup (train_sft.sh:58-59).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import optax


@dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-5
    vision_lr: float | None = 2e-6
    merger_lr: float | None = 1e-5
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    schedule: str = "cosine"          # "cosine" | "constant"
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    # freeze flags (train_sft.sh:42-44 freeze_vision/freeze_llm/freeze_merger)
    freeze_vision: bool = False
    freeze_llm: bool = False
    freeze_merger: bool = False


def _path_str(keypath) -> str:
    parts = []
    for k in keypath:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def classify_param(path: str, leaf) -> str:
    """-> one of base/vision/merger x decay/nodecay, or 'frozen'."""
    if path.startswith("visual/merger"):
        comp = "merger"
    elif path.startswith("visual"):
        comp = "vision"
    else:
        comp = "base"
    nodecay = leaf.ndim <= 1 or "scale" in path or "bias" in path
    return f"{comp}_{'nodecay' if nodecay else 'decay'}"


def _schedule(lr: float, cfg: OptimConfig):
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 0)
    if cfg.schedule == "constant":
        if warmup == 0:
            return lr
        return optax.linear_schedule(0.0, lr, warmup)
    return optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(cfg.total_steps, warmup + 1), end_value=0.0)


def make_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    labels = jax.tree_util.tree_map_with_path(
        lambda kp, leaf: classify_param(_path_str(kp), leaf), params)

    frozen_components = set()
    if cfg.freeze_vision:
        frozen_components.add("vision")
    if cfg.freeze_llm:
        frozen_components.add("base")
    if cfg.freeze_merger:
        frozen_components.add("merger")
    labels = jax.tree_util.tree_map(
        lambda lab: "frozen" if lab.split("_")[0] in frozen_components else lab,
        labels)

    def adamw(lr: float, wd: float):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(_schedule(lr, cfg), b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                        weight_decay=wd),
        )

    vision_lr = cfg.vision_lr if cfg.vision_lr is not None else cfg.learning_rate
    merger_lr = cfg.merger_lr if cfg.merger_lr is not None else cfg.learning_rate
    transforms = {
        "base_decay": adamw(cfg.learning_rate, cfg.weight_decay),
        "base_nodecay": adamw(cfg.learning_rate, 0.0),
        "vision_decay": adamw(vision_lr, cfg.weight_decay),
        "vision_nodecay": adamw(vision_lr, 0.0),
        "merger_decay": adamw(merger_lr, cfg.weight_decay),
        "merger_nodecay": adamw(merger_lr, 0.0),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, labels)
