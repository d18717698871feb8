from .grpo import (
    GRPOConfig,
    GRPOTrainState,
    combine_rewards,
    completion_mask_from_ids,
    compute_advantages,
    grpo_loss,
    make_grpo_step,
    per_token_logps,
)
from .grpo_runner import GRPORunner
from .lora import (
    LoRAConfig,
    LoRATrainState,
    attach_lora,
    init_lora,
    init_lora_for_quantized,
    make_lora_grpo_step,
    make_lora_sft_step,
    merge_lora,
)
from .optim import OptimConfig, make_optimizer
from .sft import SFTConfig, TrainState, init_train_state, make_sft_step, sft_loss

__all__ = [
    "LoRAConfig", "LoRATrainState", "attach_lora", "init_lora",
    "init_lora_for_quantized", "make_lora_grpo_step", "make_lora_sft_step",
    "merge_lora",
    "GRPOConfig", "GRPOTrainState", "combine_rewards",
    "completion_mask_from_ids", "compute_advantages", "grpo_loss",
    "make_grpo_step", "per_token_logps", "GRPORunner",
    "OptimConfig", "make_optimizer",
    "SFTConfig", "TrainState", "init_train_state", "make_sft_step", "sft_loss",
]
