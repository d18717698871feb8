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
from .optim import OptimConfig, make_optimizer
from .sft import SFTConfig, TrainState, init_train_state, make_sft_step, sft_loss

__all__ = [
    "GRPOConfig", "GRPOTrainState", "combine_rewards",
    "completion_mask_from_ids", "compute_advantages", "grpo_loss",
    "make_grpo_step", "per_token_logps", "GRPORunner",
    "OptimConfig", "make_optimizer",
    "SFTConfig", "TrainState", "init_train_state", "make_sft_step", "sft_loss",
]
