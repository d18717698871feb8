from .optim import OptimConfig, make_optimizer
from .sft import SFTConfig, TrainState, init_train_state, make_sft_step, sft_loss

__all__ = [
    "OptimConfig", "make_optimizer",
    "SFTConfig", "TrainState", "init_train_state", "make_sft_step", "sft_loss",
]
