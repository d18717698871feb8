from .constants import (
    DEFAULT_SYSTEM_MESSAGE,
    IGNORE_INDEX,
    IMAGE_PAD,
    LLAVA_IMAGE_TOKEN,
    LLAVA_VIDEO_TOKEN,
    VIDEO_PAD,
)
from .config import DataConfig
from .conversion import llava_to_openai, replace_media_tokens, strip_media_tokens
from .sft import SFTBatch, SFTCollator, SFTDataset
from .grpo import GRPODataset

__all__ = [
    "DEFAULT_SYSTEM_MESSAGE", "IGNORE_INDEX", "IMAGE_PAD",
    "LLAVA_IMAGE_TOKEN", "LLAVA_VIDEO_TOKEN", "VIDEO_PAD",
    "DataConfig", "llava_to_openai", "replace_media_tokens",
    "strip_media_tokens",
    "SFTBatch", "SFTCollator", "SFTDataset", "GRPODataset",
]
