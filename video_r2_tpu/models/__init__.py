from .config import (
    ModelConfig,
    TextConfig,
    VisionConfig,
    qwen25vl_3b,
    qwen25vl_7b,
    qwen25vl_72b,
    tiny_test_config,
)
from .decoder import KVCache, causal_mask_bias, decode_mask_bias, decoder_forward
from .loader import convert_hf_state_dict, init_params, load_hf_checkpoint, param_count
from .model import embed_inputs, forward, lm_head, merge_vision_embeddings
from .mrope import get_rope_index, mrope_cos_sin
from .vision import VisionLayout, plan_vision_layout, vit_forward

__all__ = [
    "ModelConfig", "TextConfig", "VisionConfig",
    "qwen25vl_3b", "qwen25vl_7b", "qwen25vl_72b", "tiny_test_config",
    "KVCache", "causal_mask_bias", "decode_mask_bias", "decoder_forward",
    "convert_hf_state_dict", "init_params", "load_hf_checkpoint", "param_count",
    "embed_inputs", "forward", "lm_head", "merge_vision_embeddings",
    "get_rope_index", "mrope_cos_sin",
    "VisionLayout", "plan_vision_layout", "vit_forward",
]
