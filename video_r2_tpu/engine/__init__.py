from .chat import (
    ByteTokenizer,
    PackedPrompts,
    expand_vision_placeholders,
    load_tokenizer,
    pack_prompts,
    render_messages,
)
from .continuous import ContinuousEngine, PagedContinuousEngine
from .generate import GenerationResult, decode, generate, prefill
from .sampling import SamplingParams, sample_token

__all__ = [
    "ByteTokenizer", "PackedPrompts", "expand_vision_placeholders",
    "load_tokenizer", "pack_prompts", "render_messages",
    "ContinuousEngine", "PagedContinuousEngine",
    "GenerationResult", "decode", "generate", "prefill",
    "SamplingParams", "sample_token",
]
