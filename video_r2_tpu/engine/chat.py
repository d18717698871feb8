"""Chat templating + tokenizer plumbing for Qwen2.5-VL conversations.

Renders OpenAI-style messages to the Qwen chat format and expands vision
placeholders to the exact pad-token counts the model expects (what
`processor.apply_chat_template` + processor packing do in the reference,
e.g. demo/gradio_demo.py:64-76). Tokenizer is pluggable: the real HF tokenizer
when its files are available, or a deterministic byte-level fallback for
offline tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..models.config import ModelConfig

IM_START = "<|im_start|>"
IM_END = "<|im_end|>"
VISION_START = "<|vision_start|>"
VISION_END = "<|vision_end|>"
IMAGE_PAD = "<|image_pad|>"
VIDEO_PAD = "<|video_pad|>"

DEFAULT_SYSTEM = "You are a helpful assistant."


def render_messages(messages: list[dict], add_generation_prompt: bool = True,
                    default_system: str | None = DEFAULT_SYSTEM) -> str:
    """Messages -> Qwen chatml text with single <|image_pad|>/<|video_pad|>
    placeholders (expanded later by `expand_vision_placeholders`)."""
    parts = []
    has_system = any(m["role"] == "system" for m in messages)
    if not has_system and default_system is not None:
        parts.append(f"{IM_START}system\n{default_system}{IM_END}\n")
    for m in messages:
        content = m["content"]
        if isinstance(content, str):
            text = content
        else:
            frags = []
            for ele in content:
                etype = ele.get("type", "")
                if "image" in ele or etype == "image" or "image_url" in ele:
                    frags.append(f"{VISION_START}{IMAGE_PAD}{VISION_END}")
                elif "video" in ele or etype == "video":
                    frags.append(f"{VISION_START}{VIDEO_PAD}{VISION_END}")
                elif "text" in ele:
                    frags.append(ele["text"])
            text = "".join(frags)
        parts.append(f"{IM_START}{m['role']}\n{text}{IM_END}\n")
    if add_generation_prompt:
        parts.append(f"{IM_START}assistant\n")
    return "".join(parts)


def expand_vision_placeholders(text: str, video_token_counts: list[int],
                               image_token_counts: list[int]) -> str:
    """Replace each single pad placeholder with its token-count repetition
    (processor parity: count = prod(grid_thw) / merge_size**2)."""
    for n in video_token_counts:
        text = text.replace(VIDEO_PAD, "\0VID" + "\0" * (n - 1), 1)
    for n in image_token_counts:
        text = text.replace(IMAGE_PAD, "\0IMG" + "\0" * (n - 1), 1)
    # second pass to avoid interference from repeated replacements
    out = []
    i = 0
    while i < len(text):
        if text.startswith("\0VID", i):
            n = 1
            j = i + 4
            while j < len(text) and text[j] == "\0":
                n += 1
                j += 1
            out.append(VIDEO_PAD * n)
            i = j
        elif text.startswith("\0IMG", i):
            n = 1
            j = i + 4
            while j < len(text) and text[j] == "\0":
                n += 1
                j += 1
            out.append(IMAGE_PAD * n)
            i = j
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


class ByteTokenizer:
    """Deterministic offline tokenizer: bytes 0-255 plus the Qwen special
    tokens at their real ids. For tests and random-weight benchmarks only."""

    SPECIALS = {
        "<|endoftext|>": 151643,
        IM_START: 151644,
        IM_END: 151645,
        VISION_START: 151652,
        VISION_END: 151653,
        IMAGE_PAD: 151655,
        VIDEO_PAD: 151656,
    }

    eos_token_id = 151645
    pad_token_id = 151643

    def __init__(self, specials: dict[str, int] | None = None):
        self.specials = dict(specials or self.SPECIALS)
        self.id_to_special = {v: k for k, v in self.specials.items()}

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        i = 0
        while i < len(text):
            matched = False
            for tok, tid in self.specials.items():
                if text.startswith(tok, i):
                    ids.append(tid)
                    i += len(tok)
                    matched = True
                    break
            if not matched:
                ids.extend(text[i].encode("utf-8"))
                i += 1
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        out: list[str] = []
        buf: list[int] = []
        for t in (int(x) for x in ids):
            if t in self.id_to_special:
                if buf:
                    out.append(bytes(buf).decode("utf-8", errors="replace"))
                    buf = []
                if not skip_special_tokens:
                    out.append(self.id_to_special[t])
            elif 0 <= t < 256:
                buf.append(t)
        if buf:
            out.append(bytes(buf).decode("utf-8", errors="replace"))
        return "".join(out)


def load_tokenizer(path_or_name: str | None):
    """Resolution order: HF fast tokenizer -> our native BPE (vocab.json +
    merges.txt with the C++ merge engine) -> offline byte fallback."""
    if path_or_name:
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(path_or_name, local_files_only=True)
        except Exception:
            pass
        try:
            from .bpe import BPETokenizer

            return BPETokenizer.from_pretrained(path_or_name)
        except Exception:
            pass
    return ByteTokenizer()


@dataclass
class PackedPrompts:
    input_ids: np.ndarray   # [B, S] right-padded
    lengths: np.ndarray     # [B]


def pack_prompts(token_lists: list[list[int]], pad_id: int,
                 pad_to_multiple: int = 64) -> PackedPrompts:
    """Right-pad a batch to a bucketed length (stable jit shapes)."""
    lengths = np.asarray([len(t) for t in token_lists], dtype=np.int32)
    smax = int(lengths.max())
    smax = -(-smax // pad_to_multiple) * pad_to_multiple
    ids = np.full((len(token_lists), smax), pad_id, dtype=np.int32)
    for i, t in enumerate(token_lists):
        ids[i, : len(t)] = t
    return PackedPrompts(ids, lengths)
