"""Format reward: full-match <think>...</think><answer>...</answer>.
Parity: train/src/train/reward_funcs.py:79-88."""

from __future__ import annotations

import re

_PATTERN = re.compile(r"<think>.*?</think>\s*<answer>.*?</answer>", re.DOTALL)


def format_reward(completions, **kwargs) -> list[float]:
    contents = [c[0]["content"] for c in completions]
    return [1.0 if _PATTERN.fullmatch(c) else 0.0 for c in contents]
