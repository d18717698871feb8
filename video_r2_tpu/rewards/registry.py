"""Reward function discovery by name.

Parity: train/src/utils.py:116-157 — any `*_reward` callable in the rewards
package is loadable by name; unknown names raise with the available list.
"""

from __future__ import annotations

import inspect
from typing import Callable


def _discover() -> dict[str, Callable]:
    from . import accuracy, format as format_mod, temporal

    funcs: dict[str, Callable] = {}
    for mod in (accuracy, format_mod, temporal):
        for name, obj in inspect.getmembers(mod, inspect.isfunction):
            if name.endswith("_reward"):
                funcs[name] = obj
    return funcs


def load_reward_funcs(names: list[str]) -> list[Callable]:
    available = _discover()
    out = []
    for name in names:
        key = name if name.endswith("_reward") else f"{name}_reward"
        if key not in available:
            raise ValueError(
                f"Unknown reward function {name!r}; available: "
                f"{sorted(available)}")
        out.append(available[key])
    return out
