"""Training metrics logging: JSONL stream + console, tensorboard-optional.

The reference reports to tensorboard (train_sft.sh:63) and wandb completion
tables (grpo_trainer.py:1205-1227). Offline-first here: every step's metrics
append to metrics.jsonl (greppable, plottable), optional tensorboardX when
available, and GRPO completion samples log to completions.jsonl.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, output_dir: str | Path, tensorboard: bool = False):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a")
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.dir / "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: dict) -> None:
        row = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in row.items():
                if isinstance(v, float) and k not in ("time",):
                    self._tb.add_scalar(k, v, step)

    def log_completions(self, step: int, prompts: list[str],
                        completions: list[str], rewards: dict[str, list[float]]):
        """GRPO completion-table logging (rich/wandb table equivalent)."""
        with open(self.dir / "completions.jsonl", "a") as f:
            for i, (p, c) in enumerate(zip(prompts, completions)):
                f.write(json.dumps({
                    "step": step, "prompt": p[-500:], "completion": c,
                    **{k: v[i] for k, v in rewards.items()},
                }) + "\n")

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
