"""Benchmark of record: decode tokens/sec/chip on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs the generation engine (prefill + jitted scan decode, Pallas flash
attention for prefill) on the largest family config that fits one v5e chip
(Qwen2.5-VL-3B sibling; the 7B target is multi-chip). Baseline reference:
A100-class batched decode throughput for the reference stack (~2000 tok/s
aggregated at 7B with HF generate; BASELINE.md 'A100-class decode
tokens/sec/chip').
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from video_r2_tpu.engine import SamplingParams, generate
    from video_r2_tpu.models import init_params, qwen25vl_3b

    cfg = qwen25vl_3b()
    params = init_params(cfg, dtype="bfloat16", method="zeros")

    B, prompt_len, new_tokens = 128, 512, 128
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 150000, size=(B, prompt_len)).astype(np.int32)
    lengths = np.full((B,), prompt_len, np.int32)
    sp = SamplingParams(max_new_tokens=new_tokens,
                        pad_token_id=cfg.pad_token_id)

    def run(seed):
        return generate(params, cfg, ids, lengths, sp, seed=seed, attn_impl="flash")

    run(0)  # compile
    t0 = time.perf_counter()
    n_iters = 3
    for i in range(n_iters):
        res = run(i + 1)
    dt = (time.perf_counter() - t0) / n_iters
    toks_per_sec = B * new_tokens / dt

    baseline = 2000.0  # A100-class aggregated decode tok/s (7B, HF stack)
    print(json.dumps({
        "metric": f"decode_tokens_per_sec_chip_qwen25vl3b_b{B}",
        "value": round(toks_per_sec, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(toks_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
