"""Phase breakdown of the bench workload on the real chip.

Times prefill and decode separately (jitted scalar-reduction timing per
CLAUDE.md), at the bench config (7B int8, B=64, S=256, 128 new tokens).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from video_r2_tpu.engine import SamplingParams
from video_r2_tpu.engine.generate import decode, prefill
from video_r2_tpu.models import qwen25vl_7b
from video_r2_tpu.models.mrope import get_rope_index
from video_r2_tpu.models.quant import init_params_quantized_zeros


def timed(fn, n=3):
    fn()  # compile/warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    import sys
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = qwen25vl_7b()
    params = init_params_quantized_zeros(cfg, bits=bits)
    S, T = 256, 128
    print(f"bits={bits} B={B}")
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 150000, size=(B, S)).astype(np.int32)
    lengths = np.full((B,), S, np.int32)
    sp = SamplingParams(max_new_tokens=T, pad_token_id=cfg.pad_token_id)

    mask = (np.arange(S)[None, :] < lengths[:, None]).astype(np.int64)
    position_ids, deltas = get_rope_index(ids, cfg, attention_mask=mask)
    rope_deltas = np.asarray(deltas[:, 0]) + (S - lengths)
    max_cache = S + T

    ids_d = jnp.asarray(ids)
    pos_d = jnp.asarray(position_ids)
    len_d = jnp.asarray(lengths)
    rd_d = jnp.asarray(rope_deltas)
    key = jax.random.PRNGKey(0)

    import os
    aq = os.environ.get("VR2_ACT_QUANT") or None

    def run_prefill():
        logits, cache = prefill(params, cfg, ids_d, pos_d, len_d, max_cache,
                                attn_impl="flash", act_quant=aq)
        float(logits.sum())
        return logits, cache

    run_prefill()
    t_prefill = timed(lambda: run_prefill())
    print(f"prefill({B}x{S}): {t_prefill*1e3:.1f} ms "
          f"({B*S/t_prefill:.0f} tok/s)")

    def run_decode():
        # decode donates its cache, so re-prefill each iteration and
        # subtract the known prefill time
        lg, ch = prefill(params, cfg, ids_d, pos_d, len_d, max_cache,
                         attn_impl="flash", act_quant=aq)
        toks, logps, gl, _ = decode(params, cfg, sp, lg, ch, len_d, rd_d,
                                    key, attn_impl="flash")
        float(gl.sum())

    t_decode = timed(run_decode) - t_prefill
    print(f"decode({T} steps): {t_decode*1e3:.1f} ms "
          f"({t_decode/T*1e3:.2f} ms/step, {B*T/t_decode:.0f} tok/s)")
    total = t_prefill + t_decode
    print(f"total: {total*1e3:.1f} ms -> {B*T/total:.0f} tok/s amortized")


if __name__ == "__main__":
    main()
