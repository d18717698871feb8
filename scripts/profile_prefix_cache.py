"""On-chip profile: automatic prefix caching on the paged engine.

Workload = the co-located judge role (EngineJudge / TAC / VAS / TAR): every
request repeats the same long system+rubric prefix and differs only in a
short user tail + a short completion. With APC the engine prefills only the
tail after the first request; without it every request pays the full-prompt
prefill.

Run ON THE CHIP (no env overrides):  python scripts/profile_prefix_cache.py
Options: --requests N --prefix P --tail T --mnt M --slots S [--kv-quant int8]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def run(engine_kwargs, prompts, mnt, params, cfg, sp):
    from video_r2_tpu.engine.continuous import PagedContinuousEngine

    eng = PagedContinuousEngine(params, cfg, **engine_kwargs)
    # warm compiles: one cold submit + drain, then reset by rebuilding
    rid = eng.submit(prompts[0], max_new_tokens=mnt)
    while eng.num_active:
        eng.step(steps=8)
    if engine_kwargs.get("prefix_cache", True):
        rid = eng.submit(prompts[1], max_new_tokens=mnt)  # warm suffix path
        while eng.num_active:
            eng.step(steps=8)
    eng = PagedContinuousEngine(params, cfg, **engine_kwargs)

    t0 = time.perf_counter()
    done = 0
    queue = list(prompts)
    while queue or eng.num_active:
        while queue and eng.num_active < eng.num_slots:
            if eng.submit(queue[0], max_new_tokens=mnt) is None:
                break
            queue.pop(0)
        if eng.num_active:
            done += len(eng.step(steps=8))
    dt = time.perf_counter() - t0
    assert done == len(prompts), (done, len(prompts))
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--prefix", type=int, default=1024)
    ap.add_argument("--tail", type=int, default=64)
    ap.add_argument("--mnt", type=int, default=64)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--kv-quant", default="int8")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random model on CPU (plumbing check)")
    args = ap.parse_args()

    import numpy as np

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from video_r2_tpu.models import init_params, tiny_test_config

        cfg = tiny_test_config()
        params = init_params(cfg, dtype="float32")
        kv_quant = None
        buckets = (64, 128, 256)
        page_size = 16
    else:
        from video_r2_tpu.models import qwen25vl_7b
        from video_r2_tpu.models.quant import init_params_quantized_zeros

        cfg = qwen25vl_7b()
        params = init_params_quantized_zeros(cfg)
        kv_quant = args.kv_quant or None
        buckets = (128, 256, 512, 1024, 2048)
        page_size = 128

    from video_r2_tpu.engine import SamplingParams

    rng = np.random.default_rng(0)
    shared = list(rng.integers(2, 150000, size=args.prefix))
    prompts = [shared + list(rng.integers(2, 150000, size=args.tail))
               for _ in range(args.requests)]
    sp = SamplingParams(pad_token_id=cfg.pad_token_id, eos_token_ids=())

    base = dict(num_slots=args.slots, max_len=args.max_len, sp=sp,
                attn_impl="flash" if not args.tiny else "xla",
                prompt_buckets=buckets, page_size=page_size,
                kv_quant=kv_quant)
    for apc in (False, True):
        dt = run(dict(base, prefix_cache=apc), prompts, args.mnt,
                 params, cfg, sp)
        rps = args.requests / dt
        print(f"prefix_cache={apc}: {dt:.2f}s total, {rps:.2f} req/s "
              f"({args.requests} reqs, prefix {args.prefix} + tail "
              f"{args.tail}, {args.mnt} new tokens)")


if __name__ == "__main__":
    main()
