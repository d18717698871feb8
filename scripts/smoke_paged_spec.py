"""On-chip Mosaic compile + parity smoke for the PAGED engine's
speculative-decode path — the stacked multi-query paged attention kernel
takes [B, W, nh, hd] verify chunks with per-row offset masks, a BlockSpec
pattern interpret mode never validates (the r5 ragged scale-block
rejection was exactly this class). bf16 pages AND int8 pages (scale-page
scatters at per-token (page, offset) coords).

Run on the real chip: python scripts/smoke_paged_spec.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "tiny":
        # CPU pipe-clean: env var alone is NOT enough — the ambient
        # sitecustomize imports jax at interpreter start (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from video_r2_tpu.engine.continuous import PagedContinuousEngine  # noqa: E402
    from video_r2_tpu.engine.generate import generate  # noqa: E402
    from video_r2_tpu.engine.sampling import SamplingParams  # noqa: E402
    from video_r2_tpu.models import qwen25vl_3b, tiny_test_config  # noqa: E402
    from video_r2_tpu.models.loader import init_params  # noqa: E402
    from video_r2_tpu.models.quant import init_params_quantized_zeros  # noqa: E402

    tiny = len(sys.argv) > 1 and sys.argv[1] == "tiny"
    if tiny:   # CPU pipe-clean: random tiny weights, real token paths
        cfg = tiny_test_config()
        params = init_params(cfg, dtype="float32")
    else:
        cfg = qwen25vl_3b()
        params = init_params_quantized_zeros(cfg)
    rng = np.random.default_rng(0)
    T = 16
    base = rng.integers(2, 1000, 16).tolist()
    prompts = [(base * 8)[:100], (base * 8)[:64]]   # repetitive: drafts hit
    sp = SamplingParams(max_new_tokens=T, eos_token_ids=(),
                        pad_token_id=cfg.pad_token_id)

    def pool(spec, kv):
        # page_size=128: int8 scale pages must stay 128-lane aligned on
        # real Mosaic (the guard this smoke caught the need for)
        eng = PagedContinuousEngine(
            params, cfg, num_slots=2, max_len=256, sp=sp,
            prompt_buckets=(128,), page_size=128, spec_decode=spec,
            kv_quant=kv)
        rids = [eng.submit(list(p), max_new_tokens=T) for p in prompts]
        done = {}
        while eng.num_active:
            for rid, toks in eng.step():
                done[rid] = toks
        return [done[r] for r in rids], eng.spec_stats

    for kv in (None, "int8"):
        t0 = time.perf_counter()
        plain, _ = pool(0, kv)
        specd, s = pool(4, kv)
        # THE contract (test_paged_spec_matches_plain_paged): spec emits
        # token-identical streams to the plain paged engine at the same
        # pool geometry. Cross-PROGRAM comparisons (pooled engine vs B=1
        # batch generate) are info-only — different compiled reduction
        # orders can flip near-tie argmaxes on tiny random weights.
        ok = specd == plain
        binfo = [plain[i] == generate(
            params, cfg, np.asarray(p, np.int64)[None],
            np.asarray([len(p)]), sp, kv_quant=kv).sequences[0].tolist()
            for i, p in enumerate(prompts)]
        print(f"paged spec kv_quant={kv}: Mosaic compile+run OK in "
              f"{time.perf_counter()-t0:.1f}s | spec==plain-paged {ok} | "
              f"plain==batch(info) {binfo} | {s}", flush=True)
        assert ok, (kv, specd, plain)


if __name__ == "__main__":
    main()
