"""The judge preset's full serving flag set, end to end at tiny scale:
moe_ragged_decode + moe_gmm_prefill under an ep x tp mesh through the
paged continuous engine (the deployment shape of the reference's vLLM
TP=4 judge, serve_qwen3.sh:11-17), plus eval with forked decode workers.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_moe import _build_hf_tiny_moe, tiny_moe_config
from tests.test_moe_ragged import moe_params  # noqa: F401 (fixture)
from video_r2_tpu.engine.sampling import SamplingParams
from video_r2_tpu.models import convert_hf_state_dict
from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh


def test_paged_engine_judge_flags_under_mesh(rng):
    """PagedContinuousEngine, ep=2 x tp=2, ragged decode + GMM prefill
    (prompts past RAGGED_MAX_TOKENS so admission prefill takes the GMM
    path): token-exact vs the unmeshed einsum-only engine."""
    from video_r2_tpu.engine.continuous import PagedContinuousEngine

    model = _build_hf_tiny_moe()
    cfg = tiny_moe_config()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    jcfg = cfg.replace(text=dataclasses.replace(
        cfg.text, moe_ragged_decode=True, moe_gmm_prefill=True))
    prompts = [rng.integers(2, 127, size=n).tolist() for n in (37, 42)]
    kw = dict(num_slots=2, max_len=128,
              sp=SamplingParams(pad_token_id=cfg.pad_token_id,
                                eos_token_ids=()),
              prompt_buckets=(48,), page_size=16)

    def drain(eng):
        rids = [eng.submit(list(p), max_new_tokens=5) for p in prompts]
        out = {}
        while eng.num_active:
            for rid, toks in eng.step():
                out[rid] = toks
        return [out[r] for r in rids]

    single = drain(PagedContinuousEngine(params, cfg, **kw))
    mesh = make_mesh(MeshConfig(ep=2, tp=2))
    sharded = drain(PagedContinuousEngine(params, jcfg, mesh=mesh, **kw))
    assert sharded == single


def test_gmm_sharded_empty_shard(moe_params, rng):
    """Router biased so every token routes to experts 0-1: ep-shard 1
    (experts 4-7) has zero local slots — all its rows collapse to the
    trash row, every block is slack, and the psum still reproduces the
    dense oracle."""
    from video_r2_tpu.models.moe import moe_mlp_dense_oracle
    from video_r2_tpu.ops.moe_gmm import moe_mlp_gmm_sharded

    mesh = make_mesh(MeshConfig(ep=2, tp=2))
    T, H, k = 18, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    biased = jax.tree_util.tree_map(lambda v: v, moe_params)
    rk = np.asarray(biased["router"]["kernel"]).copy()
    rk[:, 2:] -= 50.0
    biased["router"]["kernel"] = jnp.asarray(rk)
    dense = moe_mlp_dense_oracle(biased, x[None], k, True)[0]
    sharded = moe_mlp_gmm_sharded(biased, x, k, True, mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_eval_with_decode_procs(rng, monkeypatch):
    """VR2_DECODE_PROCS=2: the eval backend decodes video in forked worker
    processes end-to-end through evaluate() — same responses as the
    thread-pool default."""
    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.evalharness import EngineModel, evaluate, get_task
    from video_r2_tpu.models import init_params, tiny_test_config

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    docs = [{
        "video": rng.integers(0, 256, size=(6, 56, 56, 3), dtype=np.uint8),
        "question": f"What is shown {i}?",
        "candidates": ["a cat", "a dog"],
        "answer": "a dog",
    } for i in range(2)]

    def run():
        task = get_task("mvbench_think", docs=docs)
        task.config.generation_kwargs["max_new_tokens"] = 5
        m = EngineModel(params, cfg, ByteTokenizer(), max_num_frames=4,
                        max_pixels=56 * 56, batch_size=2)
        return [r["resps"] for r in
                evaluate(m, [task])["samples"]["mvbench_think"]]

    ref = run()
    monkeypatch.setenv("VR2_DECODE_PROCS", "2")
    assert run() == ref


def test_decode_procs_rejects_device_backend(rng, monkeypatch):
    """VR2_DECODE_PROCS with preprocess_backend='device' must raise (a
    forked child inheriting the XLA runtime would deadlock in the fused
    preprocess graph), not hang."""
    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.evalharness import EngineModel, evaluate, get_task
    from video_r2_tpu.models import init_params, tiny_test_config

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    docs = [{"video": rng.integers(0, 256, size=(4, 56, 56, 3),
                                   dtype=np.uint8),
             "question": "q", "candidates": ["a"], "answer": "a"}]
    task = get_task("mvbench_think", docs=docs)
    m = EngineModel(params, cfg, ByteTokenizer(), max_num_frames=4,
                    max_pixels=56 * 56, batch_size=1)
    m.backend.vcfg = dataclasses.replace(m.backend.vcfg,
                                         preprocess_backend="device")
    monkeypatch.setenv("VR2_DECODE_PROCS", "2")
    with pytest.raises(Exception, match="VR2_DECODE_PROCS"):
        evaluate(m, [task])
