"""End-to-end: evaluate() driving the real engine backend on the tiny model
with in-memory video docs — the full accuracy-eval call stack (SURVEY §3.3)
minus HF datasets."""

import numpy as np
import pytest

from video_r2_tpu.engine import ByteTokenizer
from video_r2_tpu.evalharness import EngineModel, evaluate, get_task
from video_r2_tpu.models import init_params, tiny_test_config


def test_engine_model_eval_sharded_matches_single(rng, tmp_path):
    """Multi-chip eval: EngineModel(mesh=dp2.fsdp2.tp2) produces the same
    responses and accuracy as single-device (the reference's 8-GPU
    accelerate eval role, run_all.sh:29 — here one controller drives the
    mesh, the ViT included)."""
    from video_r2_tpu.parallel import MeshConfig, make_mesh

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

    def run(mesh):
        task = get_task("mvbench_think", docs=docs)
        task.config.generation_kwargs["max_new_tokens"] = 6
        m = EngineModel(params, cfg, ByteTokenizer(), max_num_frames=4,
                        max_pixels=56 * 56, batch_size=2, mesh=mesh)
        return evaluate(m, [task])

    ref = run(None)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    out = run(mesh)
    ref_resps = [r["resps"] for r in ref["samples"]["mvbench_think"]]
    out_resps = [r["resps"] for r in out["samples"]["mvbench_think"]]
    assert out_resps == ref_resps  # token-exact through the sharded stack
    assert (out["results"]["mvbench_think"]["accuracy"]
            == ref["results"]["mvbench_think"]["accuracy"])


def test_loglikelihood_matches_hf(rng):
    """EngineModel.loglikelihood (lmms ABC second output type) matches
    torch log-softmax scoring of the same (context, continuation) ids on
    the HF tiny model; is_greedy agrees with argmax."""
    import torch

    from tests.hf_ref import build_hf_tiny
    from video_r2_tpu.evalharness.api import Instance
    from video_r2_tpu.models import convert_hf_state_dict, tiny_test_config

    # full-size vocab so the ByteTokenizer's real Qwen special ids resolve
    model, cfg = build_hf_tiny(tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643))
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    m = EngineModel(params, cfg, ByteTokenizer(), batch_size=2)
    inst = Instance(0, {}, "What color is the sky?", [], {})
    (ll, greedy), = m.loglikelihood([inst], continuations=[" blue"])

    # oracle: same token ids through HF, sum of continuation logprobs
    ctx_ids, _ = m.backend._prepare(inst)
    cont_ids = ByteTokenizer().encode(" blue")
    ids = torch.tensor([list(ctx_ids) + list(cont_ids)])
    with torch.no_grad():
        logits = model(input_ids=ids).logits[0].float()
    lp = torch.log_softmax(
        logits[len(ctx_ids) - 1: len(ctx_ids) - 1 + len(cont_ids)], dim=-1)
    ref = float(lp[torch.arange(len(cont_ids)), torch.tensor(cont_ids)].sum())
    ref_greedy = bool((lp.argmax(-1) == torch.tensor(cont_ids)).all())
    assert abs(ll - ref) < 5e-3 * max(1.0, abs(ref))
    assert greedy == ref_greedy


def test_generate_until_multi_round():
    """Default multi-round: each round's context accumulates prompts and
    responses (api/model.py generate_until_multi_round role)."""
    from video_r2_tpu.evalharness.api import Instance
    from video_r2_tpu.evalharness.model_api import StaticModel

    class EchoModel(StaticModel):
        def __init__(self):
            super().__init__("")
            self.seen = []

        def generate_until(self, instances):
            self.seen.append(instances[0].text)
            return [f"<r{len(self.seen)}>"]

    m = EchoModel()
    inst = Instance(0, {}, ["Q1. ", "Q2. "], [], {})
    out = m.generate_until_multi_round([inst])
    assert out == [["<r1>", "<r2>"]]
    assert m.seen == ["Q1. ", "Q1. <r1>Q2. "]


def test_engine_model_eval_batch_spec_decode(rng):
    """Batch-mode eval with spec_decode=K: responses identical to plain
    batch eval (eval generation is greedy; spec greedy is token-exact by
    construction) — spec now rides the batch generate path too, composing
    with the auto prefill-chunk config."""
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

    def run(**kw):
        task = get_task("mvbench_think", docs=docs)
        task.config.generation_kwargs["max_new_tokens"] = 6
        m = EngineModel(params, cfg, ByteTokenizer(), max_num_frames=4,
                        max_pixels=56 * 56, batch_size=2, **kw)
        return [r["resps"] for r in
                evaluate(m, [task])["samples"]["mvbench_think"]]

    assert run(spec_decode=3) == run()


def test_engine_model_eval(rng, tmp_path):
    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")

    docs = [{
        "video": rng.integers(0, 256, size=(6, 56, 56, 3), dtype=np.uint8),
        "question": f"What is shown {i}?",
        "candidates": ["a cat", "a dog", "a car"],
        "answer": "a dog",
    } for i in range(3)]
    task = get_task("mvbench_think", docs=docs)
    # small generation budget for test speed
    task.config.generation_kwargs["max_new_tokens"] = 8

    model = EngineModel(params, cfg, ByteTokenizer(), max_num_frames=4,
                        max_pixels=56 * 56, batch_size=2)
    out = evaluate(model, [task], output_dir=tmp_path)
    res = out["results"]["mvbench_think"]
    assert res["samples"] == 3
    assert 0.0 <= res["accuracy"] <= 1.0
    rows = out["samples"]["mvbench_think"]
    assert all(isinstance(r["resps"][0][0], str) for r in rows)
    assert (tmp_path / "samples_mvbench_think.jsonl").exists()


def test_engine_model_eval_paged(rng, tmp_path):
    """Same end-to-end eval through the continuous paged engine
    (engine_mode='paged') — the vLLM-role eval path (VERDICT r1 #6) — run
    twice, plain and with spec_decode=3 (greedy eval decoding through paged
    speculative verification): responses must be response-exact identical."""
    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")

    docs = [{
        "video": rng.integers(0, 256, size=(6, 56, 56, 3), dtype=np.uint8),
        "question": f"What is shown {i}?",
        "candidates": ["a cat", "a dog", "a car"],
        "answer": "a dog",
    } for i in range(3)]
    task = get_task("mvbench_think", docs=docs)
    task.config.generation_kwargs["max_new_tokens"] = 8

    def run(spec):
        model = EngineModel(params, cfg, ByteTokenizer(), max_num_frames=4,
                            max_pixels=56 * 56, batch_size=2,
                            engine_mode="paged", spec_decode=spec)
        out = evaluate(model, [task], output_dir=tmp_path / f"s{spec}")
        res = out["results"]["mvbench_think"]
        assert res["samples"] == 3
        rows = out["samples"]["mvbench_think"]
        assert all(isinstance(r["resps"][0][0], str) for r in rows)
        return [r["resps"][0][0]
                for r in sorted(rows, key=lambda r: r["doc_id"])]

    assert run(0) == run(3)


def test_generate_until_groups_by_gen_kwargs():
    """Instances with different gen_kwargs must never share a batch (ADVICE
    r1: shape-sorting used to batch them together and apply chunk[0]'s
    kwargs to everyone)."""
    from video_r2_tpu.evalharness.api import Instance
    from video_r2_tpu.evalharness.engine_backend import EngineBackend

    backend = EngineBackend.__new__(EngineBackend)  # skip model setup
    backend.batch_size = 4
    backend.engine_mode = "batch"
    backend._prepare = lambda inst: (list(range(len(inst.text))), [])
    seen = []

    def fake_run_batch(prepared, indices, gen_kwargs):
        seen.append((tuple(indices), dict(gen_kwargs)))
        return {i: f"out{i}" for i in indices}

    backend._run_batch = fake_run_batch
    instances = [
        Instance(doc_id=i, doc={}, text=t, visuals=[],
                 gen_kwargs={"max_new_tokens": m})
        for i, (t, m) in enumerate(
            [("aa", 8), ("bbbb", 64), ("c", 8), ("ddd", 64)])]
    out = backend.generate_until(instances)
    assert out == ["out0", "out1", "out2", "out3"]
    for indices, kwargs in seen:
        mnts = {instances[i].gen_kwargs["max_new_tokens"] for i in indices}
        assert len(mnts) == 1, "mixed gen_kwargs in one batch"
        assert kwargs["max_new_tokens"] in mnts


def test_engine_model_eval_image_visual(rng, tmp_path):
    """Single-image visuals (PIL/[H,W,C] arrays) ride the video path as
    1-frame clips — the reference eval serves image benchmarks through the
    same adapter (qwen2_5_vl.py image branch)."""
    from PIL import Image

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    docs = [{
        "video": Image.fromarray(
            rng.integers(0, 256, size=(56, 56, 3), dtype=np.uint8)),
        "question": f"What is shown {i}?",
        "candidates": ["a cat", "a dog"],
        "answer": "a dog",
    } for i in range(2)]
    task = get_task("mvbench_think", docs=docs)
    task.config.generation_kwargs["max_new_tokens"] = 6
    model = EngineModel(params, cfg, ByteTokenizer(), max_num_frames=4,
                        max_pixels=56 * 56, batch_size=2)
    out = evaluate(model, [task], output_dir=tmp_path)
    assert out["results"]["mvbench_think"]["samples"] == 2


def test_engine_model_eval_grayscale_and_rgba_visuals(rng, tmp_path):
    """Non-RGB image visuals (grayscale/RGBA) normalize to RGB instead of
    crashing the reader or mismatching the patch-embed width."""
    from PIL import Image

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    gray = Image.fromarray(
        rng.integers(0, 256, size=(56, 56), dtype=np.uint8), mode="L")
    rgba = Image.fromarray(
        rng.integers(0, 256, size=(56, 56, 4), dtype=np.uint8), mode="RGBA")
    docs = [{"video": v, "question": f"Q{i}?", "candidates": ["a", "b"],
             "answer": "a"} for i, v in enumerate([gray, rgba])]
    task = get_task("mvbench_think", docs=docs)
    task.config.generation_kwargs["max_new_tokens"] = 4
    model = EngineModel(params, cfg, ByteTokenizer(), max_num_frames=4,
                        max_pixels=56 * 56, batch_size=2)
    out = evaluate(model, [task], output_dir=tmp_path)
    assert out["results"]["mvbench_think"]["samples"] == 2


def test_paged_engine_geometric_growth(rng):
    """When the continuous eval engine must grow, it (a) waits for the pool
    to drain, (b) grows geometrically (>= 2x) so ascending-cost admission
    doesn't rebuild at every page-boundary crossing (review fix)."""
    from video_r2_tpu.evalharness.engine_backend import EngineBackend
    from video_r2_tpu.models import init_params, tiny_test_config

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    backend = EngineBackend(params, cfg, ByteTokenizer(), batch_size=2,
                            engine_mode="paged", page_size=16)
    from video_r2_tpu.evalharness.api import Instance

    # ascending prompt lengths spanning several 16-token pages
    instances = [Instance(doc_id=i, doc={}, text="x" * n, visuals=[],
                          gen_kwargs={"max_new_tokens": 4,
                                      "temperature": 0.0})
                 for i, n in enumerate([8, 40, 90, 200])]
    max_lens = []
    orig = backend._get_cont_engine

    def spy(needed):
        eng = orig(needed)
        if not max_lens or eng.max_len != max_lens[-1]:
            max_lens.append(eng.max_len)
        return eng

    backend._get_cont_engine = spy
    outs = backend.generate_until(instances)
    assert len(outs) == 4
    # growth is geometric: each rebuild at least doubles
    for a, b in zip(max_lens, max_lens[1:]):
        assert b >= 2 * a, max_lens
    assert len(max_lens) <= 3, max_lens


def test_engine_model_eval_paged_sharded(rng, tmp_path):
    """Paged continuous eval on a tp=2 mesh (engine_mode='paged', mesh=...):
    response-exact vs the single-device paged eval — the multimodal eval
    path through the SHARDED paged engine (VERDICT r3 Missing #1; the
    reference evals on 8 GPUs via accelerate, its judge serves paged at
    TP=4)."""
    from video_r2_tpu.parallel import MeshConfig, make_mesh

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")

    docs = [{
        "video": rng.integers(0, 256, size=(6, 56, 56, 3), dtype=np.uint8),
        "question": f"What is shown {i}?",
        "candidates": ["a cat", "a dog", "a car"],
        "answer": "a dog",
    } for i in range(3)]
    task = get_task("mvbench_think", docs=docs)
    task.config.generation_kwargs["max_new_tokens"] = 8

    def run(mesh, tag):
        model = EngineModel(params, cfg, ByteTokenizer(), max_num_frames=4,
                            max_pixels=56 * 56, batch_size=2,
                            engine_mode="paged", mesh=mesh)
        out = evaluate(model, [task], output_dir=tmp_path / tag)
        rows = out["samples"]["mvbench_think"]
        return [r["resps"][0][0]
                for r in sorted(rows, key=lambda r: r["doc_id"])]

    single = run(None, "single")
    mesh = make_mesh(MeshConfig(tp=2, fsdp=2))
    assert run(mesh, "sharded") == single
