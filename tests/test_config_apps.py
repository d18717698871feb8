"""Config system + app entry smoke tests (tiny model, frames-backed data)."""

import json

import numpy as np
import pytest

from video_r2_tpu.config import AppConfig, parse_config


def test_parse_overrides():
    app = parse_config([
        "--run.model_preset", "tiny-test",
        "--optim.learning_rate=3e-4",
        "--grpo.num_generations", "4",
        "--grpo.reward_weights", "1,0.5,2",
        "--data.write_timestamps", "true",
        "--run.fsdp", "4",
    ])
    assert app.run.model_preset == "tiny-test"
    assert app.optim.learning_rate == 3e-4
    assert app.grpo.num_generations == 4
    assert app.grpo.reward_weights == (1.0, 0.5, 2.0)
    assert app.data.write_timestamps is True
    assert app.run.fsdp == 4
    # defaults preserved
    assert app.grpo.beta == 0.04


def test_parse_config_file(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"run": {"max_steps": 7},
                             "optim": {"vision_lr": 5e-6}}))
    app = parse_config(["--config", str(p), "--run.seed", "3"])
    assert app.run.max_steps == 7
    assert app.optim.vision_lr == 5e-6
    assert app.run.seed == 3


def test_unknown_field_raises():
    with pytest.raises(ValueError, match="unknown field"):
        parse_config(["--run.bogus", "1"])
    with pytest.raises(ValueError, match="section.field"):
        parse_config(["--bogus", "1"])


def test_train_sft_app_smoke(tmp_path, rng):
    from video_r2_tpu.apps.train_sft import main

    frames = rng.integers(0, 256, size=(6, 56, 56, 3), dtype=np.uint8)
    records = [{
        "video": [frames], "video_fps": 2.0,
        "conversations": [
            {"from": "human", "value": "<video>what?"},
            {"from": "gpt", "value": "<answer>A</answer>"}],
    }] * 2

    app = parse_config([
        "--run.model_preset", "tiny-test",
        "--run.output_dir", str(tmp_path),
        "--run.max_steps", "2", "--run.save_steps", "2",
        "--run.log_steps", "1",
        "--data.fps_max_frames", "4",
    ])
    # byte tokenizer requires qwen special ids; swap config accordingly
    import dataclasses

    from video_r2_tpu.config import MODEL_PRESETS
    from video_r2_tpu.models import tiny_test_config

    MODEL_PRESETS["tiny-test-qwen"] = lambda: tiny_test_config(
        vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    app = dataclasses.replace(app, run=dataclasses.replace(
        app.run, model_preset="tiny-test-qwen", dtype="float32"))

    # monkeypatch the dataset to in-memory records
    import video_r2_tpu.apps.train_sft as mod

    orig = mod.SFTDataset
    mod.SFTDataset = lambda path, tok, cfg, dcfg: orig(records, tok, cfg, dcfg)
    try:
        state = main(app=app, batch_size=2)
    finally:
        mod.SFTDataset = orig
    assert int(state.step) == 2
    assert (tmp_path / "checkpoint-2").exists()


def test_train_sft_app_lora(tmp_path, rng):
    """--run.use_lora reproduces the reference's SHIPPED SFT recipe (LoRA
    r=64 a=64 over a frozen base, train_sft.sh:30-44): the CLI builds the
    adapter state, trains ONLY adapters, checkpoints them, and exports
    merged HF weights."""
    import jax

    from video_r2_tpu.apps.train_sft import main
    from video_r2_tpu.train.lora import LoRATrainState

    frames = rng.integers(0, 256, size=(6, 56, 56, 3), dtype=np.uint8)
    records = [{
        "video": [frames], "video_fps": 2.0,
        "conversations": [
            {"from": "human", "value": "<video>what?"},
            {"from": "gpt", "value": "<answer>A</answer>"}],
    }] * 2

    import dataclasses

    from video_r2_tpu.config import MODEL_PRESETS
    from video_r2_tpu.models import init_params, tiny_test_config
    from video_r2_tpu.train.checkpoint import export_hf_checkpoint

    MODEL_PRESETS["tiny-test-qwen"] = lambda: tiny_test_config(
        vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    # a REAL (random) base checkpoint: over the zero-init fallback, x@A is
    # identically 0 and B provably receives zero gradient — the test would
    # pass vacuously
    base_cfg = MODEL_PRESETS["tiny-test-qwen"]()
    ckpt_dir = export_hf_checkpoint(
        init_params(base_cfg, dtype="float32"), base_cfg,
        tmp_path / "base_ckpt")

    app = parse_config([
        "--run.model_preset", "tiny-test",
        "--run.checkpoint", str(ckpt_dir),
        "--run.output_dir", str(tmp_path / "out"),
        "--run.max_steps", "2", "--run.save_steps", "2",
        "--run.log_steps", "1",
        "--run.use_lora", "true",
        "--lora.r", "4", "--lora.alpha", "8",
        "--data.fps_max_frames", "4",
    ])
    assert app.run.use_lora and app.lora.r == 4 and app.lora.alpha == 8
    app = dataclasses.replace(app, run=dataclasses.replace(
        app.run, model_preset="tiny-test-qwen", dtype="float32"))

    import video_r2_tpu.apps.train_sft as mod

    orig = mod.SFTDataset
    mod.SFTDataset = lambda path, tok, cfg, dcfg: orig(records, tok, cfg, dcfg)
    try:
        state = main(app=app, batch_size=2)
    finally:
        mod.SFTDataset = orig
    assert isinstance(state, LoRATrainState)
    assert int(state.step) == 2
    # adapters actually trained: B starts at 0, must be nonzero after steps
    b_norms = [float(np.abs(np.asarray(l["b"])).max())
               for l in jax.tree.leaves(state.lora, is_leaf=lambda x:
                                        isinstance(x, dict) and "b" in x)]
    assert any(n > 0 for n in b_norms)
    # vision excluded by default (freeze_vision parity)
    assert "visual" not in state.lora or not state.lora["visual"]
    assert (tmp_path / "out" / "checkpoint-2").exists()
    assert (tmp_path / "out" / "merged_hf" / "model.safetensors").exists()


def test_run_eval_app_smoke(tmp_path, rng):
    # via harness directly with engine model covered elsewhere; here we check
    # the CLI arg split path builds tasks correctly with a docs file
    docs = [{"video": "x.mp4", "question": "q?",
             "candidates": ["a", "b"], "answer": "a"}]
    docs_path = tmp_path / "docs.json"
    docs_path.write_text(json.dumps(docs))
    from video_r2_tpu.evalharness import get_task

    task = get_task("mvbench_think", dataset_path=str(docs_path))
    assert len(task.docs) == 1
    assert task.config.post_prompt  # think variant


def test_eval_config_cli_overrides():
    """Every eval-backend knob is addressable as --eval.field (the
    reference's --model_args string, run_all.sh:31, as typed flags)."""
    from video_r2_tpu.config import parse_config

    app = parse_config([
        "--eval.max_num_frames", "32", "--eval.engine_mode", "paged",
        "--eval.act_quant", "int8", "--eval.window_divisible", "true",
        "--eval.decode_steps", "16", "--eval.fps", "2.0"])
    assert app.eval.max_num_frames == 32
    assert app.eval.engine_mode == "paged"
    assert app.eval.act_quant == "int8"
    assert app.eval.window_divisible is True
    assert app.eval.decode_steps == 16
    assert app.eval.fps == 2.0


def test_postprocess_app_smoke(tmp_path, monkeypatch):
    """The postprocess CLI runs TAC + VAS + summarize end-to-end against a
    fake judge (tac/_run.sh + vas/_run.sh + summarize_* parity)."""
    import json

    from video_r2_tpu.apps import postprocess as app
    from video_r2_tpu.rewards.judge import StaticJudge

    preds = tmp_path / "preds"
    preds.mkdir()
    rows = [{"doc_id": 0, "accuracy": 1, "input": "Q",
             "filtered_resps": ["<think>so A</think><answer>A</answer>"],
             "doc": {"candidates": ["x", "y"], "answer": "x"}}]
    with open(preds / "samples_mvbench_think.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    monkeypatch.setattr(app, "_judge", lambda a: StaticJudge(
        ['{"score": 7, "rationale": "ok"}', "A", "A", "A"]))
    tac = app.main(["tac", "--predictions", str(preds),
                    "--out", str(tmp_path / "tac")])
    assert "mvbench" in tac
    vas = app.main(["vas", "--predictions", str(preds),
                    "--out", str(tmp_path / "vas")])
    assert "mvbench" in vas
    plan = app.main(["vas", "--predictions", str(preds),
                     "--out", str(tmp_path / "vas2"), "--dry-run"])
    assert "mvbench" in plan
    summ = app.main(["summarize", "--tac", str(tmp_path / "tac"),
                     "--vas", str(tmp_path / "vas")])
    assert "tac" in summ and "vas" in summ
