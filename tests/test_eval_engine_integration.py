"""End-to-end: evaluate() driving the real engine backend on the tiny model
with in-memory video docs — the full accuracy-eval call stack (SURVEY §3.3)
minus HF datasets."""

import numpy as np

from video_r2_tpu.engine import ByteTokenizer
from video_r2_tpu.evalharness import EngineModel, evaluate, get_task
from video_r2_tpu.models import init_params, tiny_test_config


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
