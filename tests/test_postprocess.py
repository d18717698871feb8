"""Post-hoc pipeline tests: benchmark routing, TAC/VAS dispatchers with
skip-if-done, tree summarizers, vsibench normalization, eval request cache,
regression tool, ablations."""

import json
import time

import numpy as np
import pytest

from video_r2_tpu.evalharness import evaluate, get_task
from video_r2_tpu.evalharness.model_api import StaticModel
from video_r2_tpu.evalharness.postprocess import (
    discover_sample_files,
    extract_option_letter,
    parse_na_number,
    postprocess_vsibench_row,
    route_benchmark,
    run_all_tac,
    summarize_tac_tree,
    summarize_vas_tree,
)
from video_r2_tpu.evalharness.regression import compare_results
from video_r2_tpu.rewards.judge import StaticJudge


def test_route_benchmark():
    assert route_benchmark("samples_mvbench_think.jsonl") == "mvbench"
    assert route_benchmark("video_mmmu_adaptation_samples.jsonl") == "video_mmmu"
    assert route_benchmark("mmvu_think_samples.jsonl") == "mmvu"
    assert route_benchmark("whatever.jsonl") is None


def _write_samples(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_dispatcher_and_summaries(tmp_path):
    rows = [{"doc_id": 0, "accuracy": 1, "input": "Q",
             "filtered_resps": ["<think>so B</think><answer>B</answer>"],
             "target": "B", "doc": {}}]
    _write_samples(tmp_path / "preds" / "samples_mvbench_think.jsonl", rows)
    _write_samples(tmp_path / "preds" / "samples_vsibench_think.jsonl", rows)
    found = discover_sample_files(tmp_path / "preds")
    assert set(found) == {"mvbench", "vsibench"}

    judge = StaticJudge(["B", "B"] * 10)
    summaries = run_all_tac(tmp_path / "preds", judge, tmp_path / "tac")
    assert "mvbench" in summaries and "vsibench" in summaries
    assert (tmp_path / "tac" / "all_summaries.json").exists()

    tree = summarize_tac_tree(tmp_path / "tac")
    assert any("consistency_score" in v for v in tree.values())

    # VAS tree summary
    _write_samples(tmp_path / "vas" / "per_sample_mvbench.jsonl",
                   [{"doc_id": 0, "score": 6, "__attention_to_video_score": 6},
                    {"doc_id": 1, "score": 8, "__attention_to_video_score": 8}])
    vs = summarize_vas_tree(tmp_path / "vas")
    assert vs["per_sample_mvbench"]["mean_score"] == 7.0
    assert vs["__overall__"]["num_samples"] == 2


def test_vsibench_postprocess():
    assert extract_option_letter("B. the left one") == "B"
    # reference parity: leading '(' blocks the letter regex; no options -> None
    assert extract_option_letter("(c)") is None
    assert extract_option_letter("c") == "C"
    assert extract_option_letter("the left one",
                                 ["A. the right one", "B. the left one"]) == "B"
    assert parse_na_number("about 3.5 meters") == 3.5
    assert parse_na_number("there are seven chairs") == 7.0
    assert parse_na_number("no idea") is None

    row = {"doc": {"question_type": "object_counting"},
           "filtered_resps": ["I think there are four boxes"]}
    out = postprocess_vsibench_row(row)
    assert out["parsed_prediction"] == 4.0

    row = {"doc": {"question_type": "route_planning",
                   "options": ["A. go left", "B. go right"]},
           "filtered_resps": ["you should go right"]}
    out = postprocess_vsibench_row(row, judge=StaticJudge("B"))
    assert out["parsed_prediction"] == "B"


def test_eval_request_cache(tmp_path):
    docs = [{"video": f"v{i}.mp4", "question": "q?", "candidates": ["x", "y"],
             "answer": "x"} for i in range(3)]

    class CountingModel(StaticModel):
        def __init__(self):
            super().__init__("<answer>A</answer>")
            self.calls = 0

        def generate_until(self, instances):
            self.calls += len(instances)
            return super().generate_until(instances)

    m = CountingModel()
    task = get_task("mvbench", docs=docs)
    evaluate(m, [task], cache_dir=tmp_path)
    assert m.calls == 3
    evaluate(m, [get_task("mvbench", docs=docs)], cache_dir=tmp_path)
    assert m.calls == 3  # fully cached
    evaluate(m, [get_task("mvbench", docs=docs + [
        {"video": "new.mp4", "question": "q?", "candidates": ["x", "y"],
         "answer": "y"}])], cache_dir=tmp_path)
    assert m.calls == 4  # only the new doc generated


def test_regression_tool(tmp_path):
    (tmp_path / "a.json").write_text(json.dumps(
        {"results": {"mvbench": {"accuracy": 0.6, "samples": 10}}}))
    (tmp_path / "b.json").write_text(json.dumps(
        {"results": {"mvbench": {"accuracy": 0.5, "samples": 10}}}))
    rep = compare_results(tmp_path / "a.json", tmp_path / "b.json")
    assert rep["regressions"][0]["metric"] == "accuracy"
    assert rep["tasks"]["mvbench"]["accuracy"]["delta"] == pytest.approx(-0.1)
    rep2 = compare_results(tmp_path / "b.json", tmp_path / "a.json")
    assert not rep2["regressions"]


def test_ablations(rng):
    from video_r2_tpu.data.ablations import (
        mask_key_frames,
        replace_video_with_first_frame,
    )

    frames = rng.integers(0, 256, size=(6, 32, 32, 3), dtype=np.uint8)
    masked = mask_key_frames(frames, [1, 4])
    assert (masked[1] == 0).all() and (masked[4] == 0).all()
    assert (masked[0] == frames[0]).all()

    sample = {"prompt": [
        {"role": "user", "content": [
            {"type": "video", "video": frames, "video_fps": 2.0},
            {"type": "text", "text": "q"}]}],
        "assistant": "a"}
    out = replace_video_with_first_frame(sample)
    ele = out["prompt"][0]["content"][0]
    assert ele["type"] == "image"
    assert np.array_equal(ele["image"], frames[0])


def test_default_tac_extractors():
    from video_r2_tpu.evalharness.postprocess import (
        default_get_gt_letter,
        default_get_options,
    )

    # mvbench: candidates + answer text
    row = {"doc": {"candidates": ["jump", "run", "sit"], "answer": "run"}}
    assert default_get_options(row) == ["jump", "run", "sit"]
    assert default_get_gt_letter(row) == "B"
    # videomme: pre-lettered options + letter answer
    row = {"doc": {"options": ["A. cat", "B. dog"], "answer": "B"}}
    assert default_get_options(row) == ["cat", "dog"]
    assert default_get_gt_letter(row) == "B"
    # mmvu: choices dict
    row = {"doc": {"choices": {"A": "x", "B": "y", "C": "z"}, "answer": "C"}}
    assert default_get_options(row) == ["x", "y", "z"]
    assert default_get_gt_letter(row) == "C"
    # longvideobench option0..4 + index-less answer text
    row = {"doc": {"option0": "red", "option1": "blue", "option2": "N/A",
                   "answer": "blue"}}
    assert default_get_options(row) == ["red", "blue"]
    assert default_get_gt_letter(row) == "B"
