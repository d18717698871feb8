"""Fixture-driven task-pack tests: one JSONL per benchmark pinning the
reference doc schema (VERDICT r1 item 7 — no generic fallback, every
benchmark's doc_to_text/doc_to_visual/process_results exercised against the
field names its reference utils.py actually reads)."""

import json
from pathlib import Path

import pytest

from video_r2_tpu.evalharness import StaticModel, evaluate, get_task

FIXTURES = Path(__file__).parent / "fixtures" / "eval_docs"


def load_docs(name):
    return [json.loads(l) for l in open(FIXTURES / f"{name}.jsonl")]


def answer_resp(text):
    return f"<think>let me think about it</think><answer>{text}</answer>"


# (fixture, task, per-doc correct responses, expected extra metric key)
CASES = [
    ("mvbench_action_count", "mvbench_action_count_think",
     ["B. 3 times", "A"], "mvbench_accuracy"),
    ("videomme", "videomme_think", ["B", "The best answer is B"],
     "videomme_perception_score"),
    ("videomme_w_subtitle", "videomme_w_subtitle_think", ["B"],
     "videomme_perception_score"),
    ("mlvu", "mlvu_think", ["B", "A"], "mlvu_score"),
    ("longvideobench", "longvideobench_think", ["B"], "lvb_acc"),
    ("videomathqa", "videomathqa_think", ["B"],
     "videomathqa_perception_score"),
    ("videommmu", "videommmu_think", ["B"], None),
    ("mmvu", "mmvu_think", ["C", "newton"], None),
    ("vsibench", "vsibench_think", ["4", "A"], "vsibench_score"),
    ("minerva", "minerva_think", ["The correct answer is B"],
     "minerva_perception_score"),
    ("scivideobench", "scivideobench_think", ["A", "C"],
     "scivideobench_acc"),
    ("tempcompass_complete", "tempcompass_complete_think", ["B", "A"],
     "tempcompass_perception_score"),
]


@pytest.mark.parametrize("fixture,task_name,resps,extra_metric",
                         CASES, ids=[c[1] for c in CASES])
def test_benchmark_fixture_schema(fixture, task_name, resps, extra_metric,
                                  tmp_path):
    docs = load_docs(fixture)
    task = get_task(task_name, docs=docs)
    model = StaticModel([answer_resp(r) for r in resps])
    out = evaluate(model, [task], output_dir=tmp_path)
    res = out["results"][task.config.task]
    assert res["samples"] == len(docs)
    assert res["accuracy"] == 1.0, res
    if extra_metric is not None:
        assert extra_metric in res, sorted(res)
        assert res[extra_metric] == pytest.approx(100.0)
    # the samples-JSONL contract TAC/VAS consume
    rows = out["samples"][task.config.task]
    for row in rows:
        for key in ("doc", "input", "resps", "filtered_resps", "target",
                    "doc_hash"):
            assert key in row, (key, sorted(row))


def test_all_eleven_benchmarks_have_fixtures():
    names = {p.stem for p in FIXTURES.glob("*.jsonl")}
    required = {"mvbench_action_count", "videomme", "videomme_w_subtitle",
                "mlvu", "longvideobench", "videomathqa", "videommmu", "mmvu",
                "vsibench", "minerva", "scivideobench", "tempcompass"}
    assert required <= names, required - names


def test_mvbench_subtask_group():
    """The 20-subtask group matches the reference DATA_LIST exactly
    (mvbench_think/utils.py:19-40 + mvbench.yaml)."""
    from video_r2_tpu.evalharness.tasks.benchmarks import (
        MVBENCH_DATA_LIST,
        mvbench_doc_to_visual,
        mvbench_subtasks,
    )

    assert len(MVBENCH_DATA_LIST) == 20
    assert MVBENCH_DATA_LIST["action_localization"] == "sta/sta_video_segment"
    assert MVBENCH_DATA_LIST["episodic_reasoning"] == "tvqa/video_fps3_hq_segment"
    tasks = mvbench_subtasks(think=True)
    assert len(tasks) == 20
    assert {t.config.task for t in tasks} == {
        f"mvbench_{s}_think" for s in MVBENCH_DATA_LIST}

    # per-subtask video resolution: root + dataset folder + doc['video']
    import os

    os.environ["MVBENCH_VIDEO_ROOT"] = "/data/mvbench"
    try:
        path = mvbench_doc_to_visual({"video": "x.mp4"},
                                     sub_task="moving_count")[0]
        assert path == "/data/mvbench/clevrer/video_validation/x.mp4"
    finally:
        del os.environ["MVBENCH_VIDEO_ROOT"]


def test_mvbench_answered_only_aggregation():
    from video_r2_tpu.evalharness.tasks.benchmarks import mvbench_aggregate

    results = [
        {"pred_answer": "A", "gt_answer": "A", "score": 1},
        {"pred_answer": "B", "gt_answer": "A", "score": 0},
        {"pred_answer": "", "gt_answer": "A", "score": 0},  # unanswered
    ]
    assert mvbench_aggregate(results) == pytest.approx(50.0)


def test_tempcompass_complete_matches_reference_yaml():
    """Post prompts and gen kwargs byte-match the reference task YAMLs
    (tasks/tempcompass_complete{,_think}/tempcompass_complete.yaml)."""
    import yaml

    from video_r2_tpu.evalharness.tasks.tempcompass import (
        _COMPLETE_POST_PROMPT,
        _COMPLETE_THINK_POST_PROMPT,
    )

    ref_tasks = Path("/root/reference/eval/lmms-eval/lmms_eval/tasks")
    if not ref_tasks.exists():
        pytest.skip("reference checkout not available")
    for dirname, ours in (("tempcompass_complete", _COMPLETE_POST_PROMPT),
                          ("tempcompass_complete_think",
                           _COMPLETE_THINK_POST_PROMPT)):
        raw = open(ref_tasks / dirname / "tempcompass_complete.yaml").readlines()
        data = yaml.safe_load(
            "".join(l for l in raw if "!function" not in l))
        assert ours == data["lmms_eval_specific_kwargs"]["default"]["post_prompt"]
        gk = data["generation_kwargs"]
        task = get_task(dirname, docs=[])
        assert task.config.generation_kwargs["max_new_tokens"] \
            == gk["max_new_tokens"]
        assert task.config.generation_kwargs["temperature"] == gk["temperature"]
        assert task.config.doc_to_target({"answer": "B"}) == "B"


def test_tempcompass_complete_video_extension_fallback(tmp_path, monkeypatch):
    """video_id resolves with the mp4 -> MP4 -> mkv -> webm fallback
    (tempcompass_complete/utils.py:22-37); missing raises loudly."""
    from video_r2_tpu.evalharness.tasks.tempcompass import (
        tempcompass_complete_doc_to_visual,
    )

    (tmp_path / "videos").mkdir()
    (tmp_path / "videos" / "123.webm").write_bytes(b"x")
    monkeypatch.setenv("TEMPCOMPASS_VIDEO_ROOT", str(tmp_path))
    out = tempcompass_complete_doc_to_visual({"video_id": "123"})
    assert out == [str(tmp_path / "videos" / "123.webm")]
    with pytest.raises(FileNotFoundError):
        tempcompass_complete_doc_to_visual({"video_id": "missing"})


def test_tempcompass_complete_aggregations():
    from video_r2_tpu.evalharness.tasks.tempcompass import (
        tempcompass_mcq_aggregate,
        tempcompass_multi_binary_aggregate,
    )

    rows = [{"uuid": "a", "pred_answer": "A", "answer": "A"},
            {"uuid": "a", "pred_answer": "B", "answer": "C"},
            {"uuid": "b", "pred_answer": "D", "answer": "D"}]
    assert tempcompass_mcq_aggregate(rows) == pytest.approx(100 * 2 / 3)
    # uuid 'a' has one wrong row -> only 'b' fully correct
    assert tempcompass_multi_binary_aggregate(rows) == pytest.approx(50.0)


def test_scivideobench_letter_extraction():
    from video_r2_tpu.evalharness.tasks.benchmarks import (
        scivideobench_extract_letter,
        scivideobench_format_options,
    )

    assert scivideobench_extract_letter("The correct answer is C.") == "C"
    assert scivideobench_extract_letter("Answer: (J)") == "J"
    assert scivideobench_extract_letter("no letter here whatsoever") == ""
    assert scivideobench_format_options({"B": "two", "A": "one"}) \
        == "A. one\nB. two"
    assert scivideobench_format_options(["x", "y"]) == "A. x\nB. y"
