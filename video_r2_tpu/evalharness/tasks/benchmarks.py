"""The 11 Video-R2 benchmark task definitions (+ _think variants).

Doc schemas and prompt formats mirror the reference task packs
(eval/lmms-eval/lmms_eval/tasks/<name>_think/utils.py); videos resolve
relative to a per-task `video_root` (the reference resolves inside the HF
cache — here the root is explicit config). Docs load from
`dataset_path` (local json/jsonl or HF datasets id) per TaskConfig.
"""

from __future__ import annotations

import os
from functools import partial

from ..api import MetricSpec, Task, TaskConfig, THINK_POST_PROMPT, mean
from . import register_task
from .common import (
    extract_answer,
    extract_characters_regex,
    first_letter,
    fuzzy_first_word,
    letter_options_prompt,
    mcq_acc,
    mean_relative_accuracy,
    to_float,
)

MCQ_GEN_KWARGS = {"max_new_tokens": 1024, "temperature": 0.0, "do_sample": False}


def _video_resolver(video_key: str, video_root_env: str):
    def doc_to_visual(doc):
        root = os.environ.get(video_root_env, os.environ.get("VIDEO_EVAL_ROOT", ""))
        path = doc[video_key]
        if isinstance(path, str) and root and not os.path.isabs(path):
            path = os.path.join(root, path)
        return [path]

    return doc_to_visual


# --------------------------------------------------------------------------
# mvbench (mvbench_think/utils.py): candidates list, answer is option text
# --------------------------------------------------------------------------

def mvbench_doc_to_text(doc):
    opts = letter_options_prompt(doc["candidates"], paren=True)
    return "Question:" + doc["question"] + "\nOption:\n" + opts


def mvbench_process_results(doc, results):
    pred = extract_answer(results[0])
    letters = "ABCDEFGHIJ"
    gt_letter = letters[doc["candidates"].index(doc["answer"])]
    return {"accuracy": mcq_acc(f"{gt_letter}. {doc['answer']}", pred)}


def _mcq_letter_task(name: str, doc_to_text, answer_key: str = "answer",
                     video_key: str = "video"):
    def process_results(doc, results):
        pred = extract_answer(results[0])
        return {"accuracy": mcq_acc(doc[answer_key], pred)}

    return dict(doc_to_text=doc_to_text, process_results=process_results,
                doc_to_target=lambda d: d[answer_key],
                doc_to_visual=_video_resolver(video_key, f"{name.upper()}_VIDEO_ROOT"))


# --------------------------------------------------------------------------
# videomme / videomathqa / minerva style: options are pre-lettered strings
# --------------------------------------------------------------------------

def videomme_doc_to_text(doc):
    head = ("Select the best answer to the following multiple-choice question "
            "based on the video and the subtitles. Respond with only the "
            "letter (A, B, C, or D) of the correct option.")
    prefix = ""
    # subtitle mode (videomme_think/utils.py doc_to_text_subtitle): a
    # 'subtitle_path' field or a sibling .srt supplies burned-in-text context
    sub_path = doc.get("subtitle_path")
    if sub_path is None and isinstance(doc.get("videoID"), str):
        import os

        root = os.environ.get("VIDEOMME_SUBTITLE_ROOT")
        if root:
            cand = os.path.join(root, doc["videoID"] + ".srt")
            sub_path = cand if os.path.exists(cand) else None
    if sub_path:
        from ...video.srt import parse_srt_file

        try:
            cues = parse_srt_file(sub_path)
            text = " ".join(line for _, _, lines in cues for line in lines)
            prefix = ("This video's subtitles are listed below:\n"
                      + text + "\n")
        except Exception:
            prefix = ""
    return (prefix + head + "\n" + doc["question"] + "\n"
            + "\n".join(doc["options"]) + "\n")


def _abcde_head(options):
    if len(options) == 2:
        return ("Select the best answer to the following multiple-choice "
                "question based on the video. Respond with the letter (A or B) "
                "of the correct option.")
    return ("Select the best answer to the following multiple-choice question "
            "based on the video. Respond with the letter (A, B, C, D or E) of "
            "the correct option.")


def videomathqa_doc_to_text(doc):
    return (_abcde_head(doc["options"]) + "\n" + doc["question"] + "\n"
            + "\n".join(doc["options"]) + "\n")


def longvideobench_doc_to_text(doc):
    candidates = [doc.get(f"option{i}") for i in range(5)
                  if doc.get(f"option{i}") not in (None, "N/A")]
    lines = "\n".join(f"{chr(ord('A') + i)}. {c}" for i, c in enumerate(candidates))
    return doc["question"] + "\n" + lines


def mmvu_doc_to_text(doc):
    if doc.get("question_type") == "multiple-choice":
        ch = doc["choices"]
        return (f"Question: {doc['question']}\nA. {ch['A']}\nB. {ch['B']}\n"
                f"C. {ch['C']}\nD. {ch['D']}\nE. {ch['E']}\n")
    return f"Question: {doc['question']}\n"


# --------------------------------------------------------------------------
# vsibench: dual MCA (exact match on first word) / NA (mean relative accuracy)
# --------------------------------------------------------------------------

VSI_MCA_TYPES = {
    "object_rel_direction_easy", "object_rel_direction_medium",
    "object_rel_direction_hard", "object_rel_distance", "route_planning",
    "obj_appearance_order",
}
VSI_NA_TYPES = {
    "object_abs_distance", "object_counting", "object_size_estimation",
    "room_size_estimation",
}


def vsibench_doc_to_text(doc):
    pre = "These are frames of a video."
    q = doc["question"]
    if doc["question_type"] in VSI_NA_TYPES:
        return (pre + "\n" + q + "\n"
                + "Please answer the question using a single word or phrase.")
    options = "Options:\n" + "\n".join(doc["options"])
    return "\n".join([pre, q, options,
                      "Answer with the option's letter from the given choices directly."])


def vsibench_process_results(doc, results):
    pred = fuzzy_first_word(extract_answer(results[0]))
    qt = doc["question_type"]
    if qt in VSI_MCA_TYPES:
        score = 1.0 if pred.lower() == str(doc["ground_truth"]).lower() else 0.0
    elif qt in VSI_NA_TYPES:
        p, t = to_float(pred), to_float(doc["ground_truth"])
        score = mean_relative_accuracy(p, t) if (p is not None and t is not None
                                                and t != 0) else 0.0
    else:
        raise ValueError(f"Unknown question type: {qt}")
    return {"accuracy": score, "vsibench_score": {"question_type": qt,
                                                  "score": score}}


def vsibench_aggregate(scores):
    """Mean of per-question-type means (reference aggregates per type then
    averages; vsibench_think/utils.py:131-160)."""
    by_type: dict[str, list[float]] = {}
    for s in scores:
        by_type.setdefault(s["question_type"], []).append(s["score"])
    per_type = [sum(v) / len(v) for v in by_type.values()]
    return 100.0 * sum(per_type) / max(len(per_type), 1)


# --------------------------------------------------------------------------
# registration
# --------------------------------------------------------------------------

def _acc_metric():
    return [MetricSpec("accuracy", mean)]


def build_task(name: str, think: bool, docs=None, dataset_path=None) -> Task:
    post = THINK_POST_PROMPT if think else ""
    task_name = f"{name}_think" if think else name

    if name == "mvbench":
        cfg = TaskConfig(
            task=task_name, doc_to_text=mvbench_doc_to_text,
            doc_to_visual=_video_resolver("video", "MVBENCH_VIDEO_ROOT"),
            doc_to_target=lambda d: d["answer"],
            process_results=mvbench_process_results, metrics=_acc_metric(),
            generation_kwargs=dict(MCQ_GEN_KWARGS), post_prompt=post,
            dataset_path=dataset_path)
    elif name == "vsibench":
        cfg = TaskConfig(
            task=task_name, doc_to_text=vsibench_doc_to_text,
            doc_to_visual=_video_resolver("dataset_video_path"
                                          if docs and "dataset_video_path" in docs[0]
                                          else "video", "VSIBENCH_VIDEO_ROOT"),
            doc_to_target=lambda d: str(d["ground_truth"]),
            process_results=vsibench_process_results,
            metrics=[MetricSpec("accuracy", mean),
                     MetricSpec("vsibench_score", vsibench_aggregate)],
            generation_kwargs=dict(MCQ_GEN_KWARGS), post_prompt=post,
            dataset_path=dataset_path)
    elif name == "mlvu":
        # per-task_type accuracy averaged across types (mlvu_think/utils.py:
        # 132-160); letters via extract_characters_regex
        def mlvu_process_results(doc, results):
            pred = extract_characters_regex(extract_answer(results[0]))
            correct = 1.0 if pred == extract_characters_regex(
                str(doc["answer"])) else 0.0
            return {"accuracy": correct,
                    "mlvu_score": {"task_type": doc.get("task_type", "all"),
                                   "correct": correct}}

        def mlvu_aggregate(scores):
            by_type: dict[str, list[float]] = {}
            for s in scores:
                by_type.setdefault(s["task_type"], []).append(s["correct"])
            per = [sum(v) / len(v) for v in by_type.values()]
            return 100.0 * sum(per) / max(len(per), 1)

        cfg = TaskConfig(
            task=task_name, doc_to_text=lambda d: d["question"],
            doc_to_visual=_video_resolver("video", "MLVU_VIDEO_ROOT"),
            doc_to_target=lambda d: str(d["answer"]),
            process_results=mlvu_process_results,
            metrics=[MetricSpec("accuracy", mean),
                     MetricSpec("mlvu_score", mlvu_aggregate)],
            generation_kwargs=dict(MCQ_GEN_KWARGS), post_prompt=post,
            dataset_path=dataset_path)
    elif name == "videommmu":
        # MCQ letter parse against options; open-ended via normalized
        # containment (videommmu_think/utils.py:154-165 surface)
        def videommmu_doc_to_text(doc):
            q = doc["question"]
            if doc.get("question_type") == "multiple-choice" and doc.get("options"):
                opts = doc["options"]
                if isinstance(opts, dict):
                    lines = "\n".join(f"{k}. {v}" for k, v in sorted(opts.items()))
                else:
                    lines = "\n".join(
                        f"{chr(ord('A') + i)}. {o}" for i, o in enumerate(opts))
                q += "\n" + lines
            return q

        def videommmu_process_results(doc, results):
            pred = extract_answer(results[0])
            gt = str(doc["answer"])
            if doc.get("question_type") == "multiple-choice":
                score = 1.0 if extract_characters_regex(pred) == \
                    extract_characters_regex(gt) else 0.0
            else:
                p = pred.strip().lower().rstrip(".")
                g = gt.strip().lower()
                pf, gf = to_float(p), to_float(g)
                if pf is not None and gf is not None:
                    score = 1.0 if abs(pf - gf) < 1e-6 else 0.0
                else:
                    score = 1.0 if (g and g in p) else 0.0
            return {"accuracy": score}

        cfg = TaskConfig(
            task=task_name, doc_to_text=videommmu_doc_to_text,
            doc_to_visual=_video_resolver("video", "VIDEOMMMU_VIDEO_ROOT"),
            doc_to_target=lambda d: str(d["answer"]),
            process_results=videommmu_process_results, metrics=_acc_metric(),
            generation_kwargs=dict(MCQ_GEN_KWARGS), post_prompt=post,
            dataset_path=dataset_path)
    else:
        doc_to_text = {
            "videomme": videomme_doc_to_text,
            "videomathqa": videomathqa_doc_to_text,
            "minerva": videomathqa_doc_to_text,
            "scivideobench": videomathqa_doc_to_text,
            "longvideobench": longvideobench_doc_to_text,
            "mmvu": mmvu_doc_to_text,
            "tempcompass": lambda d: d["question"],
            "mlvu": lambda d: d["question"],
            "videommmu": lambda d: d["question"] + (
                "\n" + "\n".join(d["options"]) if d.get("options") else ""),
        }[name]

        def process_results(doc, results, _name=name):
            pred = extract_answer(results[0])
            gt = str(doc.get("answer", doc.get("answer_text", "")))
            return {"accuracy": mcq_acc(gt, pred)}

        video_key = {"videomme": "videoID", "videomathqa": "videoID"}.get(
            name, "video")
        cfg = TaskConfig(
            task=task_name, doc_to_text=doc_to_text,
            doc_to_visual=_video_resolver(video_key,
                                          f"{name.upper()}_VIDEO_ROOT"),
            doc_to_target=lambda d: str(d.get("answer", d.get("answer_text", ""))),
            process_results=process_results, metrics=_acc_metric(),
            generation_kwargs=dict(MCQ_GEN_KWARGS), post_prompt=post,
            dataset_path=dataset_path)
    return Task(cfg, docs=docs)


BENCHMARKS = ["mvbench", "videomme", "tempcompass", "mlvu", "longvideobench",
              "videomathqa", "videommmu", "mmvu", "vsibench", "minerva",
              "scivideobench"]

for _name in BENCHMARKS:
    register_task(_name, partial(build_task, _name, False))
    register_task(f"{_name}_think", partial(build_task, _name, True))
