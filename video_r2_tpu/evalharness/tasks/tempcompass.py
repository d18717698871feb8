"""TempCompass task-type variants: multi_choice, yes_no, caption_matching,
captioning.

Parity: eval/lmms-eval/lmms_eval/tasks/tempcompass_think/utils.py —
hand-crafted matching rules first, with an optional judge fallback replacing
the reference's ChatGPT call (get_eval_result). The captioning variant is
judge-scored entirely (caption quality has no rule-based path).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

from ..api import MetricSpec, Task, TaskConfig, THINK_POST_PROMPT, mean
from . import register_task
from .common import extract_answer


def mc_rating(pred: str, answer: str) -> Optional[int]:
    """Multi-choice matching rules (utils.py:134-142). None = rules failed."""
    if pred == answer:
        return 1
    if pred in ("A", "B", "C", "D"):
        return 1 if pred == answer[0] else 0
    if any(pred.startswith(p) for p in ("A.", "B.", "C.", "D.")):
        return 1 if pred.split(".")[0] == answer[0] else 0
    if any(pred.startswith(p) for p in ("A)", "B)", "C)", "D)")):
        return 1 if pred.split(")")[0] == answer[0] else 0
    return None


def yes_no_pred(text: str) -> Optional[str]:
    low = text.lower()
    if low.startswith("yes"):
        return "yes"
    if low.startswith("no"):
        return "no"
    return None


def caption_matching_rating(pred: str, question: str, answer: str) -> Optional[int]:
    """Word-matching rules for caption_matching (utils.py:439-458)."""
    option_strs = question.split("\n")[1:]
    option_sents = [o.split(": ")[1] for o in option_strs if ": " in o]
    option_inds = ([o.split(": ")[0] for o in option_strs]
                   + [o.split(": ")[0].replace("Sentence ", "")
                      .replace("Option ", "").replace("Caption ", "")
                      for o in option_strs])
    matched = None
    for o in option_strs:
        if o == pred:
            matched = o
    for s in option_sents:
        if s == pred or (") " in pred and s == pred.split(") ")[1]):
            matched = s
    for ind in option_inds:
        if ind == pred or ind == pred.replace(".", ""):
            matched = ind
    if matched is None:
        return None
    ans_parts = {answer, answer.split(":")[0]}
    if ": " in answer:
        ans_parts.add(answer.split(": ")[1])
    head = answer.split(": ")[0].split()
    if len(head) > 1:
        ans_parts.add(head[1])
    return 1 if matched in ans_parts else 0


_JUDGE_PROMPT = (
    "You will receive a {kind} question, the ground-truth answer and the "
    "prediction from a question answering (QA) model. Your task is to "
    "determine whether QA model prediction is correct, based on the question "
    "and ground-truth answer. If the prediction is correct, respond "
    '"Correct". If the prediction is incorrect, respond "Incorrect".\n'
    "{kind} question:\n{question}\nGround-Truth Answer: {answer}\n"
    "Model Prediction: {pred}")


def _judge_rating(judge, kind, question, answer, pred) -> int:
    if judge is None:
        return 0
    try:
        out = judge.chat("", _JUDGE_PROMPT.format(
            kind=kind, question=question, answer=answer, pred=pred))
        return 1 if "incorrect" not in out.lower() and "correct" in out.lower() else 0
    except Exception:
        return 0


def make_tempcompass_task(task_type: str, think: bool, docs=None,
                          dataset_path=None, judge=None) -> Task:
    name = f"tempcompass_{task_type}" + ("_think" if think else "")

    def doc_to_text(doc):
        return doc["question"]

    def process_results(doc, results):
        pred = extract_answer(results[0])
        if task_type == "multi_choice":
            r = mc_rating(pred, doc["answer"])
            if r is None:
                r = _judge_rating(judge, "multi-choice", doc["question"],
                                  doc["answer"], pred)
        elif task_type == "yes_no":
            yn = yes_no_pred(pred)
            if yn is not None:
                r = 1 if yn == doc["answer"] else 0
            else:
                r = _judge_rating(judge, "Yes/No", doc["question"],
                                  doc["answer"], pred)
        elif task_type == "caption_matching":
            r = caption_matching_rating(pred, doc["question"], doc["answer"])
            if r is None:
                r = _judge_rating(judge, "caption matching", doc["question"],
                                  doc["answer"], pred)
        else:  # captioning: judge-scored
            r = _judge_rating(judge, "captioning", doc["question"],
                              doc.get("answer", ""), pred)
        return {"accuracy": r}

    cfg = TaskConfig(
        task=name, doc_to_text=doc_to_text,
        doc_to_visual=lambda d: [d["video"]],
        doc_to_target=lambda d: str(d.get("answer", "")),
        process_results=process_results,
        metrics=[MetricSpec("accuracy", mean)],
        generation_kwargs={"max_new_tokens": 1024, "temperature": 0.0,
                           "do_sample": False},
        post_prompt=THINK_POST_PROMPT if think else "",
        dataset_path=dataset_path)
    return Task(cfg, docs=docs)


for _t in ("multi_choice", "yes_no", "caption_matching", "captioning"):
    register_task(f"tempcompass_{_t}", partial(make_tempcompass_task, _t, False))
    register_task(f"tempcompass_{_t}_think", partial(make_tempcompass_task, _t, True))
