"""Temporal Alignment Reward (TAR): LLM-extracted timestamped claims from
<think>, interval matching with buffer, embedding-cosine one-to-one matching,
gated by an LLM-judged THINK<->ANSWER consistency check.

Parity: train/src/train/temporal_grounding_reward.py (grounding score) and
reward_funcs.py:91-154 (consistency gate). Judge + embedder are injected.
"""

from __future__ import annotations

import ast
import json
import re
from typing import Optional

import numpy as np

from .embedding import cos_sim, load_embedder
from .judge import JudgeClient
from .parsing import extract_answer, extract_reasoning, parse_decision

_TIME_SEP = re.compile(r"\s*(?:-|–|—|to)\s*", re.IGNORECASE)


def _to_seconds(ts: str) -> int:
    parts = [int(p) for p in ts.strip().split(":")]
    if len(parts) == 3:
        return parts[0] * 3600 + parts[1] * 60 + parts[2]
    if len(parts) == 2:
        return parts[0] * 60 + parts[1]
    raise ValueError(f"Unsupported timestamp format: {ts}")


def _normalize_ts(ts: str) -> str:
    parts = [int(p) for p in ts.strip().split(":")]
    if len(parts) == 3:
        return f"{parts[0]:02d}:{parts[1]:02d}:{parts[2]:02d}"
    if len(parts) == 2:
        return f"{parts[0]:02d}:{parts[1]:02d}"
    raise ValueError(f"Unsupported timestamp format: {ts}")


def _to_seconds_loose(token: str) -> Optional[int]:
    if token is None:
        return None
    t = token.strip().strip("+.,").lower()
    if t in {"end", "eof"}:
        return None
    if ":" in t:
        parts = t.split(":")
        try:
            if len(parts) == 3:
                h, m, s = int(parts[0]), int(parts[1]), float(parts[2])
            elif len(parts) == 2:
                h, m, s = 0, int(parts[0]), float(parts[1])
            else:
                return None
            return int(round(h * 3600 + m * 60 + s))
        except ValueError:
            return None
    try:
        return int(t)
    except ValueError:
        try:
            return int(round(float(t)))
        except ValueError:
            return None


def _seconds_to_key(sec: int) -> str:
    if sec >= 3600:
        return f"{sec // 3600:02d}:{(sec % 3600) // 60:02d}:{sec % 60:02d}"
    return f"{sec // 60:02d}:{sec % 60:02d}"


def sanitize_timestamps_dict(d: dict, drop_open_ended: bool = True,
                             coerce_open_ended_by: Optional[int] = None) -> dict:
    """Normalize keys to zero-padded MM:SS / HH:MM:SS (ranges hyphenated);
    drop or coerce open-ended ranges."""
    out = {}
    for k, v in d.items():
        if not isinstance(k, str):
            continue
        parts = _TIME_SEP.split(k.strip())
        if len(parts) == 1:
            start = _to_seconds_loose(parts[0])
            if start is None:
                continue
            end = start
        elif len(parts) == 2:
            start = _to_seconds_loose(parts[0])
            if start is None:
                continue
            end = _to_seconds_loose(parts[1])
            if end is None:
                if drop_open_ended and coerce_open_ended_by is None:
                    continue
                end = start + (coerce_open_ended_by or 0)
        else:
            continue
        if end < start:
            start, end = end, start
        key = (_seconds_to_key(start) if start == end
               else f"{_seconds_to_key(start)}-{_seconds_to_key(end)}")
        out[key] = v
    return out


def extract_grounding_claims(raw: str | dict) -> list[dict]:
    """{timestamp(-range): sentence} -> sorted claim dicts."""
    if isinstance(raw, dict):
        data = raw
    else:
        try:
            data = json.loads(raw.strip())
        except Exception:
            try:
                data = ast.literal_eval(raw.strip())
            except Exception:
                return []
    if not isinstance(data, dict):
        return []
    claims = []
    for key, sentence in data.items():
        key = str(key).strip()
        sentence = (sentence or "").strip()
        if not sentence:
            continue
        try:
            if "-" in key:
                s_raw, e_raw = (p.strip() for p in key.split("-", 1))
                s, e = _to_seconds(s_raw), _to_seconds(e_raw)
                claims.append({
                    "timestamp_str": f"{_normalize_ts(s_raw)}-{_normalize_ts(e_raw)}",
                    "timestamp_sec": (s + e) / 2,
                    "start_sec": s, "end_sec": e,
                    "sentence": sentence, "is_range": True,
                })
            else:
                s = _to_seconds(key)
                claims.append({
                    "timestamp_str": _normalize_ts(key), "timestamp_sec": s,
                    "start_sec": s, "end_sec": s,
                    "sentence": sentence, "is_range": False,
                })
        except ValueError:
            continue
    claims.sort(key=lambda c: c["timestamp_sec"])
    return claims


def _temporal_match(p: dict, g: dict, buf: float) -> bool:
    ps, pe = int(p["start_sec"]), int(max(p["end_sec"], p["start_sec"]))
    gs, ge = int(g["start_sec"]), int(max(g["end_sec"], g["start_sec"]))
    return (ps - buf <= ge + buf) and (gs - buf <= pe + buf)


def robust_json_from_text(text: str) -> dict:
    try:
        return json.loads(text)
    except Exception:
        pass
    start, end = text.find("{"), text.rfind("}")
    if start != -1 and end > start:
        try:
            return json.loads(text[start: end + 1])
        except Exception:
            return {}
    return {}


EXTRACTION_SYSTEM = (
    "You are a precise temporal information extraction assistant.\n\n"
    "Given ONLY the provided text, extract every timestamp mention and return "
    "a compact JSON object mapping each timestamp to ONE short sentence "
    "describing what happens then, per the STRICT format rules.\n"
    "- Return ONLY a JSON object; no prose or code fences.\n"
    "- Keys: zero-padded MM:SS or HH:MM:SS; ranges as 'MM:SS-MM:SS'.\n"
    "- Order keys by start time ascending; merge duplicates; if no "
    "timestamps, return {}.\n"
    "- Values: one short action-focused clause (<= 10 words) derived strictly "
    "from the text."
)

EXTRACTION_USER = (
    "Extract timestamped events from the following text and return ONLY the "
    "JSON object as specified. Keys MUST be zero-padded MM:SS or HH:MM:SS "
    "(ranges with a single hyphen); round decimal seconds; no words like "
    "'end' or trailing symbols; return {{}} if none.\n\nThe text:\n{text}"
)

CONSISTENCY_SYSTEM = (
    "You are a meticulous auditor. Determine whether the reasoning (THINK) "
    "and the final answer (ANSWER) are logically consistent with each other "
    "for the given question. Ignore style, verbosity, or extra details; focus "
    "strictly on whether the conclusion in THINK matches and supports the "
    "final ANSWER for the same question."
)

CONSISTENCY_USER = (
    "QUESTION:\n{question}\n\nTHINK (model's internal reasoning):\n{think}\n\n"
    "ANSWER (model's final answer):\n{answer}\n\nTASK:\n"
    "1) Output ONLY one of the TRUE or FALSE on the first line.\n"
    "   - TRUE  => THINK and ANSWER are consistent and the same conclusion.\n"
    "   - FALSE => THINK contradicts or does not support the ANSWER.\n"
    "2) On the next line(s), give a brief justification (1-3 sentences)."
)


def calculate_grounding_reward(
    prediction_text: str,
    temporal_grnd: dict,
    judge: JudgeClient,
    embedder=None,
    buffer_seconds: float = 2,
    similarity_threshold: float = 0.75,
) -> float:
    """matches / |predicted claims| with one-to-one greedy matching."""
    embedder = embedder or load_embedder()
    think = extract_reasoning(prediction_text)
    extracted = robust_json_from_text(
        judge.chat(EXTRACTION_SYSTEM, EXTRACTION_USER.format(text=think)))
    if isinstance(extracted, dict):
        extracted = sanitize_timestamps_dict(extracted)
    if isinstance(temporal_grnd, dict):
        temporal_grnd = sanitize_timestamps_dict(temporal_grnd)

    pred = extract_grounding_claims(extracted)
    gt = extract_grounding_claims(temporal_grnd)
    if not pred or not gt:
        return 0.0
    pred_s = [c["sentence"] for c in pred]
    gt_s = [c["sentence"] for c in gt]
    if not any(pred_s) or not any(gt_s):
        return 0.0
    pe = np.asarray(embedder.encode(pred_s))
    ge = np.asarray(embedder.encode(gt_s))

    matches, used = 0, set()
    for i, pc in enumerate(pred):
        candidates = [j for j, gc in enumerate(gt)
                      if j not in used and _temporal_match(pc, gc, buffer_seconds)]
        best_j, best_sim = None, -1.0
        for j in candidates:
            sim = cos_sim(pe[i], ge[j])
            if sim >= similarity_threshold and sim > best_sim:
                best_sim, best_j = sim, j
        if best_j is not None:
            used.add(best_j)
            matches += 1
    return float(matches / max(1, len(pred)))


def temporal_grounding_sentence_embedding_consistency_reward(
    completions, assistant, temporal_grounding, prompts=None, judge=None,
    embedder=None, buffer_seconds: float = 2, similarity_threshold: float = 0.75,
    **kwargs,
) -> list[float]:
    """TAR = consistency(0/1) x grounding score.
    Parity: reward_funcs.py:91-154."""
    questions = []
    for p in (prompts or [None] * len(completions)):
        q = ""
        if p:
            # last text element of the user turn
            user = next((m for m in p if m.get("role") == "user"), None)
            if user and isinstance(user.get("content"), list):
                texts = [e.get("text", "") for e in user["content"]
                         if e.get("type") == "text"]
                q = texts[-1] if texts else ""
            elif user:
                q = str(user.get("content", ""))
        questions.append(q)

    rewards = []
    for question, completion, tg in zip(
            questions, completions, temporal_grounding):
        try:
            prediction = completion[0]["content"]
            grounding = calculate_grounding_reward(
                prediction, tg, judge, embedder,
                buffer_seconds, similarity_threshold)
            out = judge.chat(CONSISTENCY_SYSTEM, CONSISTENCY_USER.format(
                question=(question or "(none)").strip(),
                think=extract_reasoning(prediction) or "(missing)",
                answer=extract_answer(prediction) or "(missing)"))
            decision, _ = parse_decision(out)
            rewards.append((1 if decision is True else 0) * grounding)
        except Exception:
            rewards.append(0.0)
    return rewards
