"""Reward function tests: accuracy routing per question type, format regex,
TAR grounding math with fake judge + hashing embedder, registry discovery."""

import numpy as np
import pytest

from video_r2_tpu.rewards import (
    accuracy_reward,
    extract_answer,
    extract_grounding_claims,
    format_reward,
    infer_question_type,
    load_reward_funcs,
    normalize_mcq,
    parse_decision,
    sanitize_timestamps_dict,
    temporal_grounding_sentence_embedding_consistency_reward,
    wer,
)
from video_r2_tpu.rewards.embedding import HashingEmbedder, cos_sim
from video_r2_tpu.rewards.judge import StaticJudge
from video_r2_tpu.rewards.temporal import calculate_grounding_reward


def _c(text):
    return [{"role": "assistant", "content": text}]


def _a(text):
    return {"content": f"<answer>{text}</answer>"}


def test_question_type_inference():
    assert infer_question_type("B. the cat") == "multiple choice"
    assert infer_question_type("42") == "numerical"
    assert infer_question_type("3.14159") == "regression"
    assert infer_question_type("1,234") == "numerical"
    assert infer_question_type("STOP SIGN") == "OCR"
    assert infer_question_type(
        "The person walks across the room and sits down on the couch") == "free-form"


def test_accuracy_mcq_and_numeric():
    comps = [_c("<think>x</think><answer>B) cat</answer>"),
             _c("<answer>A</answer>"),
             _c("<answer>42</answer>"),
             _c("<answer>42.0</answer>"),
             _c("<answer>41</answer>")]
    ans = [_a("B. the cat"), _a("B. the cat"), _a("42"), _a("42"), _a("42")]
    r = accuracy_reward(comps, ans)
    assert r == [1.0, 0.0, 1.0, 0.0, 0.0]  # decimal-format guard zeroes 42.0


def test_accuracy_ocr_regression_freeform():
    r = accuracy_reward([_c("<answer>STOP SIGN</answer>")], [_a("STOP SIGN")])
    assert r == [1.0]
    r = accuracy_reward([_c("<answer>3.1400</answer>")], [_a("3.1415")])
    assert 0.95 < r[0] <= 1.0
    r = accuracy_reward([_c("<answer>the dog runs fast through a field</answer>")],
                        [_a("the dog runs quickly through the field")])
    assert 0.3 < r[0] < 1.0


def test_reference_quirk_leading_letter_is_mcq():
    # reference parity: any GT starting with a-e is treated as multiple choice
    # (reward_utils.py infer_question_type's first rule)
    assert infer_question_type("a dog runs quickly") == "multiple choice"


def test_format_reward():
    good = _c("<think>because</think>\n<answer>A</answer>")
    bad1 = _c("<answer>A</answer>")
    bad2 = _c("prefix <think>x</think><answer>A</answer>")
    assert format_reward([good, bad1, bad2]) == [1.0, 0.0, 0.0]


def test_wer():
    assert wer("a b c", "a b c") == 0.0
    assert wer("a b c", "a x c") == pytest.approx(1 / 3)
    assert wer("a", "") == 1.0


def test_parse_decision():
    assert parse_decision("TRUE\nbecause why not") == (True, "because why not")
    assert parse_decision("FALSE") == (False, "")
    assert parse_decision("Verdict: TRUE overall")[0] is True
    assert parse_decision("maybe")[0] is None


def test_sanitize_timestamps():
    d = sanitize_timestamps_dict({
        "0:05": "a", "00:07-00:09": "b", "16": "c", "1:02:03": "d",
        "00:10-end": "e", "garbage": "f", "00:20 to 00:25": "g",
        "00:31-00:30": "h",
    })
    assert d == {"00:05": "a", "00:07-00:09": "b", "00:16": "c",
                 "01:02:03": "d", "00:20-00:25": "g", "00:30-00:31": "h"}


def test_extract_claims_sorted():
    claims = extract_grounding_claims({"00:30": "late", "00:05": "early",
                                       "00:10-00:20": "middle"})
    assert [c["sentence"] for c in claims] == ["early", "middle", "late"]
    assert claims[1]["is_range"] and claims[1]["timestamp_sec"] == 15


def test_grounding_reward_matching():
    judge = StaticJudge('{"00:05": "a red car passes by", "00:50": "a dog barks loudly"}')
    emb = HashingEmbedder()
    gt = {"00:06": "a red car passes by", "02:00": "someone waves"}
    score = calculate_grounding_reward(
        "<think>at 00:05 a red car passes by; at 00:50 a dog barks</think>",
        gt, judge, emb, buffer_seconds=2, similarity_threshold=0.75)
    # one of two predicted claims matches (temporal + high cosine) -> 0.5
    assert score == 0.5


def test_grounding_reward_no_temporal_match():
    judge = StaticJudge('{"00:05": "a red car passes by"}')
    gt = {"05:00": "a red car passes by"}  # same text, far in time
    score = calculate_grounding_reward("<think>x</think>", gt, judge,
                                       HashingEmbedder(), buffer_seconds=2)
    assert score == 0.0


def test_tar_consistency_gate():
    extraction = '{"00:05": "a red car passes by"}'
    comps = [_c("<think>at 5s a red car passes by so answer is A</think>"
                "<answer>A</answer>")]
    tg = [{"00:05": "a red car passes by"}]
    prompts = [[{"role": "system", "content": "s"},
                {"role": "user", "content": [
                    {"type": "video", "video": "x"},
                    {"type": "text", "text": "what passes by?"}]}]]
    # consistent -> grounding passes through (1.0)
    judge = StaticJudge([extraction, "TRUE\nok"])
    r = temporal_grounding_sentence_embedding_consistency_reward(
        comps, [_a("A")], tg, prompts=prompts, judge=judge,
        embedder=HashingEmbedder())
    assert r == [1.0]
    # inconsistent -> gated to 0
    judge = StaticJudge([extraction, "FALSE\nno"])
    r = temporal_grounding_sentence_embedding_consistency_reward(
        comps, [_a("A")], tg, prompts=prompts, judge=judge,
        embedder=HashingEmbedder())
    assert r == [0.0]


def test_hashing_embedder_cosine_sanity():
    emb = HashingEmbedder()
    v = emb.encode(["a red car passes by", "a red car passes by.",
                    "someone plays the piano"])
    assert cos_sim(v[0], v[1]) > 0.9
    assert cos_sim(v[0], v[2]) < 0.5


def test_registry():
    fns = load_reward_funcs(["accuracy", "format_reward",
                             "temporal_grounding_sentence_embedding_consistency_reward"])
    assert fns[0] is accuracy_reward
    with pytest.raises(ValueError, match="available"):
        load_reward_funcs(["nope"])
