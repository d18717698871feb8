"""Data layer tests: LLaVA conversion, SFT tokenization + masking boundaries,
collation geometry, GRPO sample structure; end-to-end batch -> sft_loss."""

import numpy as np
import pytest

from video_r2_tpu.data import (
    DataConfig,
    GRPODataset,
    IGNORE_INDEX,
    SFTCollator,
    SFTDataset,
    llava_to_openai,
)
from video_r2_tpu.engine import ByteTokenizer
from video_r2_tpu.models import tiny_test_config


@pytest.fixture()
def qwen_ids_cfg():
    # tiny geometry but REAL qwen token ids (matching ByteTokenizer specials)
    return tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)


def _video_record(rng, q="What happens?<video>", a="<think>hm</think><answer>A</answer>"):
    frames = rng.integers(0, 256, size=(8, 56, 56, 3), dtype=np.uint8)
    return {
        "video": [frames],
        "video_fps": 2.0,
        "conversations": [
            {"from": "human", "value": q},
            {"from": "gpt", "value": a},
        ],
    }


def test_llava_to_openai_modes():
    conv = [{"from": "human", "value": "look\n<video>\nnow"},
            {"from": "gpt", "value": "ok"}]
    kept = llava_to_openai(conv, is_video=True)
    assert kept[0]["role"] == "user"
    assert "<|vision_start|><|video_pad|><|vision_end|>" in kept[0]["content"]
    assert "\n<video>\n" not in kept[0]["content"]
    stripped = llava_to_openai(conv, is_video=True, strip_media=True)
    assert "<video>" not in stripped[0]["content"]
    assert stripped[0]["content"] == "looknow"


def test_sft_example_masking(rng, qwen_ids_cfg):
    cfg = qwen_ids_cfg
    tok = ByteTokenizer()
    dcfg = DataConfig(fps=2.0, fps_max_frames=8)
    ds = SFTDataset([_video_record(rng)], tok, cfg, dcfg)
    ex = ds[0]
    ids, labels = ex.input_ids, ex.labels
    # video pads expanded to grid token count
    n_pads = int((ids == cfg.video_token_id).sum())
    gt, gh, gw = ex.video_grid_thw[0]
    assert n_pads == gt * gh * gw // 4 and n_pads > 0
    # prompt fully masked; response tokens unmasked and equal to ids there
    unmasked = labels != IGNORE_INDEX
    assert unmasked.any()
    np.testing.assert_array_equal(labels[unmasked], ids[unmasked])
    # the response starts right after "<|im_start|>assistant\n"
    resp_text = tok.decode(ids[unmasked], skip_special_tokens=False)
    assert resp_text.startswith("<think>hm</think>")
    assert "<|im_end|>" in resp_text
    # system message masked
    assert labels[0] == IGNORE_INDEX
    assert len(ex.second_per_grid_ts) == 1 and ex.second_per_grid_ts[0] > 0


def test_sft_collator_and_loss(rng, qwen_ids_cfg):
    import jax.numpy as jnp

    from video_r2_tpu.models import init_params
    from video_r2_tpu.train import SFTConfig, sft_loss

    cfg = qwen_ids_cfg
    tok = ByteTokenizer()
    dcfg = DataConfig(fps=2.0, fps_max_frames=8, pad_to_multiple=32)
    ds = SFTDataset([_video_record(rng), _video_record(rng, q="Else?<video>")],
                    tok, cfg, dcfg)
    batch = SFTCollator(cfg, dcfg)([ds[0], ds[1]])
    arrays = batch.arrays
    assert arrays["input_ids"].shape[1] % 32 == 0
    assert arrays["position_ids"].shape[0] == 3
    assert arrays["video_patches"].shape[0] == sum(
        np.prod(g) for e in (ds[0], ds[1]) for g in e.video_grid_thw)

    params = init_params(cfg, dtype="float32")
    loss = sft_loss(params, cfg,
                    {k: jnp.asarray(v) for k, v in arrays.items()},
                    SFTConfig(ce_chunk_size=64),
                    video_layout=batch.video_layout)
    assert np.isfinite(float(loss))


def test_multi_turn_masking(rng, qwen_ids_cfg):
    cfg = qwen_ids_cfg
    tok = ByteTokenizer()
    rec = {
        "conversations": [
            {"from": "human", "value": "q1"},
            {"from": "gpt", "value": "a1"},
            {"from": "human", "value": "q2"},
            {"from": "gpt", "value": "a2"},
        ],
    }
    ds = SFTDataset([rec], tok, cfg, DataConfig())
    ex = ds[0]
    text_unmasked = tok.decode(ex.labels[ex.labels != IGNORE_INDEX],
                               skip_special_tokens=False)
    assert "a1" in text_unmasked and "a2" in text_unmasked
    assert "q1" not in text_unmasked and "q2" not in text_unmasked


def test_grpo_dataset_structure(rng):
    frames = rng.integers(0, 256, size=(6, 28, 28, 3), dtype=np.uint8)
    rec = {
        "video": [frames],
        "video_fps": 2.0,
        "key_frame": ["kf.jpg"],
        "conversations": [
            {"from": "human", "value": "<video>When does X happen?"},
            {"from": "gpt", "value": "3 seconds"},
        ],
        "temporal_captions": {"0:01": "intro"},
        "temporal_grounding": {"start": 3, "end": 5},
    }
    ds = GRPODataset([rec], DataConfig(fps=2.0))
    s = ds[0]
    assert s["prompt"][0]["role"] == "system"
    user = s["prompt"][1]
    assert user["content"][0]["type"] == "video"
    assert user["content"][0]["key_frame"] == "kf.jpg"
    assert user["content"][-1] == {"type": "text", "text": "When does X happen?"}
    assert s["assistant"] == "3 seconds"
    assert s["temporal_captions"] == {"0:01": "intro"}
    assert s["temporal_grounding"]["start"] == 3
