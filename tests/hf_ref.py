"""Helpers to build a tiny HF Qwen2.5-VL reference model for golden tests."""

from __future__ import annotations

import numpy as np

from video_r2_tpu.models import ModelConfig, tiny_test_config


def build_hf_tiny(cfg: ModelConfig | None = None, seed: int = 0):
    """Returns (hf_model.eval() float32, cfg)."""
    import torch
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = cfg or tiny_test_config()
    v, t = cfg.vision, cfg.text
    hf_cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=v.depth, hidden_size=v.hidden_size,
            intermediate_size=v.intermediate_size, num_heads=v.num_heads,
            in_channels=v.in_channels, patch_size=v.patch_size,
            spatial_merge_size=v.spatial_merge_size,
            temporal_patch_size=v.temporal_patch_size,
            tokens_per_second=v.tokens_per_second, window_size=v.window_size,
            fullatt_block_indexes=list(v.fullatt_block_indexes),
            out_hidden_size=v.out_hidden_size, hidden_act="silu",
        ),
        text_config=dict(
            vocab_size=t.vocab_size, hidden_size=t.hidden_size,
            intermediate_size=t.intermediate_size,
            num_hidden_layers=t.num_hidden_layers,
            num_attention_heads=t.num_attention_heads,
            num_key_value_heads=t.num_key_value_heads,
            rms_norm_eps=t.rms_norm_eps, rope_theta=t.rope_theta,
            max_position_embeddings=t.max_position_embeddings,
            tie_word_embeddings=t.tie_word_embeddings, hidden_act="silu",
            rope_scaling={"type": "mrope", "mrope_section": list(t.mrope_section)},
        ),
        image_token_id=cfg.image_token_id, video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        bos_token_id=cfg.bos_token_id, eos_token_id=cfg.eos_token_id,
        tie_word_embeddings=t.tie_word_embeddings,
    )
    torch.manual_seed(seed)
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()
    model = model.float()
    return model, cfg


def video_token_sequence(cfg: ModelConfig, grid_thw: tuple[int, int, int],
                         prefix: list[int], suffix: list[int]) -> np.ndarray:
    """input ids: prefix + <vision_start> + video_pads + <vision_end> + suffix."""
    t, h, w = grid_thw
    n = t * (h // 2) * (w // 2)
    ids = (prefix + [cfg.vision_start_token_id] + [cfg.video_token_id] * n
           + [cfg.vision_end_token_id] + suffix)
    return np.asarray([ids], dtype=np.int64)
