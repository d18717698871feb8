"""Attention tap: last-layer generated->video attention mass.

Oracle check vs HF output_attentions on the tiny golden model."""

import numpy as np
import pytest

from tests.hf_ref import build_hf_tiny, video_token_sequence
from video_r2_tpu.models import convert_hf_state_dict, get_rope_index, plan_vision_layout
from video_r2_tpu.models.attention_tap import attention_to_video_scores


def test_attention_tap_matches_hf(rng):
    import torch

    model, cfg = build_hf_tiny()
    model.set_attn_implementation("eager")
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")

    grid = (2, 4, 4)
    patches = rng.normal(size=(32, cfg.vision.patch_input_dim)).astype(np.float32)
    ids = video_token_sequence(cfg, grid, prefix=[5, 6], suffix=[7, 8, 9, 10])
    spg = np.array([1.0])
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids),
            pixel_values_videos=torch.from_numpy(patches),
            video_grid_thw=torch.tensor([list(grid)]),
            second_per_grid_ts=torch.tensor(spg),
            output_attentions=True,
        )
    last_attn = out.attentions[-1].numpy()  # [B, nh, S, S]
    video_mask = (ids == cfg.video_token_id)
    # "generated" queries: pretend last 4 tokens are the completion
    qmask = np.zeros_like(ids)
    qmask[:, -4:] = 1
    ref_mass = last_attn[:, :, :, :] * video_mask[:, None, None, :]
    ref_per_q = ref_mass.sum(-1).mean(1)  # [B, S] mean over heads
    ref = (ref_per_q * qmask).sum(-1) / qmask.sum(-1)

    pos, _ = get_rope_index(ids, cfg, video_grid_thw=np.array([grid]),
                            second_per_grid_ts=spg)
    layout = plan_vision_layout([grid], cfg.vision)
    ours = attention_to_video_scores(
        params, cfg, ids, pos, np.ones_like(ids), qmask,
        video_patches=patches, video_layout=layout)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
    assert 0.0 <= float(ours[0]) <= 1.0
