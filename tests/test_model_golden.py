"""Golden tests: our JAX Qwen2.5-VL vs the HF reference implementation on a
tiny random-init config (fp32, CPU). This is the parity gate for M-RoPE,
windowed ViT attention, vision-embed merge, and the decoder stack."""

import numpy as np
import pytest

from tests.hf_ref import build_hf_tiny, video_token_sequence
from video_r2_tpu.models import (
    convert_hf_state_dict,
    forward,
    get_rope_index,
    plan_vision_layout,
    tiny_test_config,
    vit_forward,
)


@pytest.fixture(scope="module")
def hf_and_params():
    model, cfg = build_hf_tiny()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    return model, cfg, params


def _rand_patches(rng, grid, cfg):
    t, h, w = grid
    n = t * h * w
    return rng.normal(size=(n, cfg.vision.patch_input_dim)).astype(np.float32)


def test_vit_golden_single_video(hf_and_params, rng):
    import torch

    model, cfg, params = hf_and_params
    grid = (2, 4, 4)
    patches = _rand_patches(rng, grid, cfg)
    with torch.no_grad():
        ref = model.model.visual(torch.from_numpy(patches),
                                 grid_thw=torch.tensor([list(grid)])).numpy()
    layout = plan_vision_layout([grid], cfg.vision)
    ours = np.asarray(vit_forward(params["visual"], cfg.vision,
                                  patches, layout))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_vit_golden_ragged_windows(hf_and_params, rng):
    """Grid not divisible by the window size -> exercises window padding."""
    import torch

    model, cfg, params = hf_and_params
    grid = (2, 12, 20)  # llm grid 6x10, window 4x4 units -> ragged
    patches = _rand_patches(rng, grid, cfg)
    with torch.no_grad():
        ref = model.model.visual(torch.from_numpy(patches),
                                 grid_thw=torch.tensor([list(grid)])).numpy()
    layout = plan_vision_layout([grid], cfg.vision)
    ours = np.asarray(vit_forward(params["visual"], cfg.vision, patches, layout))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_vit_golden_multi_video(hf_and_params, rng):
    import torch

    model, cfg, params = hf_and_params
    grids = [(2, 4, 4), (1, 8, 6)]
    patches = np.concatenate([_rand_patches(rng, g, cfg) for g in grids])
    with torch.no_grad():
        ref = model.model.visual(torch.from_numpy(patches),
                                 grid_thw=torch.tensor([list(g) for g in grids])).numpy()
    layout = plan_vision_layout(grids, cfg.vision)
    ours = np.asarray(vit_forward(params["visual"], cfg.vision, patches, layout))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_get_rope_index_golden(hf_and_params):
    import torch

    model, cfg, _ = hf_and_params
    grid = (2, 4, 4)
    ids = video_token_sequence(cfg, grid, prefix=[5, 6, 7], suffix=[8, 9, 10, 11])
    spg = np.array([2.0])
    ref_pos, ref_delta = model.model.get_rope_index(
        torch.from_numpy(ids), None, torch.tensor([list(grid)]),
        second_per_grid_ts=torch.tensor(spg))
    pos, delta = get_rope_index(ids, cfg, video_grid_thw=np.array([grid]),
                                second_per_grid_ts=spg)
    np.testing.assert_array_equal(pos, ref_pos.numpy())
    np.testing.assert_array_equal(delta, ref_delta.numpy())


def test_get_rope_index_image_and_video_with_mask(hf_and_params):
    import torch

    model, cfg, _ = hf_and_params
    # sequence: text, image block, text, video block, text; with left padding
    img_grid, vid_grid = (1, 4, 6), (2, 4, 4)
    n_img = (4 // 2) * (6 // 2)
    n_vid = 2 * 2 * 2
    ids = ([cfg.pad_token_id] * 3 + [5, cfg.vision_start_token_id]
           + [cfg.image_token_id] * n_img + [cfg.vision_end_token_id, 6, 7]
           + [cfg.vision_start_token_id] + [cfg.video_token_id] * n_vid
           + [cfg.vision_end_token_id, 8])
    ids = np.asarray([ids], dtype=np.int64)
    mask = (ids != cfg.pad_token_id).astype(np.int64)
    ref_pos, ref_delta = model.model.get_rope_index(
        torch.from_numpy(ids), torch.tensor([list(img_grid)]),
        torch.tensor([list(vid_grid)]),
        second_per_grid_ts=torch.tensor([1.0]),
        attention_mask=torch.from_numpy(mask))
    pos, delta = get_rope_index(ids, cfg, image_grid_thw=np.array([img_grid]),
                                video_grid_thw=np.array([vid_grid]),
                                second_per_grid_ts=np.array([1.0]),
                                attention_mask=mask)
    np.testing.assert_array_equal(pos, ref_pos.numpy())
    np.testing.assert_array_equal(delta, ref_delta.numpy())


def test_get_rope_index_text_only(hf_and_params):
    import torch

    model, cfg, _ = hf_and_params
    ids = np.asarray([[3, 4, 5, 6, 7]], dtype=np.int64)
    mask = np.asarray([[0, 1, 1, 1, 1]], dtype=np.int64)
    ref_pos, ref_delta = model.model.get_rope_index(
        torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    pos, delta = get_rope_index(ids, cfg, attention_mask=mask)
    np.testing.assert_array_equal(pos, ref_pos.numpy())
    np.testing.assert_array_equal(delta, ref_delta.numpy())


def test_full_model_golden_video(hf_and_params, rng):
    import torch

    model, cfg, params = hf_and_params
    grid = (2, 4, 4)
    patches = _rand_patches(rng, grid, cfg)
    ids = video_token_sequence(cfg, grid, prefix=[5, 6], suffix=[7, 8, 9])
    spg = np.array([1.0])
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids),
            pixel_values_videos=torch.from_numpy(patches),
            video_grid_thw=torch.tensor([list(grid)]),
            second_per_grid_ts=torch.tensor(spg),
        ).logits.numpy()

    pos, _ = get_rope_index(ids, cfg, video_grid_thw=np.array([grid]),
                            second_per_grid_ts=spg)
    layout = plan_vision_layout([grid], cfg.vision)
    logits, _ = forward(params, cfg, ids, pos, video_patches=patches,
                        video_layout=layout)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_full_model_golden_text_only_batch(hf_and_params, rng):
    import torch

    model, cfg, params = hf_and_params
    ids = rng.integers(2, 400, size=(2, 9))
    mask = np.ones_like(ids)
    mask[0, :3] = 0  # left padding on sample 0
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)).logits.numpy()
    pos, _ = get_rope_index(ids, cfg, attention_mask=mask)
    logits, _ = forward(params, cfg, ids, pos, attention_mask=mask)
    ours = np.asarray(logits)
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], ref[valid], rtol=2e-4, atol=2e-4)
