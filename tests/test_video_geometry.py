"""Golden/property tests for frame + pixel budget math against the HF
implementation (transformers' Qwen2VL smart_resize is the same contract the
reference copies) and hand-derived cases from the reference spec."""

import numpy as np
import pytest

from video_r2_tpu.video import geometry as G


def test_round_helpers():
    assert G.round_by_factor(29, 28) == 28
    assert G.round_by_factor(43, 28) == 56
    assert G.ceil_by_factor(29, 28) == 56
    assert G.floor_by_factor(55, 28) == 28


def test_smart_resize_matches_hf():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize,
    )

    rng = np.random.default_rng(1)
    for _ in range(200):
        h = int(rng.integers(10, 4000))
        w = int(rng.integers(10, 4000))
        if max(h, w) / min(h, w) > G.MAX_RATIO:
            continue
        for min_px, max_px in [(G.MIN_PIXELS, G.MAX_PIXELS),
                               (G.VIDEO_MIN_PIXELS, 360 * 420),
                               (100352, 151200)]:
            if min_px > max_px:
                continue
            assert G.smart_resize(h, w, 28, min_px, max_px) == hf_smart_resize(
                h, w, 28, min_px, max_px)


def test_smart_resize_invariants():
    rng = np.random.default_rng(2)
    for _ in range(100):
        h = int(rng.integers(30, 3000))
        w = int(rng.integers(30, 3000))
        rh, rw = G.smart_resize(h, w, min_pixels=G.VIDEO_MIN_PIXELS,
                                max_pixels=G.VIDEO_MAX_PIXELS)
        assert rh % 28 == 0 and rw % 28 == 0
        assert G.VIDEO_MIN_PIXELS <= rh * rw
        # max may be exceeded by at most one factor rounding? No: floor keeps it under.
        assert rh * rw <= G.VIDEO_MAX_PIXELS


def test_smart_resize_aspect_ratio_guard():
    with pytest.raises(ValueError):
        G.smart_resize(10, 4000)


def test_smart_nframes_nframes_mode():
    assert G.smart_nframes({"nframes": 17}, total_frames=100, video_fps=30) == 16
    assert G.smart_nframes({"nframes": 4}, total_frames=100, video_fps=30) == 4
    with pytest.raises(ValueError):
        G.smart_nframes({"nframes": 300}, total_frames=100, video_fps=30)
    with pytest.raises(ValueError):
        G.smart_nframes({"fps": 2, "nframes": 4}, total_frames=100, video_fps=30)


def test_smart_nframes_fps_mode():
    # 300 frames @30fps, 2fps target -> 20 frames, within [4, 32]
    assert G.smart_nframes({"fps": 2.0}, 300, 30.0, fps_max_frames=32) == 20
    # capped by max_frames
    assert G.smart_nframes({"fps": 2.0}, 3000, 30.0, fps_max_frames=32) == 32
    assert G.smart_nframes({"fps": 2.0}, 3000, 30.0, fps_max_frames=128) == 128
    # floored at min_frames
    assert G.smart_nframes({"fps": 0.01}, 300, 30.0) == 4
    # short video: capped at total_frames (even multiple)
    assert G.smart_nframes({"fps": 2.0}, 5, 1.0, fps_max_frames=32) == 4
    # max_frames floor_by_factor of odd total
    assert G.smart_nframes({"fps": 30.0}, 7, 30.0) == 6


def test_frame_range():
    assert G.calculate_video_frame_range({}, 100, 10.0) == (0, 99, 100)
    assert G.calculate_video_frame_range({"video_start": 2.0}, 100, 10.0) == (20, 99, 80)
    assert G.calculate_video_frame_range({"video_end": 5.0}, 100, 10.0) == (0, 50, 51)
    s, e, n = G.calculate_video_frame_range({"video_start": 1.0, "video_end": 3.0}, 100, 10.0)
    assert (s, e, n) == (10, 30, 21)
    with pytest.raises(ValueError):
        G.calculate_video_frame_range({"video_start": 9.0, "video_end": 1.0}, 100, 10.0)
    with pytest.raises(ValueError):
        G.calculate_video_frame_range({}, 0, 10.0)


def test_sample_frame_indices_matches_torch_linspace():
    import torch

    # (0, 5, 11) and (0, 9, 19) hit exact .5 linspace values: torch.round is
    # half-to-even, so 0.5 -> 0 and 1.5 -> 2 (ADVICE r1)
    for (s, e, n) in [(0, 99, 20), (0, 99, 100), (7, 31, 4), (0, 1, 2), (5, 5, 1),
                      (0, 2999, 32), (3, 997, 128), (0, 5, 11), (0, 9, 19)]:
        ours = G.sample_frame_indices(s, e, n)
        ref = torch.linspace(s, e, n).round().long().tolist()
        assert ours == ref, (s, e, n)


def test_pixel_budget():
    # 32 frames within the default budget: per-frame cap = total/32*2 > VIDEO_MAX
    mn, mx = G.video_frame_pixel_budget(32)
    assert mn == G.VIDEO_MIN_PIXELS
    assert mx == G.VIDEO_MAX_PIXELS
    # 128 frames: budget-bound
    mn, mx = G.video_frame_pixel_budget(128)
    expected = int(G.DEFAULT_VIDEO_TOTAL_PIXELS / 128 * 2)
    assert mx == min(G.VIDEO_MAX_PIXELS, expected)
    # explicit max_pixels clamps down
    mn, mx = G.video_frame_pixel_budget(128, max_pixels=360 * 420)
    assert mx == 360 * 420
    # floor at 1.05 * min
    mn, mx = G.video_frame_pixel_budget(10**9)
    assert mx == int(G.VIDEO_MIN_PIXELS * 1.05)


def test_format_hhmmss():
    assert G.format_hhmmss(0) == "00:00:00"
    assert G.format_hhmmss(3661.9) == "01:01:01"


def test_plan_video_geometry_grid():
    plan = G.plan_video_geometry({"fps": 2.0}, total_frames=300, video_fps=30.0,
                                 native_height=480, native_width=640)
    assert plan.nframes == 20
    gt, gh, gw = plan.grid_thw
    assert gt == 10
    assert plan.resized_height % 28 == 0 and plan.resized_width % 28 == 0
    assert gh == plan.resized_height // 14


def test_snap_to_window():
    from video_r2_tpu.video.geometry import snap_to_window

    # nearest multiples of 112 within budget
    assert snap_to_window(280, 504, 151200) == (336, 448)
    # over-budget snap shrinks the larger dim first
    assert snap_to_window(504, 504, 151200) == (336, 448)
    # tiny targets clamp to one window
    assert snap_to_window(28, 28, 151200) == (112, 112)
    # already divisible is a no-op
    assert snap_to_window(224, 448, 151200) == (224, 448)


def test_plan_video_geometry_window_divisible():
    from video_r2_tpu.video.geometry import plan_video_geometry

    ele = {"min_pixels": 100352, "max_pixels": 151200, "max_frames": 128,
           "fps": 2.0, "window_divisible": True}
    g = plan_video_geometry(ele, total_frames=600, video_fps=30.0,
                            fps_max_frames=128,
                            native_height=720, native_width=1280)
    assert g.resized_height % 112 == 0 and g.resized_width % 112 == 0
    assert g.resized_height * g.resized_width <= 151200
    # llm-grid dims divisible by the 4-unit window -> zero ViT window padding
    _, gh, gw = g.grid_thw
    assert (gh // 2) % 4 == 0 and (gw // 2) % 4 == 0
