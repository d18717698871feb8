"""Ablation helpers (train/src/utils.py:160-230 parity).

The reference ships these for the paper's ablations (first-frame-contrastive,
key-frame masking); the flags exist in its params but are not wired into the
shipped trainer — same status here: callable utilities, opt-in from configs.
"""

from __future__ import annotations

import numpy as np


def video_first_frame(ele: dict, fps_max_frames: int = 32,
                      video_total_pixels: int | None = None) -> np.ndarray:
    """First decoded frame of a video element (HWC uint8)."""
    from ..video.geometry import DEFAULT_VIDEO_TOTAL_PIXELS
    from ..video.reader import decode_video

    decoded = decode_video(
        {**ele, "nframes": 2}, fps_max_frames,
        video_total_pixels or DEFAULT_VIDEO_TOTAL_PIXELS)
    return decoded.frames[0]


def replace_video_with_first_frame(sample: dict) -> dict:
    """GRPO prompt ablation: swap each video content element for its first
    frame as an image element (utils.py:174-200 behavior)."""
    out = dict(sample)
    new_prompt = []
    for msg in sample["prompt"]:
        content = msg.get("content")
        if not isinstance(content, list):
            new_prompt.append(msg)
            continue
        new_content = []
        for ele in content:
            if ele.get("type") == "video" or "video" in ele:
                frame = video_first_frame(ele)
                new_content.append({"type": "image", "image": frame})
            else:
                new_content.append(ele)
        new_prompt.append({**msg, "content": new_content})
    out["prompt"] = new_prompt
    return out


def mask_key_frames(frames: np.ndarray, key_frame_indices: list[int],
                    fill: int = 0) -> np.ndarray:
    """Zero out listed frames (utils.py:203-230 behavior: ablate the frames
    the temporal GT points at)."""
    out = frames.copy()
    for i in key_frame_indices:
        if 0 <= i < out.shape[0]:
            out[i] = fill
    return out
