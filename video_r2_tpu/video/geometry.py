"""Pure frame/pixel-budget math for video preprocessing.

Behavioral spec: reference ``train/qwen_vl_utils/vision_process.py``
(smart_resize :336, smart_nframes :425, calculate_video_frame_range :550,
fetch_video pixel budgeting :780-801, format_hhmmss :65). These functions are
pure and host-side; they decide static shapes *before* anything touches the
device, which is what lets the XLA graph stay fixed-shape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

# Vision geometry constants (reference vision_process.py:30-61).
IMAGE_FACTOR = 28          # ViT patch 14 x spatial merge 2
MIN_PIXELS = 4 * 28 * 28
MAX_PIXELS = 16384 * 28 * 28
MAX_RATIO = 200

VIDEO_MIN_PIXELS = 128 * 28 * 28
VIDEO_MAX_PIXELS = 768 * 28 * 28
FRAME_FACTOR = 2           # temporal patch size
DEFAULT_FPS = 2.0
FPS_MIN_FRAMES = 4
DEFAULT_FPS_MAX_FRAMES = 32
DEFAULT_VIDEO_TOTAL_PIXELS = int(128000 * 28 * 28 * 0.9)


def round_by_factor(number: float, factor: int) -> int:
    """Closest multiple of `factor` (banker's rounding, matching python round)."""
    return round(number / factor) * factor


def ceil_by_factor(number: float, factor: int) -> int:
    return math.ceil(number / factor) * factor


def floor_by_factor(number: float, factor: int) -> int:
    return math.floor(number / factor) * factor


def smart_resize(
    height: int,
    width: int,
    factor: int = IMAGE_FACTOR,
    min_pixels: int = MIN_PIXELS,
    max_pixels: int = MAX_PIXELS,
) -> tuple[int, int]:
    """Target (H, W) divisible by `factor`, area within [min_pixels, max_pixels],
    aspect ratio preserved as closely as possible.

    Parity: vision_process.py:336-362.
    """
    if max(height, width) / min(height, width) > MAX_RATIO:
        raise ValueError(
            f"absolute aspect ratio must be smaller than {MAX_RATIO}, "
            f"got {max(height, width) / min(height, width)}"
        )
    h_bar = max(factor, round_by_factor(height, factor))
    w_bar = max(factor, round_by_factor(width, factor))
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = floor_by_factor(height / beta, factor)
        w_bar = floor_by_factor(width / beta, factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = ceil_by_factor(height * beta, factor)
        w_bar = ceil_by_factor(width * beta, factor)
    return h_bar, w_bar


def smart_nframes(
    ele: dict,
    total_frames: int,
    video_fps: float,
    fps_max_frames: int = DEFAULT_FPS_MAX_FRAMES,
) -> int:
    """Number of frames to sample for model input.

    `ele` carries either `nframes` or (`fps`, `min_frames`, `max_frames`).
    Result is a multiple of FRAME_FACTOR in [FRAME_FACTOR, total_frames].

    Parity: vision_process.py:425-462 (fps_max_frames replaces the env-driven
    FPS_MAX_FRAMES global — config over env vars).
    """
    if "fps" in ele and "nframes" in ele:
        raise ValueError("Only accept either `fps` or `nframes`")
    if "nframes" in ele:
        nframes = round_by_factor(ele["nframes"], FRAME_FACTOR)
    else:
        fps = ele.get("fps", DEFAULT_FPS)
        min_frames = ceil_by_factor(ele.get("min_frames", FPS_MIN_FRAMES), FRAME_FACTOR)
        max_frames = floor_by_factor(
            ele.get("max_frames", min(fps_max_frames, total_frames)), FRAME_FACTOR
        )
        nframes = total_frames / video_fps * fps
        nframes = min(min(max(nframes, min_frames), max_frames), total_frames)
        nframes = floor_by_factor(nframes, FRAME_FACTOR)
    if not (FRAME_FACTOR <= nframes <= total_frames):
        raise ValueError(
            f"nframes should be in [{FRAME_FACTOR}, {total_frames}], got {nframes}."
        )
    return int(nframes)


def calculate_video_frame_range(
    ele: dict,
    total_frames: int,
    video_fps: float,
) -> tuple[int, int, int]:
    """(start_frame, end_frame, count) for optional `video_start`/`video_end` seconds.

    Parity: vision_process.py:550-605.
    """
    if video_fps <= 0:
        raise ValueError("video_fps must be a positive number")
    if total_frames <= 0:
        raise ValueError("total_frames must be a positive integer")

    video_start = ele.get("video_start")
    video_end = ele.get("video_end")
    if video_start is None and video_end is None:
        return 0, total_frames - 1, total_frames

    max_duration = total_frames / video_fps
    if video_start is not None:
        start_frame = math.ceil(max(0.0, min(video_start, max_duration)) * video_fps)
    else:
        start_frame = 0
    if video_end is not None:
        end_frame = math.floor(max(0.0, min(video_end, max_duration)) * video_fps)
        end_frame = min(end_frame, total_frames - 1)
    else:
        end_frame = total_frames - 1

    if start_frame >= end_frame:
        raise ValueError(
            f"Invalid time range: start frame {start_frame} >= end frame {end_frame} "
            f"(video: {max_duration:.2f}s, {total_frames} frames @ {video_fps}fps)"
        )
    return start_frame, end_frame, end_frame - start_frame + 1


def sample_frame_indices(start_frame: int, end_frame: int, nframes: int) -> list[int]:
    """`nframes` indices spread evenly (inclusive linspace, rounded).

    Parity: torch.linspace(start, end, n).round().long() in the reference readers
    (vision_process.py:632,707). round-half-to-even matters for exact parity.
    """
    if nframes == 1:
        return [int(round(start_frame))]
    # torch.round rounds half-to-even (banker's); np.round matches it, where a
    # half-away-from-zero emulation picks a different frame on exact .5 values
    import numpy as np

    return np.linspace(start_frame, end_frame, nframes).round().astype(int).tolist()


def video_frame_pixel_budget(
    nframes: int,
    min_pixels: int | None = None,
    total_pixels: int | None = None,
    max_pixels: int | None = None,
    video_total_pixels: int = DEFAULT_VIDEO_TOTAL_PIXELS,
) -> tuple[int, int]:
    """(min_pixels, max_pixels) per frame given the whole-video token budget.

    Parity: fetch_video budgeting, vision_process.py:780-787 — per-frame pixels
    capped by total budget / nframes * FRAME_FACTOR, floored at 1.05*min.
    """
    min_px = VIDEO_MIN_PIXELS if min_pixels is None else min_pixels
    total_px = video_total_pixels if total_pixels is None else total_pixels
    budget_max = max(min(VIDEO_MAX_PIXELS, total_px / nframes * FRAME_FACTOR), int(min_px * 1.05))
    if max_pixels is not None:
        budget_max = min(max_pixels, budget_max)
    return int(min_px), int(budget_max)


WINDOW_FACTOR = 112  # ViT attention window in pixels (4 units x merge 2 x patch 14)


def snap_to_window(height: int, width: int, max_pixels: int,
                   window: int = WINDOW_FACTOR) -> tuple[int, int]:
    """Snap a smart_resize target to multiples of the ViT window (112 px).

    TPU perf bucketing (opt-in, `ele["window_divisible"]`): window-divisible
    frames fully populate every 8x8-patch attention window — the physically
    padded window layout (models/vision.py) drops from up to ~1.5x pad slots
    to exactly 1.0x — and collapse the resize-shape bucket space (fewer XLA
    recompiles). Deviates from the reference resize targets within the same
    pixel budget, so it is off by default.
    """
    def snaps(x: int) -> tuple[int, ...]:
        lo = max(window, floor_by_factor(x, window))
        hi = max(window, ceil_by_factor(x, window))
        return (lo,) if lo == hi else (lo, hi)

    target = height * width
    best = None
    for h in snaps(height):
        for w in snaps(width):
            if h * w > max_pixels:
                continue
            # closest area to the reference target, then least aspect skew
            key = (abs(h * w - target),
                   abs(math.log(h / w) - math.log(height / width)))
            if best is None or key < best[0]:
                best = (key, h, w)
    if best is not None:
        return best[1], best[2]
    h = max(window, floor_by_factor(height, window))
    w = max(window, floor_by_factor(width, window))
    while h * w > max_pixels and max(h, w) > window:
        if h >= w:
            h -= window
        else:
            w -= window
    return h, w


def format_hhmmss(seconds: float) -> str:
    """HH:MM:SS burn-in text. Parity: vision_process.py:65-70."""
    total = int(seconds)
    return f"{total // 3600:02d}:{(total % 3600) // 60:02d}:{total % 60:02d}"


@dataclass(frozen=True)
class VideoGeometry:
    """Static geometry decided on host before device work: everything the XLA
    graph needs to be fixed-shape."""

    nframes: int
    resized_height: int
    resized_width: int
    sample_fps: float
    frame_indices: tuple[int, ...]

    @property
    def grid_thw(self) -> tuple[int, int, int]:
        # temporal patches x height patches x width patches (patch=14, merge=2)
        return (
            self.nframes // FRAME_FACTOR,
            self.resized_height // 14,
            self.resized_width // 14,
        )


def plan_video_geometry(
    ele: dict,
    total_frames: int,
    video_fps: float,
    fps_max_frames: int = DEFAULT_FPS_MAX_FRAMES,
    video_total_pixels: int = DEFAULT_VIDEO_TOTAL_PIXELS,
    image_factor: int = IMAGE_FACTOR,
    native_height: int | None = None,
    native_width: int | None = None,
) -> VideoGeometry:
    """Full static plan for one video: frame range -> count -> indices -> target HxW."""
    start, end, count = calculate_video_frame_range(ele, total_frames, video_fps)
    nframes = smart_nframes(ele, total_frames=count, video_fps=video_fps,
                            fps_max_frames=fps_max_frames)
    idx = sample_frame_indices(start, end, nframes)
    sample_fps = nframes / max(count, 1e-6) * video_fps
    if "resized_height" in ele and "resized_width" in ele:
        rh, rw = smart_resize(ele["resized_height"], ele["resized_width"], factor=image_factor)
        max_px = rh * rw
    else:
        if native_height is None or native_width is None:
            raise ValueError("native H/W required unless resized_height/width given")
        min_px, max_px = video_frame_pixel_budget(
            nframes,
            min_pixels=ele.get("min_pixels"),
            total_pixels=ele.get("total_pixels"),
            max_pixels=ele.get("max_pixels"),
            video_total_pixels=video_total_pixels,
        )
        rh, rw = smart_resize(native_height, native_width, factor=image_factor,
                              min_pixels=min_px, max_pixels=max_px)
    if ele.get("window_divisible"):
        rh, rw = snap_to_window(rh, rw, max(max_px, WINDOW_FACTOR ** 2))
    return VideoGeometry(nframes, rh, rw, sample_fps, tuple(idx))
