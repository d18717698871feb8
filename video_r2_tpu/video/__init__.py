from .api import (
    ImageFeatures,
    VideoFeatures,
    VideoPreprocessConfig,
    fetch_image,
    fetch_video,
    extract_vision_info,
    process_vision_info,
)
from .geometry import (
    FRAME_FACTOR,
    IMAGE_FACTOR,
    VideoGeometry,
    calculate_video_frame_range,
    format_hhmmss,
    plan_video_geometry,
    sample_frame_indices,
    smart_nframes,
    smart_resize,
)

__all__ = [
    "ImageFeatures", "VideoFeatures", "VideoPreprocessConfig",
    "fetch_image", "fetch_video", "extract_vision_info", "process_vision_info",
    "FRAME_FACTOR", "IMAGE_FACTOR", "VideoGeometry",
    "calculate_video_frame_range", "format_hhmmss", "plan_video_geometry",
    "sample_frame_indices", "smart_nframes", "smart_resize",
]
