"""Persistent preprocessed-video feature cache (video/cache.py).

VERDICT r3 Missing #3: the 1-core host's eval wall is the cv2 decode; the
cache makes the standard re-eval workflow (same benchmark, new checkpoint)
skip it. Pins cold==warm output parity, decode-skip on hit, stale-file
invalidation, knob sensitivity, and the eviction bound.
"""

import os
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from video_r2_tpu.video import VideoPreprocessConfig, fetch_video  # noqa: E402
from video_r2_tpu.video import reader as reader_mod  # noqa: E402
from video_r2_tpu.video.cache import FeatureCache, feature_cache_key  # noqa: E402


def _write_mp4(path, n=24, size=(64, 48), fps=8.0, seed=0):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         size)
    r = np.random.default_rng(seed)
    for _ in range(n):
        vw.write(r.integers(0, 255, (size[1], size[0], 3), np.uint8))
    vw.release()
    return str(path)


@pytest.fixture()
def clip(tmp_path):
    return _write_mp4(tmp_path / "clip.mp4")


def test_cold_warm_parity_and_decode_skip(clip, tmp_path, monkeypatch):
    cfg = VideoPreprocessConfig(cache_dir=str(tmp_path / "vc"))
    ele = {"video": clip, "fps": 2.0}
    cold = fetch_video(ele, cfg)
    # second pass must not decode at all
    def boom(*a, **k):
        raise AssertionError("decode_video called on a warm cache")
    monkeypatch.setattr(reader_mod, "decode_video", boom)
    import video_r2_tpu.video.api as api_mod
    monkeypatch.setattr(api_mod, "decode_video", boom)
    warm = fetch_video(ele, cfg)
    np.testing.assert_array_equal(warm.patches, cold.patches)
    assert warm.grid_thw == cold.grid_thw
    assert warm.sample_fps == cold.sample_fps
    assert warm.second_per_grid_t == cold.second_per_grid_t


def test_key_invalidation(clip, tmp_path):
    cfg = VideoPreprocessConfig(cache_dir=str(tmp_path / "vc"))
    k1 = feature_cache_key({"video": clip, "fps": 2.0}, cfg, clip)
    # different sampling knob -> different key
    k2 = feature_cache_key({"video": clip, "fps": 1.0}, cfg, clip)
    assert k1 != k2
    # different burn-in config -> different key
    cfg2 = VideoPreprocessConfig(cache_dir=str(tmp_path / "vc"),
                                 write_timestamps=True)
    assert feature_cache_key({"video": clip, "fps": 2.0}, cfg2, clip) != k1
    # overwritten file -> different key (mtime/size in the key)
    time.sleep(0.01)
    _write_mp4(clip, n=26, seed=1)
    k3 = feature_cache_key({"video": clip, "fps": 2.0}, cfg, clip)
    assert k3 != k1
    # missing file -> uncacheable, not a crash
    assert feature_cache_key({"video": "/nope.mp4"}, cfg, "/nope.mp4") is None


def test_eviction_bound(tmp_path):
    from video_r2_tpu.video.api import VideoFeatures

    cache = FeatureCache(str(tmp_path / "vc"), max_bytes=300_000)
    for i in range(8):
        feat = VideoFeatures(np.zeros((64, 256), np.float32), (2, 8, 8),
                             2.0, 1.0)
        cache.put(f"{i:064x}", feat)
        time.sleep(0.01)   # distinct mtimes for LRU order
    files = list((tmp_path / "vc").glob("*.npz"))
    total = sum(f.stat().st_size for f in files)
    assert total <= 300_000
    # newest survives, oldest evicted
    assert cache.get(f"{7:064x}") is not None
    assert cache.get(f"{0:064x}") is None


def test_corrupt_entry_falls_through(clip, tmp_path):
    cfg = VideoPreprocessConfig(cache_dir=str(tmp_path / "vc"))
    ele = {"video": clip, "fps": 2.0}
    cold = fetch_video(ele, cfg)
    key = feature_cache_key(ele, cfg, clip)
    p = tmp_path / "vc" / f"{key}.npz"
    assert p.exists()
    p.write_bytes(b"garbage")
    again = fetch_video(ele, cfg)   # falls through to decode + re-store
    np.testing.assert_array_equal(again.patches, cold.patches)


def test_env_default(clip, tmp_path, monkeypatch):
    """VR2_VIDEO_CACHE enables the cache with zero code changes."""
    monkeypatch.setenv("VR2_VIDEO_CACHE", str(tmp_path / "envc"))
    cfg = VideoPreprocessConfig()
    assert cfg.cache_dir == str(tmp_path / "envc")
    fetch_video({"video": clip, "fps": 2.0}, cfg)
    assert list((tmp_path / "envc").glob("*.npz"))
