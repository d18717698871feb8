"""Golden tests: on-device preprocessing graph vs the HF Qwen2VL image
processor (patchify ordering, normalization), SRT parsing, overlays, and the
end-to-end fetch_video path on synthetic frames."""

import numpy as np
import pytest

from video_r2_tpu.video import device_preprocess as dp
from video_r2_tpu.video import srt
from video_r2_tpu.video.api import (
    VideoPreprocessConfig,
    fetch_image,
    fetch_video,
    process_vision_info,
)


def _hf_processor():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    return Qwen2VLImageProcessor(
        do_resize=False, do_rescale=True, do_normalize=True,
        patch_size=14, temporal_patch_size=2, merge_size=2,
    )


def test_patchify_matches_hf_processor(rng):
    frames = rng.integers(0, 256, size=(4, 56, 84, 3), dtype=np.uint8)
    proc = _hf_processor()
    out = proc(images=None, videos=[list(frames)], return_tensors="np")
    ref_patches = out["pixel_values_videos"]
    ref_grid = tuple(out["video_grid_thw"][0].tolist())

    import jax.numpy as jnp

    x = frames.astype(np.float32) / 255.0
    ours, grid = dp.patchify(jnp.asarray(dp.normalize(jnp.asarray(x))))
    assert grid == ref_grid
    np.testing.assert_allclose(np.asarray(ours), ref_patches, rtol=1e-5, atol=1e-5)


def test_patchify_odd_temporal_pads_last_frame(rng):
    frames = rng.integers(0, 256, size=(3, 28, 28, 3), dtype=np.uint8)
    proc = _hf_processor()
    out = proc(images=None, videos=[list(frames)], return_tensors="np")
    import jax.numpy as jnp

    x = jnp.asarray(frames.astype(np.float32) / 255.0)
    ours, grid = dp.patchify(dp.normalize(x))
    assert grid == tuple(out["video_grid_thw"][0].tolist())
    np.testing.assert_allclose(np.asarray(ours), out["pixel_values_videos"],
                               rtol=1e-5, atol=1e-5)


def test_image_patchify_matches_hf(rng):
    img = rng.integers(0, 256, size=(56, 56, 3), dtype=np.uint8)
    proc = _hf_processor()
    out = proc(images=[img], return_tensors="np")
    import jax.numpy as jnp

    x = jnp.asarray(img.astype(np.float32) / 255.0)[None]
    ours, grid = dp.patchify(dp.normalize(x))
    assert grid == tuple(out["image_grid_thw"][0].tolist())
    np.testing.assert_allclose(np.asarray(ours), out["pixel_values"],
                               rtol=1e-5, atol=1e-5)


def test_resize_bicubic_close_to_pil():
    # PIL BICUBIC downsampling is antialiased with the same Keys a=-0.5 kernel
    # torchvision uses; it is the behavioral reference available in this image.
    # Local rng: the closeness bound is draw-sensitive and the shared session
    # fixture's state depends on test ordering.
    from PIL import Image
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    frames = rng.integers(0, 256, size=(2, 100, 150, 3), dtype=np.uint8)
    ref = np.stack([
        np.asarray(Image.fromarray(f).resize((84, 56), Image.BICUBIC), dtype=np.float32)
        for f in frames
    ])
    ours = np.asarray(dp.resize_bicubic(jnp.asarray(frames, dtype=jnp.float32), 56, 84))
    # Not bit-identical (different separable-filter implementations) but close.
    assert np.abs(ours - ref).mean() < 0.6
    assert np.abs(ours - ref).max() < 6.0


def test_fetch_video_from_frames_array(rng):
    frames = rng.integers(0, 256, size=(30, 60, 90, 3), dtype=np.uint8)
    feats = fetch_video({"video": frames, "video_fps": 10.0, "fps": 2.0},
                        VideoPreprocessConfig(fps_max_frames=32))
    gt, gh, gw = feats.grid_thw
    assert gt == 3  # 6 frames sampled -> 3 temporal patches
    assert feats.patches.shape == (gt * gh * gw, 3 * 2 * 14 * 14)
    assert feats.num_tokens == gt * gh * gw // 4
    assert feats.second_per_grid_t == pytest.approx(2.0 / feats.sample_fps)


def test_fetch_image_and_process_vision_info(rng, tmp_path):
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 256, (50, 70, 3), dtype=np.uint8))
    p = tmp_path / "x.png"
    img.save(p)
    feats = fetch_image({"image": str(p)})
    assert feats.grid_thw[0] == 1
    assert feats.patches.shape[1] == 3 * 2 * 14 * 14

    conv = [{"role": "user", "content": [
        {"type": "image", "image": str(p)},
        {"type": "video", "video": rng.integers(0, 256, (8, 56, 56, 3), dtype=np.uint8),
         "video_fps": 2.0, "nframes": 4},
        {"type": "text", "text": "what?"},
    ]}]
    images, videos = process_vision_info(conv)
    assert len(images) == 1 and len(videos) == 1
    assert videos[0].grid_thw[0] == 2


def test_srt_parse_and_index(tmp_path):
    content = """1
00:00:01,000 --> 00:00:03,000
<i>Hello</i> world

2
00:00:05,500 --> 00:00:07,000
Second cue
line two

garbage block
"""
    p = tmp_path / "a.srt"
    p.write_text(content)
    cues = srt.parse_srt_file(p)
    assert len(cues) == 2
    assert cues[0][2] == ["Hello world"]
    idx = srt.SubtitleIndex(cues)
    text, last = idx.get(2.0)
    assert text == "Hello world"
    text, last = idx.get(6.0, last)
    assert text == "Second cue\nline two"
    text, _ = idx.get(4.0)
    assert text is None
    # tolerance: just before first cue
    text, _ = idx.get(0.96)
    assert text == "Hello world"


def test_overlay_shapes(rng):
    from video_r2_tpu.video import overlay

    frame = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    out = overlay.draw_timestamp(frame, "00:01:02")
    assert out.shape == frame.shape and out.dtype == np.uint8
    assert not np.array_equal(out, frame)  # something was drawn
    out2 = overlay.draw_subtitle(frame, "hello world this is a long subtitle line")
    assert out2.shape == frame.shape
    assert not np.array_equal(out2, frame)
    # dark background -> white timestamp text
    dark = np.zeros((100, 100, 3), dtype=np.uint8)
    assert overlay.choose_timestamp_color(dark) == (255, 255, 255)
    bright = np.full((100, 100, 3), 220, dtype=np.uint8)
    assert overlay.choose_timestamp_color(bright) == (255, 0, 0)


def test_burn_in_timestamps(rng):
    frames = rng.integers(0, 256, size=(20, 112, 112, 3), dtype=np.uint8)
    cfg = VideoPreprocessConfig(write_timestamps=True)
    feats_plain = fetch_video({"video": frames, "video_fps": 2.0, "nframes": 4},
                              VideoPreprocessConfig())
    feats_ts = fetch_video({"video": frames, "video_fps": 2.0, "nframes": 4}, cfg)
    assert feats_plain.patches.shape == feats_ts.patches.shape
    assert not np.allclose(feats_plain.patches, feats_ts.patches)


def test_host_backend_matches_device(rng):
    """PIL+numpy preprocessing tracks the fused device graph closely."""
    frames = rng.integers(0, 256, size=(4, 100, 150, 3), dtype=np.uint8)
    host = dp.preprocess_frames_np(frames, 56, 84, backend="host")[0]
    device = dp.preprocess_frames_np(frames, 56, 84, backend="device")[0]
    assert host.shape == device.shape
    # resize kernels differ at implementation level; normalized-space gap small
    assert np.abs(host - device).mean() < 0.02
    assert np.abs(host - device).max() < 0.35

    # no-resize case must be exact (pure normalize+patchify)
    frames2 = rng.integers(0, 256, size=(4, 56, 84, 3), dtype=np.uint8)
    host2 = dp.preprocess_frames_np(frames2, 56, 84, backend="host")[0]
    device2 = dp.preprocess_frames_np(frames2, 56, 84, backend="device")[0]
    np.testing.assert_allclose(host2, device2, rtol=1e-5, atol=1e-5)


def test_sparse_seek_read_matches_sequential(tmp_path):
    """Long sparsely-sampled videos take the seek path; frames must match
    the sequential pass exactly (same indices, same pixels)."""
    import cv2

    from video_r2_tpu.video import reader as rd

    path = str(tmp_path / "long.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 48))
    for i in range(1500):
        vw.write(np.full((48, 64, 3), i % 256, np.uint8))
    vw.release()

    # 8 frames over 1500 -> avg gap ~188 > 100 -> seek path
    ele = {"video": path, "nframes": 8}
    dec = rd.read_video_cv2(ele, fps_max_frames=128,
                            video_total_pixels=128000 * 28 * 28)
    assert dec.frames.shape[0] == 8

    seq = rd._read_frames_seek(path, sorted(set(dec.geometry.frame_indices)))
    assert seq  # seek path worked for this codec
    # sequential oracle
    cap = cv2.VideoCapture(path)
    i, want, ref = 0, set(dec.geometry.frame_indices), {}
    while i <= max(want):
        ok = cap.grab()
        assert ok
        if i in want:
            ok, f = cap.retrieve()
            ref[i] = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
        i += 1
    cap.release()
    for j, idx in enumerate(dec.geometry.frame_indices):
        np.testing.assert_array_equal(dec.frames[j], ref[idx])


def test_seek_probe_catches_misindexed_stream(monkeypatch):
    """The position counter can lie (VFR/misindexed streams): the probe
    cross-validates one index pixel-exact against the sequential path and
    rejects the seek read when they differ (ADVICE r2)."""
    import cv2

    from video_r2_tpu.video import reader as rd

    class FakeCap:
        """Seeked reads return different pixels than sequential reads while
        the position counter reports a perfect landing."""

        def __init__(self, path):
            self.pos = 0
            self.seeked = False

        def isOpened(self):
            return True

        def set(self, prop, v):
            self.pos = int(v)
            self.seeked = True

        def get(self, prop):
            return float(self.pos)

        def grab(self):
            self.pos += 1
            return True

        def read(self):
            val = 200 if self.seeked else 100
            self.pos += 1
            return True, np.full((8, 8, 3), val, np.uint8)

        def release(self):
            pass

    monkeypatch.setattr(cv2, "VideoCapture", FakeCap)
    out = rd._read_frames_seek("fake.mp4", [5, 60, 120])
    assert out == {}  # probe mismatch -> reject, caller falls back
    # without the probe the lying counter would have been trusted
    out2 = rd._read_frames_seek("fake.mp4", [5, 60, 120], probe_check=False)
    assert set(out2) == {5, 60, 120}
