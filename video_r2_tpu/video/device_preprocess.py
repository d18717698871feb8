"""On-device (XLA) preprocessing graph: resize -> rescale -> normalize -> patchify.

TPU-first replacement for the reference's host-side torchvision resize
(vision_process.py:802-807) + HF Qwen2VLImageProcessor patchify. Everything
after decode/burn-in runs as one jitted graph so frames stream host->HBM once
and patches are produced next to the model. All shapes are static per
(T, H, W) -> (target_h, target_w) bucket; jit caches one executable per bucket.

Patch layout parity (HF Qwen2VLImageProcessor._preprocess): frames padded to a
multiple of temporal_patch_size by repeating the last frame, then
  reshape (gt, tps, C, gh/m, m, p, gw/m, m, p)
  transpose (0, 3, 6, 4, 7, 2, 1, 5, 8)
  reshape (gt*gh*gw, C*tps*p*p)
so each row is one 14x14x2 patch and rows are ordered with 2x2 spatial-merge
blocks contiguous.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# OPENAI CLIP normalization (HF Qwen2VLImageProcessor defaults).
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

PATCH_SIZE = 14
TEMPORAL_PATCH_SIZE = 2
MERGE_SIZE = 2


def resize_bicubic(frames: jax.Array, target_h: int, target_w: int) -> jax.Array:
    """Antialiased bicubic resize of (T, H, W, C) float frames (matches
    torchvision InterpolationMode.BICUBIC with antialias=True closely; both use
    the Keys a=-0.5 kernel scaled to the resampling ratio)."""
    t, _, _, c = frames.shape
    return jax.image.resize(frames, (t, target_h, target_w, c), method="cubic",
                            antialias=True)


def normalize(frames01: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGE_MEAN, dtype=frames01.dtype)
    std = jnp.asarray(IMAGE_STD, dtype=frames01.dtype)
    return (frames01 - mean) / std


def patchify(
    frames: jax.Array,
    patch_size: int = PATCH_SIZE,
    temporal_patch_size: int = TEMPORAL_PATCH_SIZE,
    merge_size: int = MERGE_SIZE,
) -> tuple[jax.Array, tuple[int, int, int]]:
    """(T, H, W, C) normalized frames -> (gt*gh*gw, C*tps*p*p) patches.

    T is padded to a multiple of temporal_patch_size by repeating the last frame.
    """
    t, h, w, c = frames.shape
    if t % temporal_patch_size:
        pad = temporal_patch_size - t % temporal_patch_size
        frames = jnp.concatenate(
            [frames, jnp.repeat(frames[-1:], pad, axis=0)], axis=0)
        t += pad
    gt = t // temporal_patch_size
    gh, gw = h // patch_size, w // patch_size
    m, p = merge_size, patch_size
    x = jnp.transpose(frames, (0, 3, 1, 2))  # TCHW
    x = x.reshape(gt, temporal_patch_size, c, gh // m, m, p, gw // m, m, p)
    x = jnp.transpose(x, (0, 3, 6, 4, 7, 2, 1, 5, 8))
    return x.reshape(gt * gh * gw, c * temporal_patch_size * p * p), (gt, gh, gw)


@partial(jax.jit, static_argnames=("target_h", "target_w", "out_dtype"))
def preprocess_frames(
    frames_uint8: jax.Array,
    target_h: int,
    target_w: int,
    out_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Fused uint8 (T, H, W, C) -> flattened normalized patches.

    grid_thw is implied by static shapes: (ceil(T/2), target_h/14, target_w/14).
    """
    x = frames_uint8.astype(jnp.float32)
    x = resize_bicubic(x, target_h, target_w)
    x = normalize(x / 255.0)
    patches, _ = patchify(x.astype(out_dtype))
    return patches


def grid_thw_for(t: int, target_h: int, target_w: int) -> tuple[int, int, int]:
    gt = (t + TEMPORAL_PATCH_SIZE - 1) // TEMPORAL_PATCH_SIZE
    return (gt, target_h // PATCH_SIZE, target_w // PATCH_SIZE)


def preprocess_frames_np(frames_uint8: np.ndarray, target_h: int, target_w: int,
                         out_dtype=np.float32, backend: str = "host",
                         ) -> tuple[np.ndarray, tuple[int, int, int]]:
    """(patches, grid_thw) as numpy.

    backend="host": PIL bicubic resize + numpy normalize/patchify — zero
    compilation, right default when video shapes vary (every unique
    (T,H,W)->target bucket costs a fresh XLA compile of the cubic resize,
    ~minutes through a remote compiler).
    backend="device": the fused jitted graph — wins once shapes repeat
    (fixed eval buckets, training with bucketed resolutions)."""
    if backend == "device":
        patches = preprocess_frames(jnp.asarray(frames_uint8), target_h,
                                    target_w, out_dtype=jnp.dtype(out_dtype))
        return (np.asarray(patches),
                grid_thw_for(frames_uint8.shape[0], target_h, target_w))
    return (preprocess_frames_host(frames_uint8, target_h, target_w, out_dtype),
            grid_thw_for(frames_uint8.shape[0], target_h, target_w))


def preprocess_frames_host(frames_uint8: np.ndarray, target_h: int,
                           target_w: int, out_dtype=np.float32) -> np.ndarray:
    """Pure host implementation, numerics-matched to the device graph (PIL
    bicubic is the same Keys a=-0.5 antialiased kernel)."""
    from PIL import Image

    t = frames_uint8.shape[0]
    if frames_uint8.shape[1:3] != (target_h, target_w):
        frames_uint8 = np.stack([
            np.asarray(Image.fromarray(f).resize((target_w, target_h),
                                                 Image.BICUBIC))
            for f in frames_uint8])
    # patchify FIRST, in uint8 — the scattered 9-D transpose moves 4x less
    # data than float32, then normalize via a per-channel uint8 lookup table
    # straight into out_dtype (bit-exact vs (x/255 - mean)/std computed in
    # f32 then cast; measured 3-16x on the 1-core eval host)
    x = frames_uint8
    if t % TEMPORAL_PATCH_SIZE:
        pad = TEMPORAL_PATCH_SIZE - t % TEMPORAL_PATCH_SIZE
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        t += pad
    gt = t // TEMPORAL_PATCH_SIZE
    gh, gw = target_h // PATCH_SIZE, target_w // PATCH_SIZE
    m, p, c = MERGE_SIZE, PATCH_SIZE, x.shape[-1]
    x = np.transpose(x, (0, 3, 1, 2))
    x = x.reshape(gt, TEMPORAL_PATCH_SIZE, c, gh // m, m, p, gw // m, m, p)
    x = np.transpose(x, (0, 3, 6, 4, 7, 2, 1, 5, 8))
    u8 = np.ascontiguousarray(
        x.reshape(gt * gh * gw, c * TEMPORAL_PATCH_SIZE * p * p))
    lut = np.empty((c, 256), out_dtype)
    for ch in range(c):
        v = ((np.arange(256, dtype=np.float32) / 255.0 - IMAGE_MEAN[ch])
             / IMAGE_STD[ch])
        lut[ch] = v.astype(out_dtype)
    chan = np.repeat(np.arange(c), TEMPORAL_PATCH_SIZE * PATCH_SIZE * PATCH_SIZE)
    return lut[chan[None, :], u8]
