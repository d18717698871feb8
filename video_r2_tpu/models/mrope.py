"""M-RoPE: multimodal 3D rotary positions.

Two halves, split TPU-first:

- `get_rope_index` (host, numpy): data-dependent scan over token ids producing
  [3, B, S] position ids + per-sequence deltas. Runs once per batch on host —
  the device graph only ever sees dense int32 arrays.
  Behavioral spec: HF Qwen2_5_VLModel.get_rope_index, which is also what the
  reference's monkey_patch_forward.py:411-436 calls.

- `mrope_cos_sin` (device): position ids -> per-token cos/sin with the
  channel-sectioned t/h/w interleave (mrope_section), fp32.
  Parity: Qwen2_5_VLRotaryEmbedding.forward + apply_multimodal_rotary_pos_emb.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .layers import rotary_inv_freq


def get_rope_index(
    input_ids: np.ndarray,                     # [B, S] int
    cfg: ModelConfig,
    image_grid_thw: np.ndarray | None = None,  # [n_img, 3]
    video_grid_thw: np.ndarray | None = None,  # [n_vid, 3]
    second_per_grid_ts: np.ndarray | None = None,  # [n_vid]
    attention_mask: np.ndarray | None = None,  # [B, S] 1=valid
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (position_ids [3, B, S] int32, deltas [B, 1] int32).

    Text tokens advance all three axes together; vision blocks get 3D (t, h, w)
    positions with the temporal axis scaled by
    second_per_grid_t * tokens_per_second; each segment restarts at
    max(previous positions) + 1. Masked slots hold position 1 (HF parity).
    """
    input_ids = np.asarray(input_ids)
    B, S = input_ids.shape
    merge = cfg.vision.spatial_merge_size
    tps = cfg.vision.tokens_per_second

    if image_grid_thw is None and video_grid_thw is None:
        if attention_mask is not None:
            am = np.asarray(attention_mask)
            pos = np.cumsum(am, axis=-1) - 1
            pos = np.where(am == 0, 1, pos)
            position_ids = np.broadcast_to(pos[None], (3, B, S)).astype(np.int32)
            deltas = (pos.max(axis=-1, keepdims=True) + 1 - S).astype(np.int32)
        else:
            position_ids = np.broadcast_to(np.arange(S)[None, None], (3, B, S)).astype(np.int32)
            deltas = np.zeros((B, 1), dtype=np.int32)
        return position_ids.copy(), deltas

    position_ids = np.ones((3, B, S), dtype=np.int64)
    deltas = np.zeros((B, 1), dtype=np.int64)
    img_i = vid_i = 0
    for b in range(B):
        ids = input_ids[b]
        if attention_mask is not None:
            ids = ids[np.asarray(attention_mask[b]) == 1]
        tokens = ids.tolist()
        n = len(tokens)
        starts = [i for i, t in enumerate(tokens)
                  if t == cfg.vision_start_token_id and i + 1 < n]
        vision_kinds = [tokens[i + 1] for i in starts]
        n_img = sum(1 for k in vision_kinds if k == cfg.image_token_id)
        n_vid = sum(1 for k in vision_kinds if k == cfg.video_token_id)

        chunks: list[np.ndarray] = []
        st = 0
        remain_img, remain_vid = n_img, n_vid
        for _ in range(n_img + n_vid):
            ed_img = tokens.index(cfg.image_token_id, st) if (
                remain_img > 0 and cfg.image_token_id in tokens[st:]) else n + 1
            ed_vid = tokens.index(cfg.video_token_id, st) if (
                remain_vid > 0 and cfg.video_token_id in tokens[st:]) else n + 1
            if ed_img < ed_vid:
                t, h, w = (int(x) for x in image_grid_thw[img_i])
                spg = 0.0
                img_i += 1
                remain_img -= 1
                ed = ed_img
            else:
                t, h, w = (int(x) for x in video_grid_thw[vid_i])
                spg = (float(second_per_grid_ts[vid_i])
                       if second_per_grid_ts is not None else 1.0)
                vid_i += 1
                remain_vid -= 1
                ed = ed_vid
            lh, lw = h // merge, w // merge
            text_len = ed - st
            st_idx = int(chunks[-1].max()) + 1 if chunks else 0
            if text_len:
                r = np.arange(text_len) + st_idx
                chunks.append(np.broadcast_to(r, (3, text_len)).copy())
            t_idx = (np.repeat(np.arange(t), lh * lw).astype(np.float64)
                     * spg * tps).astype(np.int64)
            h_idx = np.tile(np.repeat(np.arange(lh), lw), t)
            w_idx = np.tile(np.arange(lw), t * lh)
            chunks.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
            st = ed + t * lh * lw
        if st < n:
            st_idx = int(chunks[-1].max()) + 1 if chunks else 0
            r = np.arange(n - st) + st_idx
            chunks.append(np.broadcast_to(r, (3, n - st)).copy())
        pos = np.concatenate(chunks, axis=1)
        if attention_mask is not None:
            sel = np.asarray(attention_mask[b]) == 1
            position_ids[:, b, sel] = pos
        else:
            position_ids[:, b, :] = pos
        deltas[b, 0] = int(pos.max()) + 1 - S
    return position_ids.astype(np.int32), deltas.astype(np.int32)


def mrope_section_selector(mrope_section: tuple[int, ...], head_dim: int) -> np.ndarray:
    """[head_dim] int array mapping each rotary channel to its axis (0=t,1=h,2=w).

    apply_multimodal_rotary_pos_emb splits cos [3,...,head_dim] into chunks of
    mrope_section*2 and takes chunk i from axis i%3.
    """
    sec = list(mrope_section) * 2
    sel = np.concatenate([np.full(s, i % 3, dtype=np.int32) for i, s in enumerate(sec)])
    assert sel.shape[0] == head_dim, (sel.shape, head_dim)
    return sel


def mrope_cos_sin(
    position_ids: jax.Array,   # [3, B, S] int32
    cfg: ModelConfig,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Combined cos/sin [B, S, head_dim] with channel-sectioned t/h/w mix."""
    head_dim = cfg.text.head_dim
    inv = rotary_inv_freq(head_dim, cfg.text.rope_theta)          # [hd/2]
    freqs = position_ids.astype(jnp.float32)[..., None] * inv      # [3,B,S,hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)                 # [3,B,S,hd]
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    sel = jnp.asarray(mrope_section_selector(cfg.text.mrope_section, head_dim))
    onehot = jax.nn.one_hot(sel, 3, dtype=jnp.float32)             # [hd, 3]
    cos = jnp.einsum("absd,da->bsd", cos, onehot)
    sin = jnp.einsum("absd,da->bsd", sin, onehot)
    return cos.astype(dtype), sin.astype(dtype)
