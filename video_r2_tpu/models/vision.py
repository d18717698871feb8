"""Qwen2.5-VL vision tower, TPU-first.

Design (vs the HF/CUDA reference, modeling_qwen2_5_vl.py):

The reference runs the ViT over a ragged concatenation of every image/video's
patches and hands FlashAttention-2 `cu_seqlens` for both the windowed layers
and the four full-attention layers. That layout is hostile to XLA (dynamic
shapes, varlen attention). Here the *host planner* (`plan_vision_layout`, pure
numpy, runs once per shape bucket) lays patches out in **physically padded
window order**: every 112x112 attention window owns exactly
(ws_units x ws_units x merge_unit) = 64 patch slots, pad slots are masked.
Then on device:

- windowed layers are a plain reshape to [num_windows, 64, D] batched dense
  attention — MXU-friendly, zero masks except validity, no gathers;
- full-attention layers gather contiguous per-frame-group runs into a
  [groups, max_group_len] batch (exact reshape when shapes agree);
- the 2x2 patch merger is a reshape because pad slots come in whole merge
  units, and one final gather restores the caller's original token order.

Behavioral parity: Qwen2_5_VisionTransformerPretrainedModel.forward (window
index construction :get_window_index, rot_pos_emb, merger), golden-tested
against HF logits in tests/test_model_golden.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import VisionConfig
from .layers import apply_rotary, linear, rms_norm, rotary_inv_freq, swiglu_mlp

NEG_INF = -1e30


@dataclass(frozen=True)
class VisionLayout:
    """Static (host-planned) layout for one batch of images/videos."""

    patch_gather: np.ndarray      # [S_pad] int32: source row in the real patch
                                  #  array, or -1 for a pad slot
    pos_hw: np.ndarray            # [S_pad, 2] int32: (h, w) rotary positions
    valid: np.ndarray             # [S_pad] bool
    full_gather: np.ndarray       # [G, Lmax] int32 into S_pad rows, -1 = pad
    out_unit_gather: np.ndarray   # [U_real] int32: padded unit slot per
                                  #  original merge-unit (restores input order)
    seq_len_real: int             # number of real patches
    window_patches: int           # patches per attention window (64)

    @property
    def s_pad(self) -> int:
        return int(self.patch_gather.shape[0])


def plan_vision_layout(grid_thws: list[tuple[int, int, int]], cfg: VisionConfig) -> VisionLayout:
    """Host planner: padded-window patch layout + full-attention grouping.

    Mirrors get_window_index / rot_pos_emb semantics of the HF ViT but keeps
    pad slots physical so every window is a fixed 64-row block. Cached per
    grid tuple (eval batches repeat shapes) and fully vectorized — the
    original per-slot Python loop cost ~seconds per eval batch on one host
    core (368k slots at B=16 x 16 frames), which serialized with device
    compute."""
    return _plan_vision_layout_cached(tuple(map(tuple, grid_thws)), cfg)


@lru_cache(maxsize=64)
def _plan_vision_layout_cached(grid_thws, cfg: VisionConfig) -> VisionLayout:
    m = cfg.spatial_merge_size
    ws_units = cfg.window_size // m // cfg.patch_size  # 4 for 112/2/14
    unit = cfg.spatial_merge_unit                       # 4 patches per unit
    wp = ws_units * ws_units * unit                     # 64 patches per window

    pg_parts, pos_parts, oug_parts = [], [], []
    full_groups: list[tuple[int, int]] = []  # (start, len) in padded patch rows
    pad_off = 0    # running offset in padded patch rows
    real_off = 0   # running offset in real patch rows

    for (t, h, w) in grid_thws:
        lh, lw = h // m, w // m                    # llm grid (merge units)
        nwh = -(-lh // ws_units)
        nww = -(-lw // ws_units)
        group_len = nwh * nww * wp                 # padded patches per t-group
        video_units = lh * lw                      # real units per t-group

        for ti in range(t):
            full_groups.append((pad_off + ti * group_len, group_len))

        # one t-group's slots in window order, vectorized over
        # (wh, ww, iuh, iuw, j); then tiled over t with per-t offsets
        wh = np.arange(nwh)[:, None, None, None]
        ww = np.arange(nww)[None, :, None, None]
        iuh = np.arange(ws_units)[None, None, :, None]
        iuw = np.arange(ws_units)[None, None, None, :]
        full = (nwh, nww, ws_units, ws_units)
        uh = np.broadcast_to(wh * ws_units + iuh, full)  # [nwh,nww,ws,ws]
        uw = np.broadcast_to(ww * ws_units + iuw, full)
        valid_u = (uh < lh) & (uw < lw)
        orig_unit = uh * lw + uw                         # per-t, sans ti*lh*lw
        j = np.arange(unit)
        dh, dw = j // m, j % m
        # positions are t-independent
        pos_t = np.stack([(uh[..., None] * m + dh),
                          (uw[..., None] * m + dw)], axis=-1)  # [...,unit,2]
        pos_t = np.where(valid_u[..., None, None], pos_t, 0)
        pos_t = pos_t.reshape(-1, 2).astype(np.int32)
        # patch_gather per t: real_off + (ti*video_units + orig_unit)*unit + j
        base_t = (orig_unit[..., None] * unit + j).reshape(-1)  # [group_len]
        valid_flat = np.repeat(valid_u.reshape(-1), unit)
        ti_idx = np.arange(t)[:, None]
        pg = np.where(valid_flat[None, :],
                      real_off + ti_idx * (video_units * unit) + base_t[None, :],
                      -1).astype(np.int32)               # [t, group_len]
        pg_parts.append(pg.reshape(-1))
        pos_parts.append(np.tile(pos_t, (t, 1)))

        # inverse map: padded unit slot per original merge unit
        slot_unit_t = (pad_off // unit) + (
            ((wh * nww + ww) * ws_units + iuh) * ws_units + iuw)  # per-t base
        flat_slot = slot_unit_t.reshape(-1)               # [units per group]
        flat_orig = orig_unit.reshape(-1)
        sel = valid_u.reshape(-1)
        unit_slot = np.full((t, video_units), -1, dtype=np.int64)
        units_per_group = nwh * nww * ws_units * ws_units
        for ti in range(t):
            unit_slot[ti, flat_orig[sel]] = flat_slot[sel] + ti * units_per_group
        oug_parts.append(unit_slot.reshape(-1))

        pad_off += t * group_len
        real_off += t * video_units * unit

    patch_gather = np.concatenate(pg_parts) if pg_parts else np.zeros(0, np.int32)
    pos_hw = (np.concatenate(pos_parts) if pos_parts
              else np.zeros((0, 2), np.int32))
    # Round the padded sequence up to a whole number of 4-window slabs so the
    # fused window-attention kernel (ops/vit_window_attention.py) can use
    # 256-row MXU tiles with no edge blocks. Trailing slots are whole invalid
    # windows; no gather ever points at them.
    slab = 4 * wp
    short = (-len(patch_gather)) % slab
    if short:
        patch_gather = np.concatenate(
            [patch_gather, np.full(short, -1, np.int32)])
        pos_hw = np.concatenate([pos_hw, np.zeros((short, 2), np.int32)])

    patch_gather = patch_gather.astype(np.int32)
    pos_hw = pos_hw.astype(np.int32)
    valid = patch_gather >= 0
    lmax = max(l for _, l in full_groups)
    full_gather = np.full((len(full_groups), lmax), -1, dtype=np.int32)
    for gi, (start, length) in enumerate(full_groups):
        full_gather[gi, :length] = np.arange(start, start + length, dtype=np.int32)
    out_unit_gather = np.concatenate(oug_parts).astype(np.int32)
    assert (out_unit_gather >= 0).all()
    return VisionLayout(patch_gather, pos_hw, valid, full_gather,
                        out_unit_gather, real_off, wp)


def _vision_rotary(pos_hw: jax.Array, head_dim: int, theta: float):
    """cos/sin [S_pad, head_dim] from (h, w) positions.
    Parity: Qwen2_5_VisionRotaryEmbedding + rot_pos_emb (freqs for h and w
    interleaved as [h_freqs | w_freqs], then duplicated)."""
    inv = rotary_inv_freq(head_dim // 2, theta)  # [head_dim/4]
    fh = pos_hw[:, 0:1].astype(jnp.float32) * inv[None, :]
    fw = pos_hw[:, 1:2].astype(jnp.float32) * inv[None, :]
    half = jnp.concatenate([fh, fw], axis=-1)    # [S, head_dim/2]
    emb = jnp.concatenate([half, half], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _window_attention(q, k, v, valid, wp: int, scale: float):
    """[S_pad, nh, hd] -> dense attention within fixed-size windows."""
    s, nh, hd = q.shape
    nw = s // wp
    qw = q.reshape(nw, wp, nh, hd)
    kw = k.reshape(nw, wp, nh, hd)
    vw = v.reshape(nw, wp, nh, hd)
    mask = valid.reshape(nw, wp)
    scores = jnp.einsum("wqnd,wknd->wnqk", qw, kw,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(vw.dtype)
    out = jnp.einsum("wnqk,wknd->wqnd", probs, vw)
    return out.reshape(s, nh, hd)


def _full_attention(q, k, v, valid, full_gather, scale: float,
                    impl: str = "xla", interpret: bool = False, mesh=None):
    """Gather contiguous frame-group runs into [G, Lmax] and attend densely.

    impl="xla": groups run through a chunked lax.map so peak memory is a few
    groups' [nh, Lmax, Lmax] score blocks, not G of them — at the 128-frame
    eval config that is ~75 MB/group instead of ~5 GB total.
    impl="kernel": one batched flash call over [G, Lmax] with segment-id
    masking (pad slots excluded) — scores never touch HBM."""
    s, nh, hd = q.shape
    g_idx = jnp.asarray(full_gather)
    safe = jnp.maximum(g_idx, 0)
    gmask = (g_idx >= 0) & valid[safe]
    qg, kg, vg = (x[safe] for x in (q, k, v))       # [G, Lmax, nh, hd]

    if impl == "kernel":
        from ..ops.flash import flash_attention

        # flash applies its own hd**-0.5 internally
        assert abs(scale - hd ** -0.5) < 1e-12, scale
        seg = jnp.where(gmask, 1, -2).astype(jnp.int32)
        out = flash_attention(qg, kg, vg, causal=False, segment_ids=seg,
                              interpret=interpret,
                              mesh=mesh)  # [G, Lmax, nh, hd]
        flat_idx = jnp.where(g_idx >= 0, g_idx, s).reshape(-1)
        buf = jnp.zeros((s + 1, nh, hd), dtype=out.dtype)
        buf = buf.at[flat_idx].set(out.reshape(-1, nh, hd), mode="drop")
        return buf[:s]

    def per_group(args):
        qq, kk, vv, mm = args
        scores = jnp.einsum("qnd,knd->nqk", qq, kk,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mm[None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(vv.dtype)
        return jnp.einsum("nqk,knd->qnd", probs, vv)

    # chunked map: fully sequential is latency-bound with many small groups
    # (batched eval), fully batched blows memory at 128-frame shapes — chunk
    # so one chunk's score block stays near ~512 MB fp32
    g_count, lmax = g_idx.shape
    score_bytes = nh * lmax * lmax * 4
    chunk = max(1, min(g_count, (512 << 20) // max(score_bytes, 1)))
    out = jax.lax.map(per_group, (qg, kg, vg, gmask),
                      batch_size=chunk)  # [G, Lmax, nh, hd]
    # scatter back to [S_pad] (pad rows -> trash slot s)
    flat_idx = jnp.where(g_idx >= 0, g_idx, s).reshape(-1)
    buf = jnp.zeros((s + 1, nh, hd), dtype=out.dtype)
    buf = buf.at[flat_idx].set(out.reshape(-1, nh, hd), mode="drop")
    return buf[:s]


def _vision_block(p, x, cos, sin, valid, full_gather, use_full, cfg: VisionConfig,
                  wp: int, attn_impl: str = "xla", act_quant: str | None = None,
                  interpret: bool = False, mesh=None):
    """use_full: traced bool scalar — lax.cond selects the attention type so
    the layer body compiles ONCE for a scan over all depth layers.
    attn_impl: "xla" (batched dense windows) or "kernel" (fused Pallas slab
    kernel, ops/vit_window_attention.py — ~12x faster per windowed layer at
    the 128-frame eval shape).
    act_quant="int8": W8A8 matmuls on the integer MXU (the ViT forward is
    compute-bound like decoder prefill); requires int8-quantized params."""
    nh, hd = cfg.num_heads, cfg.head_dim
    s = x.shape[0]
    h = rms_norm(p["norm1"]["scale"], x, cfg.rms_norm_eps)
    qkv = linear(p["attn"]["qkv"], h, act_quant).reshape(s, 3, nh, hd)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q, k = apply_rotary(q, k, cos[:, None, :], sin[:, None, :])
    scale = hd ** -0.5
    if attn_impl == "kernel":
        from ..ops.vit_window_attention import window_attention

        def window_branch(a):
            return window_attention(*a, wp=wp, interpret=interpret,
                                    mesh=mesh)
    else:
        def window_branch(a):
            return _window_attention(*a, wp, scale)
    attn = jax.lax.cond(
        use_full,
        lambda a: _full_attention(a[0], a[1], a[2], a[3], full_gather, scale,
                                  impl=attn_impl, interpret=interpret,
                                  mesh=mesh),
        window_branch,
        (q, k, v, valid))
    x = x + linear(p["attn"]["proj"], attn.reshape(s, nh * hd), act_quant)
    h = rms_norm(p["norm2"]["scale"], x, cfg.rms_norm_eps)
    return x + swiglu_mlp(p["mlp"], h, act_quant)


@partial(jax.jit, static_argnames=("cfg", "wp", "attn_impl", "act_quant",
                                   "interpret", "remat", "mesh"))
def _vit_forward_jit(params, cfg: VisionConfig, patches, patch_gather, pos_hw,
                     valid, full_gather, out_unit_gather, wp: int,
                     attn_impl: str = "xla", act_quant: str | None = None,
                     interpret: bool = False, remat: bool = False,
                     mesh=None):
    # patch embed: kernel==stride conv3d is a single matmul over flattened patches
    emb = jnp.einsum("si,io->so", patches, params["patch_embed"]["kernel"])
    safe = jnp.maximum(patch_gather, 0)
    # compute dtype follows the PARAMS (bf16 in production) — fp32 input
    # patches must not upcast the whole tower
    x = jnp.where(valid[:, None], emb[safe],
                  0).astype(params["patch_embed"]["kernel"].dtype)

    cos, sin = _vision_rotary(pos_hw, cfg.head_dim, cfg.rope_theta)
    is_full = jnp.asarray([i in set(cfg.fullatt_block_indexes)
                           for i in range(cfg.depth)])

    def body(carry, inp):
        p_i, full_flag = inp
        return _vision_block(p_i, carry, cos, sin, valid, full_gather,
                             full_flag, cfg, wp, attn_impl, act_quant,
                             interpret, mesh=mesh), None

    seg = cfg.remat_segment
    if remat and seg > 1 and cfg.depth % seg == 0:
        # segment-granular checkpointing: an outer scan over depth/seg
        # segments, jax.checkpoint around an inner scan of seg layers —
        # fewer, larger remat regions than per-layer (the r3 depth-32
        # backward exceeded the axon remote compiler's limits; segmenting
        # restructures the saved-activation schedule without changing
        # numerics). cfg.remat_segment opts in.
        nseg = cfg.depth // seg
        blocks_seg = jax.tree_util.tree_map(
            lambda v: v.reshape(nseg, seg, *v.shape[1:]), params["blocks"])

        def seg_body(carry, seg_inp):
            p_seg, flags = seg_inp
            out, _ = jax.lax.scan(body, carry, (p_seg, flags))
            return out, None

        x, _ = jax.lax.scan(jax.checkpoint(seg_body), x,
                            (blocks_seg, is_full.reshape(nseg, seg)))
    else:
        if remat:
            # gradient checkpointing per ViT layer (the reference trains
            # the tower under --gradient_checkpointing, train_sft.sh:62):
            # without it the depth-32 backward saves every layer's
            # activations AND the monolithic backward program breaks the
            # compiler at 128-frame shapes
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, (params["blocks"], is_full))

    # merger: RMSNorm per patch, merge 2x2 units, 2-layer MLP with exact GELU
    mcfg = params["merger"]
    h = rms_norm(mcfg["ln_q"]["scale"], x, cfg.rms_norm_eps)
    u = h.reshape(x.shape[0] // cfg.spatial_merge_unit,
                  cfg.spatial_merge_unit * cfg.hidden_size)
    u = linear(mcfg["fc1"], u, act_quant)
    u = jax.nn.gelu(u, approximate=False)
    u = linear(mcfg["fc2"], u, act_quant)
    return u[out_unit_gather]  # [U_real, out_hidden], original token order


def vit_forward(params: dict, cfg: VisionConfig, patches: jax.Array,
                layout: VisionLayout, attn_impl: str = "auto",
                act_quant: str | None = None,
                interpret: bool = False, remat: bool = False,
                mesh=None) -> jax.Array:
    """patches [S_real, C*tps*p*p] -> merged vision embeddings
    [S_real/4, out_hidden] in the same order the processor emitted patches.

    attn_impl: "auto" uses the fused Pallas window kernel on TPU (falls back
    to the XLA batched-window path elsewhere / on incompatible layouts);
    "xla"/"kernel" force a path."""
    if attn_impl == "auto":
        w = params["patch_embed"]["kernel"]
        multi_device = (isinstance(w, jax.Array)
                        and not isinstance(w, jax.core.Tracer)
                        and len(w.devices()) > 1)
        if multi_device:
            # mesh-sharded params (eval/rollout towers on a mesh): run the
            # fused kernels head-sharded over "tp" (partial-manual
            # shard_map) when tp divides the head count; otherwise the XLA
            # path shards via GSPMD from the weight annotations. Tracer
            # params (training jit) can't be inspected; meshed trainers
            # pass attn_impl explicitly (SFTConfig.vit_attn_impl).
            m = getattr(w.sharding, "mesh", None)
            tp = dict(m.shape).get("tp", 1) if m is not None else 0
            if (jax.default_backend() == "tpu" and m is not None
                    and tp > 1 and cfg.num_heads % tp == 0
                    and layout.s_pad % (4 * layout.window_patches) == 0):
                attn_impl, mesh = "kernel", m
            else:
                # tp <= 1 multi-device (fsdp/dp/ep-only mesh): there is no
                # head axis to shard_map over, and a bare pallas_call
                # inside the GSPMD partition is exactly what the downgrade
                # exists to avoid — xla shards via the weight annotations
                attn_impl = "xla"
        else:
            attn_impl = ("kernel"
                         if jax.default_backend() == "tpu"
                         and layout.s_pad % (4 * layout.window_patches) == 0
                         else "xla")
    return _vit_forward_jit(
        params, cfg, patches,
        jnp.asarray(layout.patch_gather), jnp.asarray(layout.pos_hw),
        jnp.asarray(layout.valid), jnp.asarray(layout.full_gather),
        jnp.asarray(layout.out_unit_gather), layout.window_patches,
        attn_impl, act_quant, interpret, remat, mesh=mesh)
