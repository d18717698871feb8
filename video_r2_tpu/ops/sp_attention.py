"""Sequence-parallel (context-parallel) flash attention over a mesh axis.

Scales long-video attention past one chip's HBM: the sequence axis of
q/k/v is block-sharded over the ``sp`` mesh axis, every other op in the
decoder (norms, MLPs, rotary) is elementwise along the sequence and
shards for free under GSPMD — only attention mixes positions, and this
module supplies that mixing as a shard_map'd primitive with a custom VJP.

Design (TPU-first; no reference counterpart — the reference trains
single-GPU-context with FlashAttention-2, SURVEY §2.4 N1):

- Per shard, causal attention decomposes into flash regions that never
  need a dynamic q_offset:
    local  : causal flash over the device's own [C] KV shard (q_offset=0
             is correct because q and kv share the same shard origin),
    prefix : NON-causal flash over earlier shards' KV with a traced
             kv-length masking everything at or beyond this shard —
             either ONE call over the all-gathered KV (sp_impl="gather",
             peak KV O(S), fewest dispatches) or n-1 ppermute ring hops
             (sp_impl="ring", peak KV O(C), comm overlaps compute).
  Partial outputs merge by the standard log-sum-exp identity.
- Backward runs the SAME FA2 recompute kernels per region
  (ops/flash.py::_flash_bwd_kernels) with the globally-MERGED lse: with
  p = exp(s - lse_global), per-region dq/dk/dv partials sum exactly to
  the full-attention gradient (FlashAttention split-KV identity). The
  gather variant reduce-scatters the full-sequence prefix dk/dv back to
  shards; the ring variant rotates (k, v, dk, dv) together so each
  shard's f32 accumulator arrives home after the final hop. KV is
  re-gathered/re-rotated in the backward instead of saved
  (sequence-parallelism exists to NOT hold O(S) per device).
- Segment ids (packed sequences / GRPO's [prompt_pad | completion] gap
  mask, train/grpo.py:168-172) shard with the sequence: the local
  region masks on the local [C] slice, the prefix region on the
  gathered/rotated slices — the underlying kernels already AND the
  segment-equality mask into the score mask.
- Fully-masked rows surface the forward kernel's lse sentinel (+1e30);
  the merge zeroes their weight explicitly, and rows empty in ALL
  regions get the sentinel back so the backward's exp(s - lse)
  underflows to exactly 0.

Compute is block-contiguous-sharded, so causal work is imbalanced across
shards (the last shard attends the most keys). That is the standard
trade for gather-based context parallelism; a zigzag layout can
rebalance it later without changing this op's contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .flash import (DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, NEG_INF, _flash_bwd_kernels,
                    _flash_call)

_SENTINEL = -NEG_INF  # lse value the forward kernel emits for empty rows


def _merge_regions(out_l, lse_l, out_p, lse_p):
    """Log-sum-exp merge of two flash partials. out_* [B,nh,C,hd],
    lse_* [B,nh,C,1] (f32, _SENTINEL marks fully-masked rows)."""
    l_valid = lse_l < _SENTINEL * 0.5
    p_valid = lse_p < _SENTINEL * 0.5
    lse_l_e = jnp.where(l_valid, lse_l, NEG_INF)
    lse_p_e = jnp.where(p_valid, lse_p, NEG_INF)
    m = jnp.maximum(lse_l_e, lse_p_e)
    a_l = jnp.where(l_valid, jnp.exp(lse_l_e - m), 0.0)
    a_p = jnp.where(p_valid, jnp.exp(lse_p_e - m), 0.0)
    se = a_l + a_p
    denom = jnp.maximum(se, 1e-30)
    out = (out_l.astype(jnp.float32) * a_l
           + out_p.astype(jnp.float32) * a_p) / denom
    # rows empty in both regions keep the sentinel so bwd p underflows to 0
    lse_g = jnp.where(se > 0, m + jnp.log(denom), _SENTINEL)
    return out.astype(out_l.dtype), lse_g


def _region_lengths(kv_len, idx, C):
    """Valid-key counts for the two regions of shard `idx`."""
    lens_local = jnp.clip(kv_len - idx * C, 0, C).astype(jnp.int32)
    lens_prefix = jnp.minimum(kv_len, idx * C).astype(jnp.int32)
    return lens_local, lens_prefix


def _ring_step_lens(kv_len, idx, src, C):
    """Keys of shard `src` visible to shard `idx`'s queries: the whole shard
    (clipped by the global valid length) iff src is strictly before idx,
    else none — the kernel's kv-length masking then skips the work."""
    lens = jnp.clip(kv_len - src * C, 0, C).astype(jnp.int32)
    return jnp.where(src < idx, lens, 0)


def _shift_perm(n):
    """ppermute pairs rotating data one device forward along the ring."""
    return [(j, (j + 1) % n) for j in range(n)]


_NONDIFF = (6, 7, 8, 9, 10, 11, 12)  # axis, g, block_q, block_k, n,
#                                      interpret, (has_segments, ring)


@functools.partial(jax.custom_vjp, nondiff_argnums=_NONDIFF)
def _sp_core(qt, kt, vt, kv_len, qseg, kseg, axis, g, block_q, block_k, n,
             interpret, flags):
    """Head-major per-shard SP attention. qt [B,nh,C,hd], kt/vt [B,kh,C,hd]
    and qseg/kseg [B,C] are this shard's slice; runs inside shard_map over
    `axis`. flags = (has_segments, ring)."""
    has_segments, ring = flags
    fwd = _sp_fwd_ring if ring else _sp_fwd_gather
    out, _ = fwd(qt, kt, vt, kv_len, qseg, kseg, axis=axis, g=g, n=n,
                 block_q=block_q, block_k=block_k,
                 has_segments=has_segments, interpret=interpret)
    return out


def _local_causal_fwd(qt, kt, vt, lens_local, qseg, kseg, *, block_q,
                      block_k, g, has_segments, interpret):
    return _flash_call(
        lens_local, qt, kt, vt, qseg, kseg, causal=True, q_offset=0,
        block_q=block_q, block_k=block_k, g=g, has_segments=has_segments,
        interpret=interpret, with_lse=True)


def _sp_fwd_gather(qt, kt, vt, kv_len, qseg, kseg, *, axis, g, n, block_q,
                   block_k, has_segments, interpret):
    """All-gather-KV variant: one non-causal flash call over the full
    gathered prefix. Peak KV memory O(S); fewest dispatches."""
    B, nh, C, hd = qt.shape
    idx = jax.lax.axis_index(axis)
    lens_local, lens_prefix = _region_lengths(kv_len, idx, C)

    out_l, lse_l = _local_causal_fwd(qt, kt, vt, lens_local, qseg, kseg,
                                     block_q=block_q, block_k=block_k, g=g,
                                     has_segments=has_segments,
                                     interpret=interpret)

    kfull = jax.lax.all_gather(kt, axis, axis=2, tiled=True)
    vfull = jax.lax.all_gather(vt, axis, axis=2, tiled=True)
    ksegf = jax.lax.all_gather(kseg, axis, axis=1, tiled=True)
    out_p, lse_p = _flash_call(
        lens_prefix, qt, kfull, vfull, qseg, ksegf, causal=False, q_offset=0,
        block_q=block_q, block_k=block_k, g=g, has_segments=has_segments,
        interpret=interpret, with_lse=True)

    return _merge_regions(out_l, lse_l, out_p, lse_p)


def _sp_fwd_ring(qt, kt, vt, kv_len, qseg, kseg, *, axis, g, n, block_q,
                 block_k, has_segments, interpret):
    """Ring variant: KV shards rotate one hop per step (ppermute over ICI),
    each step's non-causal partial merges into a running f32 accumulator.
    Peak KV memory stays O(C); comm overlaps compute on real hardware."""
    B, nh, C, hd = qt.shape
    idx = jax.lax.axis_index(axis)
    lens_local, _ = _region_lengths(kv_len, idx, C)

    out_l, lse_l = _local_causal_fwd(qt, kt, vt, lens_local, qseg, kseg,
                                     block_q=block_q, block_k=block_k, g=g,
                                     has_segments=has_segments,
                                     interpret=interpret)
    acc, lse = out_l.astype(jnp.float32), lse_l

    perm = _shift_perm(n)
    k_r, v_r, kseg_r = kt, vt, kseg
    for t in range(1, n):
        k_r = jax.lax.ppermute(k_r, axis, perm)
        v_r = jax.lax.ppermute(v_r, axis, perm)
        if has_segments:
            kseg_r = jax.lax.ppermute(kseg_r, axis, perm)
        src = (idx - t) % n           # shard id this device now holds
        lens_t = _ring_step_lens(kv_len, idx, src, C)
        out_t, lse_t = _flash_call(
            lens_t, qt, k_r, v_r, qseg, kseg_r, causal=False, q_offset=0,
            block_q=block_q, block_k=block_k, g=g,
            has_segments=has_segments, interpret=interpret, with_lse=True)
        acc, lse = _merge_regions(acc, lse, out_t, lse_t)
    return acc.astype(qt.dtype), lse


def _sp_core_fwd(qt, kt, vt, kv_len, qseg, kseg, axis, g, block_q, block_k,
                 n, interpret, flags):
    has_segments, ring = flags
    fwd = _sp_fwd_ring if ring else _sp_fwd_gather
    out, lse_g = fwd(qt, kt, vt, kv_len, qseg, kseg, axis=axis, g=g, n=n,
                     block_q=block_q, block_k=block_k,
                     has_segments=has_segments, interpret=interpret)
    return out, (qt, kt, vt, kv_len, qseg, kseg, out, lse_g)


def _sp_core_bwd(axis, g, block_q, block_k, n, interpret, flags, res, do):
    import numpy as np

    has_segments, ring = flags
    qt, kt, vt, kv_len, qseg, kseg, out_g, lse_g = res
    bwd = _sp_bwd_ring if ring else _sp_bwd_gather
    dq, dk, dv = bwd(qt, kt, vt, kv_len, qseg, kseg, out_g, lse_g, do,
                     axis=axis, g=g, n=n, block_q=block_q, block_k=block_k,
                     has_segments=has_segments, interpret=interpret)
    f0 = jax.dtypes.float0
    return (dq, dk, dv, np.zeros(kv_len.shape, f0),
            np.zeros(qseg.shape, f0), np.zeros(kseg.shape, f0))


def _local_causal_bwd(qt, kt, vt, do, out_g, lse_g, lens_local, qseg, kseg,
                      *, block_q, block_k, g, has_segments, interpret):
    return _flash_bwd_kernels(
        qt, kt, vt, do, out_g, lse_g, lens_local, qseg, kseg, causal=True,
        q_offset=0, block_q=block_q, block_k=block_k, g=g,
        has_segments=has_segments, interpret=interpret)


def _sp_bwd_gather(qt, kt, vt, kv_len, qseg, kseg, out_g, lse_g, do, *,
                   axis, g, n, block_q, block_k, has_segments, interpret):
    B, nh, C, hd = qt.shape
    idx = jax.lax.axis_index(axis)
    lens_local, lens_prefix = _region_lengths(kv_len, idx, C)

    # local region: same FA2 kernels, globally-merged lse
    dq_l, dk_l, dv_l = _local_causal_bwd(
        qt, kt, vt, do, out_g, lse_g, lens_local, qseg, kseg,
        block_q=block_q, block_k=block_k, g=g, has_segments=has_segments,
        interpret=interpret)

    # prefix region against the re-gathered KV; dk/dv come back for the
    # full sequence and reduce-scatter (f32) to this shard's slice
    kfull = jax.lax.all_gather(kt, axis, axis=2, tiled=True)
    vfull = jax.lax.all_gather(vt, axis, axis=2, tiled=True)
    ksegf = jax.lax.all_gather(kseg, axis, axis=1, tiled=True)
    dq_p, dk_pf, dv_pf = _flash_bwd_kernels(
        qt, kfull, vfull, do, out_g, lse_g, lens_prefix, qseg, ksegf,
        causal=False, q_offset=0, block_q=block_q, block_k=block_k, g=g,
        has_segments=has_segments, interpret=interpret)
    dk_p = jax.lax.psum_scatter(dk_pf.astype(jnp.float32), axis,
                                scatter_dimension=2, tiled=True)
    dv_p = jax.lax.psum_scatter(dv_pf.astype(jnp.float32), axis,
                                scatter_dimension=2, tiled=True)

    dq = (dq_l.astype(jnp.float32) + dq_p.astype(jnp.float32)).astype(qt.dtype)
    dk = (dk_l.astype(jnp.float32) + dk_p).astype(kt.dtype)
    dv = (dv_l.astype(jnp.float32) + dv_p).astype(vt.dtype)
    return dq, dk, dv


def _sp_bwd_ring(qt, kt, vt, kv_len, qseg, kseg, out_g, lse_g, do, *, axis,
                 g, n, block_q, block_k, has_segments, interpret):
    """Ring backward: (k, v, dk-acc, dv-acc) rotate together; each device
    adds its contribution to the accumulator of whichever shard it holds,
    and after the final hop every shard's f32 dk/dv accumulator is home."""
    B, nh, C, hd = qt.shape
    idx = jax.lax.axis_index(axis)
    lens_local, _ = _region_lengths(kv_len, idx, C)

    dq_l, dk_l, dv_l = _local_causal_bwd(
        qt, kt, vt, do, out_g, lse_g, lens_local, qseg, kseg,
        block_q=block_q, block_k=block_k, g=g, has_segments=has_segments,
        interpret=interpret)
    dq = dq_l.astype(jnp.float32)

    perm = _shift_perm(n)
    k_r, v_r, kseg_r = kt, vt, kseg
    dk_r = jnp.zeros((B, kt.shape[1], C, hd), jnp.float32)
    dv_r = jnp.zeros_like(dk_r)
    for t in range(1, n):
        k_r = jax.lax.ppermute(k_r, axis, perm)
        v_r = jax.lax.ppermute(v_r, axis, perm)
        if has_segments:
            kseg_r = jax.lax.ppermute(kseg_r, axis, perm)
        dk_r = jax.lax.ppermute(dk_r, axis, perm)
        dv_r = jax.lax.ppermute(dv_r, axis, perm)
        src = (idx - t) % n
        lens_t = _ring_step_lens(kv_len, idx, src, C)
        dq_t, dk_t, dv_t = _flash_bwd_kernels(
            qt, k_r, v_r, do, out_g, lse_g, lens_t, qseg, kseg_r,
            causal=False, q_offset=0, block_q=block_q, block_k=block_k, g=g,
            has_segments=has_segments, interpret=interpret)
        dq = dq + dq_t.astype(jnp.float32)
        dk_r = dk_r + dk_t.astype(jnp.float32)
        dv_r = dv_r + dv_t.astype(jnp.float32)
    # accumulators now hold shard (idx+1)%n; one more hop brings them home
    dk_r = jax.lax.ppermute(dk_r, axis, perm)
    dv_r = jax.lax.ppermute(dv_r, axis, perm)

    dq = dq.astype(qt.dtype)
    dk = (dk_l.astype(jnp.float32) + dk_r).astype(kt.dtype)
    dv = (dv_l.astype(jnp.float32) + dv_r).astype(vt.dtype)
    return dq, dk, dv


_sp_core.defvjp(_sp_core_fwd, _sp_core_bwd)


def sp_flash_attention(
    q: jax.Array,                  # [B, S, nh, hd] — S sharded over `axis`
    k: jax.Array,                  # [B, S, kh, hd]
    v: jax.Array,
    mesh: jax.sharding.Mesh,
    *,
    axis: str = "sp",
    kv_lengths: jax.Array | None = None,  # [B] global valid kv length
    causal: bool = True,
    segment_ids: jax.Array | None = None,  # [B, S] int32 equality mask
    batch_axes=None,               # mesh axes the batch dim is sharded over
    head_axis: str | None = None,  # mesh axis the head dims are sharded over
    sp_impl: str = "gather",       # "gather" (all-gather KV) | "ring"
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
) -> jax.Array:
    """Context-parallel causal flash attention (differentiable).

    Call from GSPMD-land (inside jit over `mesh`): the shard_map boundary
    converts the logical [B, S, ...] arrays to per-device shards. The
    sequence axis must be block-contiguous-sharded over `axis` for the
    causal decomposition to hold. `batch_axes`/`head_axis` name the mesh
    axes the batch/head dims are sharded over (dp/fsdp, tp) so the
    shard_map boundary preserves those shardings instead of gathering.
    """
    if not causal:
        raise NotImplementedError("sp attention is causal-only (decoder path)")
    B, S, nh, hd = q.shape
    kh = k.shape[2]
    n = mesh.shape[axis]
    if S % n:
        raise ValueError(f"seq len {S} not divisible by sp={n}")
    C = S // n
    bq = min(block_q, C)
    bk = min(block_k, C)
    if C % bq or C % bk:
        raise ValueError(f"shard len {C} not divisible by blocks ({bq},{bk})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if kv_lengths is None:
        kv_lengths = jnp.full((B,), S, jnp.int32)
    if head_axis is not None:
        t = mesh.shape[head_axis]
        if t == 1 or nh % t or kh % t:
            head_axis = None  # uneven head split: replicate heads instead
    g = nh // kh  # per-shard GQA ratio is unchanged by an even head split
    if sp_impl not in ("gather", "ring"):
        raise ValueError(f"unknown sp_impl {sp_impl!r}")
    has_segments = segment_ids is not None
    if has_segments:
        segment_ids = segment_ids.astype(jnp.int32)
    else:  # dummy keeps the shard_map argument list static
        segment_ids = jnp.zeros((B, S), jnp.int32)
    flags = (has_segments, sp_impl == "ring")

    def shard_fn(q, k, v, kv_len, seg):
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out = _sp_core(qt, kt, vt, kv_len, seg, seg, axis, g, bq, bk, n,
                       interpret, flags)
        return out.transpose(0, 2, 1, 3)

    spec = P(batch_axes, axis, head_axis, None)
    f = jax.shard_map(shard_fn, mesh=mesh,
                      in_specs=(spec, spec, spec, P(batch_axes),
                                P(batch_axes, axis)),
                      out_specs=spec, check_vma=False)
    return f(q, k, v, kv_lengths.astype(jnp.int32), segment_ids)


# ---------------------------------------------------------------------------
# Process-level SP context: the decoder's attention dispatch reads this when
# attn_impl == "sp" (the mesh is process-constant; trainers register it once
# before tracing their jitted step).

_SP_CONTEXT: dict | None = None


def set_sp_context(mesh, *, axis: str = "sp", batch_axes=None,
                   head_axis: str | None = None,
                   sp_impl: str = "gather") -> None:
    global _SP_CONTEXT
    if mesh is None:
        _SP_CONTEXT = None
        return
    if axis not in mesh.axis_names or mesh.shape[axis] < 2:
        raise ValueError(f"mesh has no sharded '{axis}' axis: {mesh.shape}")
    _SP_CONTEXT = dict(mesh=mesh, axis=axis, batch_axes=batch_axes,
                       head_axis=head_axis, sp_impl=sp_impl)


def get_sp_context() -> dict:
    if _SP_CONTEXT is None:
        raise RuntimeError(
            "attn_impl='sp' requires set_sp_context(mesh) before tracing")
    return _SP_CONTEXT
