"""Pallas TPU flash attention (causal + padding-aware, GQA).

TPU-native replacement for FlashAttention-2 (reference N1, SURVEY §2.4):
online-softmax tiling with fp32 accumulators in VMEM, one grid program per
(batch, q-head, q-block). GQA is expressed in the k/v index maps (kv head =
q head // group) so no repeat materialization. Causality is enforced both by
skipping fully-masked kv blocks (loop trip count per q block) and by an
in-block mask on the diagonal blocks. Padding is masked via per-batch kv
lengths.

The XLA reference path in attention.py is the numerics oracle; tests compare
both (kernel runs in interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_attn_accumulate(lengths_ref, q_ref, k_ref, v_ref, qseg_ref,
                           kseg_ref, *, block_q: int, block_k: int,
                           causal: bool, q_offset: int, scale: float,
                           has_segments: bool):
    """Online-softmax accumulation for one (batch, head, q_block) program.
    Returns (acc [block_q, hd] f32 unnormalized, m, l)."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale
    hd = q.shape[-1]

    kv_len = lengths_ref[b]
    # causal limit for the last row of this q block (global position)
    q_end = q_offset + (qi + 1) * block_q
    limit = jnp.minimum(kv_len, q_end) if causal else kv_len
    num_kv = pl.cdiv(limit, block_k)

    def body(ki, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # mask: kv position validity + causality + segment equality
        kpos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = kpos < kv_len
        if causal:
            qpos = (q_offset + qi * block_q
                    + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))
            mask = mask & (kpos <= qpos)
        if has_segments:
            qs = qseg_ref[b, pl.ds(qi * block_q, block_q)]     # [block_q]
            ks = kseg_ref[b, pl.ds(ki * block_k, block_k)]     # [block_k]
            mask = mask & (qs[:, None] == ks[None, :])
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, hd), jnp.float32)
    m_i = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    return jax.lax.fori_loop(0, num_kv, body, (acc, m_i, l_i))


def _flash_kernel(lengths_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref,
                  *, block_q: int, block_k: int, causal: bool,
                  q_offset: int, seq_k: int, scale: float, has_segments: bool):
    """One (batch, head, q_block) program.

    q_ref: [block_q, hd]; k_ref/v_ref: [seq_k, hd] (full kv row in VMEM);
    o_ref: [block_q, hd]. lengths_ref: [1] SMEM (valid kv length for batch).
    qseg/kseg: optional [block_q]/[seq_k] int32 segment ids — attention is
    allowed only within equal segments (packed sequences, gap masks).
    """
    acc, m_i, l_i = _flash_attn_accumulate(
        lengths_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
        block_q=block_q, block_k=block_k, causal=causal, q_offset=q_offset,
        scale=scale, has_segments=has_segments)
    # rows with no valid kv (fully masked) produce l=0 -> emit 0
    out = acc / jnp.maximum(l_i, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _flash_fwd_kernel(lengths_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                      o_ref, lse_ref, *, block_q: int, block_k: int,
                      causal: bool, q_offset: int, seq_k: int, scale: float,
                      has_segments: bool):
    """Forward variant that also writes the log-sum-exp of the scaled scores
    per q row (the FA2 backward residual). Fully-masked rows get +inf-like
    LSE so the backward's exp(s - lse) underflows to exactly 0."""
    acc, m_i, l_i = _flash_attn_accumulate(
        lengths_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
        block_q=block_q, block_k=block_k, causal=causal, q_offset=q_offset,
        scale=scale, has_segments=has_segments)
    out = acc / jnp.maximum(l_i, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)
    lse = jnp.where(l_i > 0, m_i + jnp.log(jnp.maximum(l_i, 1e-30)), -NEG_INF)
    lse_ref[0, 0] = lse.astype(lse_ref.dtype)


def _flash_bwd_dq_kernel(lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, qseg_ref, kseg_ref, dq_ref, *,
                         block_q: int, block_k: int, causal: bool,
                         q_offset: int, scale: float, has_segments: bool):
    """dq for one (batch, head, q_block): loop over kv blocks, rebuild
    normalized p from the saved LSE, ds = p * (do.v^T - delta), dq += ds.k."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0].astype(jnp.float32)        # [block_q, 1]
    delta = delta_ref[0, 0].astype(jnp.float32)    # [block_q, 1]
    hd = q.shape[-1]

    kv_len = lengths_ref[b]
    q_end = q_offset + (qi + 1) * block_q
    limit = jnp.minimum(kv_len, q_end) if causal else kv_len
    num_kv = pl.cdiv(limit, block_k)

    def body(ki, acc):
        k_blk = k_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kpos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = kpos < kv_len
        if causal:
            qpos = (q_offset + qi * block_q
                    + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))
            mask = mask & (kpos <= qpos)
        if has_segments:
            qs = qseg_ref[b, pl.ds(qi * block_q, block_q)]
            ks = kseg_ref[b, pl.ds(ki * block_k, block_k)]
            mask = mask & (qs[:, None] == ks[None, :])
        s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse)                       # normalized probabilities
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(ds, k_blk, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kv, body,
                           jnp.zeros((block_q, hd), jnp.float32)) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, qseg_ref, kseg_ref, dk_ref, dv_ref, *,
                          block_q: int, block_k: int, causal: bool,
                          q_offset: int, seq_q: int, scale: float,
                          has_segments: bool):
    """dk/dv for one (batch, q-head, k_block): loop over q blocks (causally
    skipping blocks entirely above the diagonal), p^T.do accumulates dv and
    ds^T.(scale*q) accumulates dk. GQA group reduction happens outside."""
    b = pl.program_id(0)
    ki = pl.program_id(2)
    k = k_ref[0, 0].astype(jnp.float32)            # [block_k, hd]
    v = v_ref[0, 0].astype(jnp.float32)
    hd = k.shape[-1]

    kv_len = lengths_ref[b]
    num_q = seq_q // block_q
    if causal:
        # first q block whose last row reaches this k block's first column
        lo = jnp.maximum((ki * block_k - q_offset) // block_q, 0)
    else:
        lo = 0

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q_blk = (q_ref[0, 0, pl.ds(qi * block_q, block_q), :]
                 .astype(jnp.float32) * scale)
        do_blk = do_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse_blk = lse_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        delta_blk = delta_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        s = jax.lax.dot_general(q_blk, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kpos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = kpos < kv_len
        if causal:
            qpos = (q_offset + qi * block_q
                    + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))
            mask = mask & (kpos <= qpos)
        if has_segments:
            qs = qseg_ref[b, pl.ds(qi * block_q, block_q)]
            ks = kseg_ref[b, pl.ds(ki * block_k, block_k)]
            mask = mask & (qs[:, None] == ks[None, :])
        s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse_blk)                   # [block_q, block_k]
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_blk, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_blk)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    zero = jnp.zeros((block_k, hd), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, num_q, body, (zero, zero))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_call(lengths, qt, kt, vt, qseg, kseg, *, causal, q_offset,
                block_q, block_k, g, has_segments, interpret, with_lse):
    """pallas_call over padded head-major arrays. qt [B,nh,Sq_p,hd],
    kt/vt [B,kh,Sk_p,hd]. Returns out (and lse [B,nh,Sq_p,1] if with_lse)."""
    B, nh, Sq_p, hd = qt.shape
    Sk_p = kt.shape[2]
    grid = (B, nh, Sq_p // block_q)
    kernel_fn = _flash_fwd_kernel if with_lse else _flash_kernel
    kernel = functools.partial(
        kernel_fn, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, seq_k=Sk_p, scale=hd ** -0.5,
        has_segments=has_segments)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, hd), lambda b, h, i, L: (b, h, i, 0)),
        pl.BlockSpec((1, 1, Sk_p, hd),
                     lambda b, h, i, L: (b, h // g if g > 1 else h, 0, 0)),
        pl.BlockSpec((1, 1, Sk_p, hd),
                     lambda b, h, i, L: (b, h // g if g > 1 else h, 0, 0)),
        # full-array blocks: Mosaic requires the last two block dims
        # to be (8-, 128-divisible) or equal to the array dims
        pl.BlockSpec((B, Sq_p), lambda b, h, i, L: (0, 0)),
        pl.BlockSpec((B, Sk_p), lambda b, h, i, L: (0, 0)),
    ]
    out_blk = pl.BlockSpec((1, 1, block_q, hd), lambda b, h, i, L: (b, h, i, 0))
    if with_lse:
        out_specs = [out_blk,
                     pl.BlockSpec((1, 1, block_q, 1),
                                  lambda b, h, i, L: (b, h, i, 0))]
        out_shape = [jax.ShapeDtypeStruct((B, nh, Sq_p, hd), qt.dtype),
                     jax.ShapeDtypeStruct((B, nh, Sq_p, 1), jnp.float32)]
    else:
        out_specs = out_blk
        out_shape = jax.ShapeDtypeStruct((B, nh, Sq_p, hd), qt.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_specs),
        out_shape=out_shape,
        interpret=interpret,
    )(lengths, qt, kt, vt, qseg, kseg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _flash_core(qt, kt, vt, lengths, qseg, kseg, causal, q_offset, block_q,
                block_k, g, has_segments, interpret):
    """Padded head-major flash attention with an FA2-style two-pass VJP
    (recompute from the saved per-row LSE) — the reference trains through
    FlashAttention-2's backward (N1, train_sft.py:127)."""
    return _flash_call(lengths, qt, kt, vt, qseg, kseg, causal=causal,
                       q_offset=q_offset, block_q=block_q, block_k=block_k,
                       g=g, has_segments=has_segments, interpret=interpret,
                       with_lse=False)


def _flash_core_fwd(qt, kt, vt, lengths, qseg, kseg, causal, q_offset,
                    block_q, block_k, g, has_segments, interpret):
    out, lse = _flash_call(lengths, qt, kt, vt, qseg, kseg, causal=causal,
                           q_offset=q_offset, block_q=block_q,
                           block_k=block_k, g=g, has_segments=has_segments,
                           interpret=interpret, with_lse=True)
    return out, (qt, kt, vt, lengths, qseg, kseg, out, lse)


def _flash_core_bwd(causal, q_offset, block_q, block_k, g, has_segments,
                    interpret, res, do):
    import numpy as np

    qt, kt, vt, lengths, qseg, kseg, out, lse = res
    dq, dk, dv = _flash_bwd_kernels(
        qt, kt, vt, do, out, lse, lengths, qseg, kseg, causal=causal,
        q_offset=q_offset, block_q=block_q, block_k=block_k, g=g,
        has_segments=has_segments, interpret=interpret)
    f0 = jax.dtypes.float0
    return (dq, dk, dv,
            np.zeros(lengths.shape, f0), np.zeros(qseg.shape, f0),
            np.zeros(kseg.shape, f0))


def _flash_bwd_kernels(qt, kt, vt, do, out, lse, lengths, qseg, kseg, *,
                       causal, q_offset, block_q, block_k, g, has_segments,
                       interpret):
    """FA2 recompute backward from a given LSE. Exposed separately so the
    sequence-parallel attention (ops/sp_attention.py) can run the SAME
    kernels per region with the globally-MERGED lse (the FlashAttention
    split-KV backward identity: p = exp(s - lse_global) makes per-region
    dq/dk/dv partials sum to the full-attention gradient)."""
    B, nh, Sq_p, hd = qt.shape
    kh, Sk_p = kt.shape[1], kt.shape[2]
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)        # [B, nh, Sq_p, 1]

    kv_spec = pl.BlockSpec(
        (1, 1, Sk_p, hd), lambda b, h, i, L: (b, h // g if g > 1 else h, 0, 0))
    q_blk_spec = pl.BlockSpec((1, 1, block_q, hd),
                              lambda b, h, i, L: (b, h, i, 0))
    row_blk_spec = pl.BlockSpec((1, 1, block_q, 1),
                                lambda b, h, i, L: (b, h, i, 0))
    seg_specs = [pl.BlockSpec((B, Sq_p), lambda b, h, i, L: (0, 0)),
                 pl.BlockSpec((B, Sk_p), lambda b, h, i, L: (0, 0))]

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_q=block_q,
                          block_k=block_k, causal=causal, q_offset=q_offset,
                          scale=hd ** -0.5, has_segments=has_segments),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nh, Sq_p // block_q),
            in_specs=[q_blk_spec, kv_spec, kv_spec, q_blk_spec,
                      row_blk_spec, row_blk_spec, *seg_specs],
            out_specs=q_blk_spec),
        out_shape=jax.ShapeDtypeStruct((B, nh, Sq_p, hd), qt.dtype),
        interpret=interpret,
    )(lengths, qt, kt, vt, do, lse, delta, qseg, kseg)

    # dk/dv per Q head, then reduced over each GQA group
    q_full_spec = pl.BlockSpec((1, 1, Sq_p, hd), lambda b, h, i, L: (b, h, 0, 0))
    row_full_spec = pl.BlockSpec((1, 1, Sq_p, 1), lambda b, h, i, L: (b, h, 0, 0))
    k_blk_spec = pl.BlockSpec(
        (1, 1, block_k, hd),
        lambda b, h, i, L: (b, h // g if g > 1 else h, i, 0))
    dkv_out_spec = pl.BlockSpec((1, 1, block_k, hd),
                                lambda b, h, i, L: (b, h, i, 0))
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q,
                          block_k=block_k, causal=causal, q_offset=q_offset,
                          seq_q=Sq_p, scale=hd ** -0.5,
                          has_segments=has_segments),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nh, Sk_p // block_k),
            in_specs=[q_full_spec, k_blk_spec, k_blk_spec, q_full_spec,
                      row_full_spec, row_full_spec, *seg_specs],
            out_specs=[dkv_out_spec, dkv_out_spec]),
        out_shape=[jax.ShapeDtypeStruct((B, nh, Sk_p, hd), jnp.float32)] * 2,
        interpret=interpret,
    )(lengths, qt, kt, vt, do, lse, delta, qseg, kseg)
    dk = dk_h.reshape(B, kh, g, Sk_p, hd).sum(axis=2).astype(kt.dtype)
    dv = dv_h.reshape(B, kh, g, Sk_p, hd).sum(axis=2).astype(vt.dtype)
    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret", "q_offset",
                     "mesh"))
def flash_attention(
    q: jax.Array,                  # [B, Sq, nh, hd]
    k: jax.Array,                  # [B, Sk, kh, hd]
    v: jax.Array,
    kv_lengths: jax.Array | None = None,  # [B] valid kv per batch
    causal: bool = True,
    q_offset: int = 0,             # global position of q row 0 (cache decode)
    segment_ids: jax.Array | None = None,  # [B, S] int32; Sq==Sk required
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    bias=None,                     # unsupported here; kept for API parity
    mesh=None,                     # TP serving: heads sharded over "tp"
) -> jax.Array:
    """Differentiable: a custom FA2-style VJP (LSE residual + two recompute
    kernels) covers jax.grad through prefill/SFT/ViT-full-attention paths.

    mesh: tensor-parallel prefill (sharded judge serving) — the kernel grid
    is head-separable (GQA groups never mix kv heads), so each "tp" shard
    runs the unchanged kernel over its own heads in a partial-manual
    shard_map; lengths/segments replicate, no collective inside."""
    assert bias is None, "flash path takes kv_lengths/causal, not a bias"
    B, Sq, nh, hd = q.shape
    _, Sk, kh, _ = k.shape
    g = nh // kh
    if kv_lengths is None:
        kv_lengths = jnp.full((B,), Sk, jnp.int32)
    if mesh is not None:
        tp = dict(mesh.shape).get("tp", 1)
        if tp > 1:
            assert nh % tp == 0 and kh % tp == 0, (
                f"flash+mesh: tp={tp} must divide heads ({nh}, {kh}) — "
                "callers fall back to the xla path otherwise")
            from jax.sharding import PartitionSpec as P

            hspec = P(None, None, "tp", None)
            inner = functools.partial(
                flash_attention, causal=causal, q_offset=q_offset,
                block_q=block_q, block_k=block_k, interpret=interpret)
            if segment_ids is not None:
                fn = jax.shard_map(
                    lambda q_, k_, v_, l_, s_: inner(
                        q_, k_, v_, kv_lengths=l_, segment_ids=s_),
                    mesh=mesh, in_specs=(hspec, hspec, hspec, P(), P()),
                    out_specs=hspec, axis_names={"tp"}, check_vma=False)
                return fn(q, k, v, kv_lengths, segment_ids)
            fn = jax.shard_map(
                lambda q_, k_, v_, l_: inner(q_, k_, v_, kv_lengths=l_),
                mesh=mesh, in_specs=(hspec, hspec, hspec, P()),
                out_specs=hspec, axis_names={"tp"}, check_vma=False)
            return fn(q, k, v, kv_lengths)
    has_segments = segment_ids is not None
    if has_segments:
        assert Sq == Sk, "segment_ids require self-attention shapes"

    block_q = min(block_q, Sq)
    block_k = min(block_k, Sk)
    # pad Sq to a multiple of block_q (kernel masks nothing on q side; extra
    # rows read garbage but are sliced off)
    pad_q = (-Sq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    pad_k = (-Sk) % block_k
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    Sq_p, Sk_p = Sq + pad_q, Sk + pad_k

    if has_segments:
        qseg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pad_q)),
                       constant_values=-1)
        kseg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pad_k)),
                       constant_values=-2)
    else:  # dummy 1-wide arrays keep the argument list static
        qseg = jnp.zeros((B, Sq_p), jnp.int32)
        kseg = jnp.zeros((B, Sk_p), jnp.int32)

    qt = q.transpose(0, 2, 1, 3)  # [B, nh, Sq, hd]
    kt = k.transpose(0, 2, 1, 3)  # [B, kh, Sk, hd]
    vt = v.transpose(0, 2, 1, 3)

    out = _flash_core(qt, kt, vt, kv_lengths_per_program(kv_lengths),
                      qseg, kseg, causal, q_offset, block_q, block_k, g,
                      has_segments, interpret)
    out = out.transpose(0, 2, 1, 3)
    return out[:, :Sq]


def kv_lengths_per_program(kv_lengths: jax.Array) -> jax.Array:
    return kv_lengths.astype(jnp.int32)
