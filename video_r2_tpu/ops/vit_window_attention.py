"""Fused ViT window attention (Pallas TPU).

The ViT's windowed layers attend within fixed 64-slot windows
(models/vision.py physically padded layout). The XLA formulation
(`_window_attention`) lowers to ~15k tiny batched matmuls per layer
(nw x nh of [64,hd]@[hd,64]) plus HBM round-trips for the fp32 scores —
measured ~18 ms/layer at the 128-frame eval shape, ~180x the FLOP cost
(scripts/profile_vit_layer.py).

This kernel processes one SLAB of `block_windows` consecutive windows per
grid program, all heads per program, in HEAD-MAJOR layout ([nh, S, hd] —
the caller's XLA transpose fuses into the rotary epilogue; an in-kernel
transpose would be a Mosaic relayout on every block, measured to eat the
entire win). Scores are one [nh, BQ, hd] x [nh, BQ, hd] -> [nh, BQ, BQ]
batched MXU matmul with a static block-diagonal window mask from iota;
they never touch HBM. Operands stay bf16 into the MXU (f32 accumulate),
probabilities are cast back to the operand dtype for the AV matmul exactly
like the XLA path.

Reference role: the ViT window attention the reference gets from
FlashAttention-2 varlen with cu_seqlens (modeling_qwen2_5_vl.py windowed
layers) — here the windows are physical, so the mask is static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _win_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *, wp: int,
                scale: float, head_chunk: int):
    q = q_ref[...]                              # [nh, BQ, hd]
    k = k_ref[...]
    v = v_ref[...]
    nh, bq = q.shape[0], q.shape[1]
    vmask = valid_ref[0, :] > 0.5               # [BQ]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0) // wp
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1) // wp
    allowed = (rows == cols) & vmask[None, :]

    # heads processed in chunks so the f32 score block stays VMEM-sized
    # even for large slabs (s is [hc, BQ, BQ] f32)
    outs = []
    for h0 in range(0, nh, head_chunk):
        qh = q[h0:h0 + head_chunk]
        kh = k[h0:h0 + head_chunk]
        vh = v[h0:h0 + head_chunk]
        # [hc, BQ, BQ] — contract hd, batch over heads (bf16 MXU, f32 acc)
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(allowed[None], s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # [hc, BQ, hd] — contract keys; probs in operand dtype (XLA parity)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        outs.append(o / jnp.maximum(l, 1e-30))
    o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    o_ref[...] = o.astype(o_ref.dtype)


def _win_fwd_call(qt, kt, vt, vmask, wp, block_windows, head_chunk, interpret):
    nh, S, hd = qt.shape
    bq = wp * block_windows
    kernel = functools.partial(_win_kernel, wp=wp, scale=hd ** -0.5,
                               head_chunk=min(head_chunk, nh))
    return pl.pallas_call(
        kernel,
        grid=(S // bq,),
        in_specs=[
            pl.BlockSpec((nh, bq, hd), lambda i: (0, i, 0)),
            pl.BlockSpec((nh, bq, hd), lambda i: (0, i, 0)),
            pl.BlockSpec((nh, bq, hd), lambda i: (0, i, 0)),
            pl.BlockSpec((1, bq), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((nh, bq, hd), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((nh, S, hd), qt.dtype),
        interpret=interpret,
    )(qt, kt, vt, vmask)


def _win_bwd_kernel(q_ref, k_ref, v_ref, valid_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, *, wp: int, scale: float):
    """Recompute-backward for one (slab, head-chunk) program: scores are
    cheap (64-wide windows), so no forward stats are saved — s/p rebuild
    in-VMEM and the three gradients come out of five batched MXU matmuls
    (flash-style softmax backward: ds = P * (dP - rowsum(do*o))). Heads
    split across the GRID, not an in-kernel loop: Mosaic double-buffers
    every block across grid steps, so all-heads blocks (5 in + 3 out)
    overflow VMEM at production head counts."""
    qh = q_ref[...]                                # [hc, BQ, hd]
    kh = k_ref[...]
    vh = v_ref[...]
    doh = do_ref[...].astype(jnp.float32)
    bq = qh.shape[1]
    vmask = valid_ref[0, :] > 0.5
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0) // wp
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1) // wp
    allowed = (rows == cols) & vmask[None, :]

    s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(allowed[None], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    P = p / jnp.maximum(l, 1e-30)               # [hc, Q, K] normalized
    # dv[K, hd] = sum_Q P[Q, K] * do[Q, hd]
    dv = jax.lax.dot_general(P, doh, (((1,), (1,)), ((0,), (0,))))
    # dP[Q, K] = do @ v^T
    dP = jax.lax.dot_general(doh, vh.astype(jnp.float32),
                             (((2,), (2,)), ((0,), (0,))))
    # o recomputed for the softmax-backward row term D = rowsum(do*o)
    o = jax.lax.dot_general(P, vh.astype(jnp.float32),
                            (((2,), (1,)), ((0,), (0,))))
    D = jnp.sum(doh * o, axis=-1, keepdims=True)
    ds = P * (dP - D)
    dq = jax.lax.dot_general(ds, kh.astype(jnp.float32),
                             (((2,), (1,)), ((0,), (0,)))) * scale
    dk = jax.lax.dot_general(ds, qh.astype(jnp.float32),
                             (((1,), (1,)), ((0,), (0,)))) * scale
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _win_bwd_call(qt, kt, vt, vmask, do, wp, block_windows, head_chunk,
                  interpret):
    nh, S, hd = qt.shape
    bq = wp * block_windows
    # small head chunk (~6 f32 score-sized temporaries live per program);
    # the caller's head_chunk acts as an upper bound here too
    hc = next(h for h in (4, 2, 1) if nh % h == 0 and h <= max(head_chunk, 1))
    kernel = functools.partial(_win_bwd_kernel, wp=wp, scale=hd ** -0.5)
    blk = pl.BlockSpec((hc, bq, hd), lambda i, h: (h, i, 0))
    return pl.pallas_call(
        kernel,
        grid=(S // bq, nh // hc),
        in_specs=[blk, blk, blk,
                  pl.BlockSpec((1, bq), lambda i, h: (0, i)), blk],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((nh, S, hd), qt.dtype)] * 3,
        interpret=interpret,
    )(qt, kt, vt, vmask, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _window_attention_hm(qt, kt, vt, vmask, wp, block_windows, head_chunk,
                         interpret):
    """Head-major [nh, S, hd] window attention with a flash-style
    recompute VJP — unlocks attn_impl="kernel" in the differentiated SFT
    path (the reference trains the ViT through FlashAttention-2's backward,
    train_sft.sh:56 vision_lr)."""
    return _win_fwd_call(qt, kt, vt, vmask, wp, block_windows, head_chunk,
                         interpret)


def _window_attention_hm_fwd(qt, kt, vt, vmask, wp, block_windows, head_chunk,
                             interpret):
    out = _win_fwd_call(qt, kt, vt, vmask, wp, block_windows, head_chunk,
                        interpret)
    return out, (qt, kt, vt, vmask)


def _window_attention_hm_bwd(wp, block_windows, head_chunk, interpret,
                             res, do):
    qt, kt, vt, vmask = res
    dq, dk, dv = _win_bwd_call(qt, kt, vt, vmask, do, wp, block_windows,
                               head_chunk, interpret)
    return dq, dk, dv, jnp.zeros_like(vmask)


_window_attention_hm.defvjp(_window_attention_hm_fwd, _window_attention_hm_bwd)


@functools.partial(jax.jit,
                   static_argnames=("wp", "block_windows", "head_chunk",
                                    "interpret", "mesh"))
def window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     valid: jax.Array, wp: int = 64, block_windows: int = 4,
                     head_chunk: int = 8, interpret: bool = False,
                     mesh=None) -> jax.Array:
    """q/k/v [S, nh, hd] grouped in `wp`-slot windows; valid [S] bool.

    S must be a multiple of wp * block_windows (plan_vision_layout pads the
    layout to 4-window slabs). Fully-invalid windows emit garbage rows that
    no downstream gather reads. Differentiable (custom recompute VJP).

    mesh: TP-sharded towers (meshed eval) — windows are per-head
    independent, so each "tp" shard runs the unchanged kernel over its own
    heads (partial-manual shard_map, valid mask replicated)."""
    S, nh, hd = q.shape
    if mesh is not None:
        tp = dict(mesh.shape).get("tp", 1)
        if tp > 1:
            assert nh % tp == 0, (nh, tp)
            import functools as _ft

            from jax.sharding import PartitionSpec as P

            hspec = P(None, "tp", None)
            inner = _ft.partial(window_attention, wp=wp,
                                block_windows=block_windows,
                                head_chunk=min(head_chunk, nh // tp),
                                interpret=interpret)
            fn = jax.shard_map(inner, mesh=mesh,
                               in_specs=(hspec, hspec, hspec, P()),
                               out_specs=hspec, axis_names={"tp"},
                               check_vma=False)
            return fn(q, k, v, valid)
    bq = wp * block_windows
    if S % bq:
        raise ValueError(f"S={S} not a multiple of slab {bq}")
    vmask = valid.astype(jnp.float32).reshape(1, S)
    qt = q.transpose(1, 0, 2)                   # [nh, S, hd]
    kt = k.transpose(1, 0, 2)
    vt = v.transpose(1, 0, 2)
    out = _window_attention_hm(qt, kt, vt, vmask, wp, block_windows,
                               head_chunk, interpret)
    return out.transpose(1, 0, 2)
