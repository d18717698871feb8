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


def _flash_kernel(lengths_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref,
                  *, block_q: int, block_k: int, causal: bool,
                  q_offset: int, seq_k: int, scale: float, has_segments: bool):
    """One (batch, head, q_block) program.

    q_ref: [block_q, hd]; k_ref/v_ref: [seq_k, hd] (full kv row in VMEM);
    o_ref: [block_q, hd]. lengths_ref: [1] SMEM (valid kv length for batch).
    qseg/kseg: optional [block_q]/[seq_k] int32 segment ids — attention is
    allowed only within equal segments (packed sequences, gap masks).
    """
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
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kv, body, (acc, m_i, l_i))
    # rows with no valid kv (fully masked) produce l=0 -> emit 0
    out = acc / jnp.maximum(l_i, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret", "q_offset"))
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
) -> jax.Array:
    assert bias is None, "flash path takes kv_lengths/causal, not a bias"
    B, Sq, nh, hd = q.shape
    _, Sk, kh, _ = k.shape
    g = nh // kh
    if kv_lengths is None:
        kv_lengths = jnp.full((B,), Sk, jnp.int32)
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

    grid = (B, nh, Sq_p // block_q)
    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, seq_k=Sk_p, scale=hd ** -0.5,
        has_segments=has_segments)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, hd),
                             lambda b, h, i, L: (b, h, i, 0)),
                pl.BlockSpec((1, 1, Sk_p, hd),
                             lambda b, h, i, L: (b, h // g if g > 1 else h, 0, 0)),
                pl.BlockSpec((1, 1, Sk_p, hd),
                             lambda b, h, i, L: (b, h // g if g > 1 else h, 0, 0)),
                # full-array blocks: Mosaic requires the last two block dims
                # to be (8-, 128-divisible) or equal to the array dims
                pl.BlockSpec((B, Sq_p), lambda b, h, i, L: (0, 0)),
                pl.BlockSpec((B, Sk_p), lambda b, h, i, L: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, hd),
                                   lambda b, h, i, L: (b, h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, nh, Sq_p, hd), q.dtype),
        interpret=interpret,
    )(kv_lengths_per_program(kv_lengths), qt, kt, vt, qseg, kseg)
    out = out.transpose(0, 2, 1, 3)
    return out[:, :Sq]


def kv_lengths_per_program(kv_lengths: jax.Array) -> jax.Array:
    return kv_lengths.astype(jnp.int32)
