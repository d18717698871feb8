"""Batch-decode attention kernel over the stacked contiguous KV cache.

TPU-native replacement for the decode half of FlashAttention-2 as the
reference's HF `generate` uses it (eval qwen2_5_vl.py:326-336 /
grpo_trainer.py:779-786 run decode through SDPA/FA2 on a contiguous cache).

Motivation (measured, see CLAUDE.md decode history): the XLA decode path
reads the per-layer KV slice out of the stacked [L, B, S, kh, hd] cache with
`dynamic_index_in_dim`, and the slice materializes before the attention
einsum — at B=128/S=384 that is ~100 MB of extra HBM write+read per layer.
This kernel instead keeps the WHOLE stacked cache in HBM (`pl.ANY`) and
DMAs exactly the key/value blocks it needs, double-buffered, with the layer
index scalar-prefetched — the same structure as
ops/paged_attention.py::_paged_decode_kernel_stacked but for the contiguous
batch cache (pages are implicit: block i covers rows [i*bs, (i+1)*bs)).

Cache layout is head-major [L, B, kh, Smax, hd] so one (layer, batch, head)
slice is a contiguous [Smax, hd] run — DMA-friendly (hd*bs*2B = 32 KB
contiguous per block), unlike the seq-major layout whose per-head rows
stride by kh*hd.

Masking covers the batch-generate layout (engine/generate.py): prompt keys
occupy rows [0, len_b) (right-padded prompts, true length per sample) and
decode slots occupy rows [s_pad, slot_end] uniformly across the batch
(fixed-slot decode writes). slot_end < s_pad disables the decode window
(pure prefix mask — the continuous-engine case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BLOCK_S = 128


def _decode_kernel(lengths_ref, meta_ref, q_ref, k_ref, v_ref, o_ref,
                   k_scratch, v_scratch, sem, *, block_s: int, scale: float,
                   max_blocks: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    L = lengths_ref[b]
    s_pad = meta_ref[0]
    slot_end = meta_ref[1]          # inclusive; < s_pad disables the window
    lyr = meta_ref[2]
    kv_limit = jnp.maximum(L, slot_end + 1)
    n_blocks = jnp.minimum(pl.cdiv(kv_limit, block_s), max_blocks)

    q = q_ref[0, 0].astype(jnp.float32) * scale          # [g, hd]
    g, hd = q.shape

    def dma(slot, blk):
        start = blk * block_s
        return (
            pltpu.make_async_copy(k_ref.at[lyr, b, h, pl.ds(start, block_s)],
                                  k_scratch.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(v_ref.at[lyr, b, h, pl.ds(start, block_s)],
                                  v_scratch.at[slot], sem.at[slot, 1]),
        )

    for c in dma(0, 0):
        c.start()

    def body(p, carry):
        acc, m_i, l_i = carry
        slot = p % 2
        nxt = (p + 1) % 2

        @pl.when(p + 1 < n_blocks)
        def _():
            for c in dma(nxt, p + 1):
                c.start()

        for c in dma(slot, p):
            c.wait()

        k = k_scratch[slot].astype(jnp.float32)          # [bs, hd]
        v = v_scratch[slot].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [g, bs]
        kpos = p * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (g, block_s), 1)
        valid = (kpos < L) | ((kpos >= s_pad) & (kpos <= slot_end))
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        pexp = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(pexp, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            pexp, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((g, hd), jnp.float32)
    m_i = jnp.full((g, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((g, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, n_blocks, body, (acc, m_i, l_i))
    o_ref[0, 0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("s_pad_static", "block_s", "interpret"))
def decode_attention_stacked(
    q: jax.Array,            # [B, nh, hd] single decode step
    k_cache: jax.Array,      # [L, B, kh, Smax, hd] head-major stacked cache
    v_cache: jax.Array,
    lengths: jax.Array,      # [B] int32: prompt keys [0, len_b) valid
    slot_end: jax.Array | int,  # scalar: decode slots [s_pad, slot_end] valid
    layer: jax.Array | int,  # scalar int32 — layer to read
    s_pad_static: int,       # static: start of the decode-slot window
    block_s: int = BLOCK_S,
    interpret: bool = False,
) -> jax.Array:
    """Online-softmax GQA decode attention reading the stacked cache in
    place. Smax must be a multiple of block_s (callers pad the cache)."""
    B, nh, hd = q.shape
    L_, B_, kh, smax, hd_ = k_cache.shape
    assert smax % block_s == 0, (smax, block_s)
    g = nh // kh
    qg = q.reshape(B, kh, g, hd)
    meta = jnp.stack([jnp.asarray(s_pad_static, jnp.int32),
                      jnp.asarray(slot_end, jnp.int32),
                      jnp.asarray(layer, jnp.int32)])

    kernel = functools.partial(
        _decode_kernel, block_s=block_s, scale=hd ** -0.5,
        max_blocks=smax // block_s)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, kh),
            in_specs=[
                pl.BlockSpec((1, 1, g, hd), lambda b, h, L, M: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),   # k stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, g, hd), lambda b, h, L, M: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, block_s, hd), k_cache.dtype),
                pltpu.VMEM((2, block_s, hd), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, kh, g, hd), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), meta, qg, k_cache, v_cache)
    return out.reshape(B, nh, hd)
