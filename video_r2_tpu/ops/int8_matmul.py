"""Pallas int8 weight-only matmul: dequantize per-tile in VMEM.

Decode at int8 through plain XLA materializes a bf16 copy of each weight
(read int8 + write bf16 + read bf16 ≈ 3x the bytes); this kernel streams the
int8 tiles straight into VMEM, dequantizes there, and feeds the MXU — HBM
traffic equals the int8 weight bytes, which is the decode roofline.

Used by layers.linear for quantized leaves when the activation row count is
small (decode/logprob shapes); large-M prefill shapes stay on XLA where the
weight read amortizes anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, scale_ref, o_ref, acc_ref, *, n_k: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                  # [M, bk]
    w = wq_ref[...].astype(x.dtype)                 # [bk, bn] int8 -> bf16
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _():
        scale = scale_ref[...].astype(jnp.float32)  # [1, bn]
        o_ref[...] = (acc_ref[...] * scale).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def int8_matmul(
    x: jax.Array,        # [M, K] activations (bf16/f32)
    wq: jax.Array,       # [K, N] int8
    scale: jax.Array,    # [N] f32 per-output-channel
    block_k: int = 512,
    block_n: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    _, N = wq.shape
    block_k = min(block_k, K)
    block_n = min(block_n, N)
    pad_k = (-K) % block_k
    pad_n = (-N) % block_n
    if pad_k:
        x = jnp.pad(x, ((0, 0), (0, pad_k)))
        wq = jnp.pad(wq, ((0, pad_k), (0, 0)))
    if pad_n:
        wq = jnp.pad(wq, ((0, 0), (0, pad_n)))
        scale = jnp.pad(scale, (0, pad_n))
    Kp, Np = K + pad_k, N + pad_n
    n_k = Kp // block_k

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(Np // block_n, n_k),
        in_specs=[
            pl.BlockSpec((M, block_k), lambda n, k: (0, k)),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n)),
            pl.BlockSpec((1, block_n), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((M, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
        interpret=interpret,
    )(x, wq, scale.reshape(1, -1))
    return out[:, :N]


def _stacked_kernel(l_ref, x_ref, wq_ref, scale_ref, o_ref, acc_ref,
                    *, n_k: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                  # [M, bk]
    w = wq_ref[0].astype(x.dtype)                   # [bk, bn] int8 -> bf16
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _():
        scale = scale_ref[0].astype(jnp.float32)    # [1, bn]
        o_ref[...] = (acc_ref[...] * scale).astype(o_ref.dtype)


def _pick_block(dim: int, prefer: tuple[int, ...]) -> int:
    for b in prefer:
        if dim % b == 0:
            return b
    return dim


@functools.partial(jax.jit,
                   static_argnames=("block_k", "block_n", "interpret"))
def int8_matmul_stacked(
    x: jax.Array,        # [M, K] activations (bf16/f32)
    wq: jax.Array,       # [L, K, N] int8 stacked per-layer weights
    scale: jax.Array,    # [L, N] f32 per-output-channel
    layer: jax.Array,    # scalar int32 layer index
    block_k: int | None = None,
    block_n: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """One layer's dequant-fused matmul out of a stacked weight array.

    The layer index rides scalar prefetch, so the kernel DMA-streams tiles of
    wq[layer] straight out of the full [L, K, N] HBM buffer — no dynamic-slice
    materialization (which is what made per-layer Pallas calls inside the
    decode scan 2x slower than XLA: each sliced [K, N] operand was copied,
    tripling HBM bytes). HBM traffic here equals the int8 weight bytes — the
    decode roofline (N2/N10 parity; SURVEY §2.4)."""
    M, K = x.shape
    L, Kw, N = wq.shape
    assert Kw == K, (Kw, K)
    if block_k is None:
        block_k = _pick_block(K, (2048, 1024, 512, 256, 128))
    if block_n is None:
        block_n = _pick_block(N, (1024, 512, 256, 128))
    assert K % block_k == 0 and N % block_n == 0, (K, N, block_k, block_n)
    n_k = K // block_k

    out = pl.pallas_call(
        functools.partial(_stacked_kernel, n_k=n_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // block_n, n_k),
            in_specs=[
                pl.BlockSpec((M, block_k), lambda n, k, l: (0, k)),
                pl.BlockSpec((1, block_k, block_n),
                             lambda n, k, l: (l[0], k, n)),
                pl.BlockSpec((1, 1, block_n), lambda n, k, l: (l[0], 0, n)),
            ],
            out_specs=pl.BlockSpec((M, block_n), lambda n, k, l: (0, n)),
            scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, wq,
      scale.reshape(L, 1, N))
    return out


# Dispatch threshold for routing through the per-call kernel. Default 0 =
# disabled: measured on v5e at decode shapes (M=32, 7B), the dynamic-slice of
# each layer's stacked weights materialized a copy before every pallas_call
# (3x int8 bytes), making the kernel path 2x SLOWER than XLA's fused
# convert+dot (914 -> 448 tok/s). The decode scan instead uses
# int8_matmul_stacked above, which indexes the stack inside the kernel.
INT8_KERNEL_MAX_ROWS = 0


def quantized_linear_auto(x: jax.Array, wq: jax.Array, scale: jax.Array):
    """Dispatch: flatten leading dims, kernel for small-M, XLA otherwise."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    use_kernel = (
        0 < M <= INT8_KERNEL_MAX_ROWS
        and jax.default_backend() == "tpu"
        and wq.ndim == 2
    )
    if use_kernel:
        y = int8_matmul(x2, wq, scale)
    else:
        y = jnp.einsum("mk,kn->mn", x2, wq.astype(x.dtype)) * scale.astype(x.dtype)
    return y.reshape(*lead, wq.shape[-1])
