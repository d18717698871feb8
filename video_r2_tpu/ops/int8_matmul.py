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


# Dispatch threshold for routing through the kernel. Default 0 = disabled:
# measured on v5e at decode shapes (M=32, 7B), per-call Mosaic entry overhead
# across ~200 launches/step made the kernel path 2x SLOWER than XLA's fused
# convert+dot (914 -> 448 tok/s). Re-enable after batching launches (one call
# per layer covering qkv+o+mlp) or via a megakernel.
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
