"""Int4 weight-only matmul: packed-nibble dequant fused into the MXU feed.

Weight-only int4 halves decode's dominant HBM traffic vs int8 (the decode
roofline is the weight read: SURVEY §2.4 N10 — the reference's optional
bitsandbytes 4-bit path — and §6's tokens/sec target).

Packing ("half-split", chosen so the kernel never interleaves lanes):
a [K, N] kernel packs to int8 [K/2, N] where packed row p holds
    low  nibble = q[p]          (original rows 0 .. K/2-1)
    high nibble = q[p + K/2]    (original rows K/2 .. K-1)
each nibble storing q + 8 with q in [-7, 7] (symmetric, per-group scales
along K, group_size g). Dequant therefore needs only two CONTIGUOUS halves
of x — no stride-2 shuffles in VMEM — and the per-half scale rows are the
two contiguous halves of the [K/g, N] scale array.

The stacked variant indexes a [L, Kp, N] buffer with a scalar-prefetched
layer id, streaming tiles straight from HBM inside the decode layer scan
(same structure as ops.int8_matmul.int8_matmul_stacked).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4_halves(q: jax.Array) -> jax.Array:
    """[.., K, N] int (values in [-7,7]) -> [.., K/2, N] int8 packed."""
    K = q.shape[-2]
    assert K % 2 == 0, K
    u = (q + 8).astype(jnp.uint8)
    lo = u[..., : K // 2, :]
    hi = u[..., K // 2:, :]
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4_halves(packed: jax.Array) -> jax.Array:
    """[.., K/2, N] int8 -> [.., K, N] int8 values in [-7,7]."""
    lo = (packed & 15) - 8
    hi = ((packed >> 4) & 15) - 8
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def dequant_int4(packed: jax.Array, scale: jax.Array, group_size: int,
                 dtype=jnp.bfloat16) -> jax.Array:
    """XLA dequant: [.., K/2, N] packed + [.., K/g, N] scales -> [.., K, N]."""
    w = unpack_int4_halves(packed).astype(jnp.float32)
    K, N = w.shape[-2], w.shape[-1]
    lead = w.shape[:-2]
    wg = w.reshape(*lead, K // group_size, group_size, N)
    wg = wg * scale[..., :, None, :].astype(jnp.float32)
    return wg.reshape(*lead, K, N).astype(dtype)


def _expand_groups(s, g):
    """[Gb, bn] group scales -> [Gb*g, bn] row scales (broadcast+reshape)."""
    Gb, bn = s.shape
    return jnp.broadcast_to(s[:, None, :], (Gb, g, bn)).reshape(Gb * g, bn)


def _stacked_kernel4(l_ref, xlo_ref, xhi_ref, wq_ref, slo_ref, shi_ref,
                     o_ref, acc_ref, *, n_k: int, group_size: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b = wq_ref[0].astype(jnp.int32)                 # [bkp, bn] packed nibbles
    xlo = xlo_ref[...]                              # [M, bkp]
    xhi = xhi_ref[...]
    s_lo = _expand_groups(slo_ref[0, :, 0, :].astype(jnp.float32), group_size)
    s_hi = _expand_groups(shi_ref[0, :, 0, :].astype(jnp.float32), group_size)
    lo = ((b & 15) - 8).astype(jnp.float32) * s_lo  # [bkp, bn]
    hi = (((b >> 4) & 15) - 8).astype(jnp.float32) * s_hi
    acc_ref[...] += jax.lax.dot_general(
        xlo, lo.astype(xlo.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        xhi, hi.astype(xhi.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pick_block(dim: int, mult: int, prefer: tuple[int, ...]) -> int:
    for b in prefer:
        if b % mult == 0 and dim % b == 0:
            return b
    return dim


@functools.partial(jax.jit,
                   static_argnames=("group_size", "block_kp", "block_n",
                                    "interpret"))
def int4_matmul_stacked(
    x: jax.Array,        # [M, K] activations (bf16/f32)
    wq: jax.Array,       # [L, K/2, N] int8 half-split packed
    scale: jax.Array,    # [L, K/g, N] per-group scales
    layer: jax.Array,    # scalar int32 layer index
    group_size: int = 128,
    block_kp: int | None = None,
    block_n: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    L, Kp, N = wq.shape
    assert Kp * 2 == K, (Kp, K)
    g = group_size
    assert Kp % g == 0, (Kp, g)
    if block_kp is None:
        # tile VMEM budget: (bkp*bn int8 + 2*M*bkp bf16 + M*bn f32) double-
        # buffered must stay within ~12MB; 1792 covers the 7B's K=3584
        # projections whole, 256 tiles the K=18944 down-projection
        block_kp = _pick_block(Kp, g, (1792, 1024, 512, 256, 128))
    if block_n is None:
        block_n = _pick_block(N, 1, (1024, 512, 256, 128))
    assert Kp % block_kp == 0 and N % block_n == 0 and block_kp % g == 0
    n_k = Kp // block_kp
    gb = block_kp // g  # scale rows per block

    x_lo = x[:, :Kp]
    x_hi = x[:, Kp:]
    # 4D so the tiling-constrained last two dims are (1, N); the group axis
    # rides a leading block dim (any size allowed there)
    scale4d = scale.reshape(L, (2 * Kp) // g, 1, N)

    out = pl.pallas_call(
        functools.partial(_stacked_kernel4, n_k=n_k, group_size=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // block_n, n_k),
            in_specs=[
                pl.BlockSpec((M, block_kp), lambda n, k, l: (0, k)),
                pl.BlockSpec((M, block_kp), lambda n, k, l: (0, k)),
                pl.BlockSpec((1, block_kp, block_n),
                             lambda n, k, l: (l[0], k, n)),
                # low-half groups: rows [0, Kp/g); high-half offset by Kp/g
                # (= n_k blocks of gb group-rows)
                pl.BlockSpec((1, gb, 1, block_n),
                             lambda n, k, l: (l[0], k, 0, n)),
                pl.BlockSpec((1, gb, 1, block_n),
                             lambda n, k, l, _nk=n_k: (l[0], _nk + k, 0, n)),
            ],
            out_specs=pl.BlockSpec((M, block_n), lambda n, k, l: (0, n)),
            scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x_lo, x_hi, wq, scale4d,
      scale4d)
    return out
