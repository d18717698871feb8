"""Decisive int8-streaming diagnosis: separate per-LAUNCH overhead from
per-grid-step overhead on the axon backend.

  onelaunch : grid (L, N/bn, K/bk) in a single pallas_call — all layers
  scan28    : int8_matmul_stacked per layer inside lax.scan (28 launches)
  xla       : scan xs-slice + fused convert+dot (the current decoder path)

All single jit dispatch, dispatch floor subtracted.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_r2_tpu.ops.int8_matmul import int8_matmul_stacked


def timed(fn, n=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def _kernel_all(x_ref, wq_ref, scale_ref, o_ref, acc_ref, *, n_k: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = wq_ref[0].astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[0] = (acc_ref[...] * scale_ref[0].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "block_n"))
def all_layers_matmul(x, wq, scale, block_k=512, block_n=512):
    M, K = x.shape
    L, _, N = wq.shape
    n_k = K // block_k
    out = pl.pallas_call(
        functools.partial(_kernel_all, n_k=n_k),
        grid=(L, N // block_n, n_k),
        in_specs=[
            pl.BlockSpec((M, block_k), lambda l, n, k: (0, k)),
            pl.BlockSpec((1, block_k, block_n), lambda l, n, k: (l, k, n)),
            pl.BlockSpec((1, 1, block_n), lambda l, n, k: (l, 0, n)),
        ],
        out_specs=pl.BlockSpec((1, M, block_n), lambda l, n, k: (l, 0, n)),
        out_shape=jax.ShapeDtypeStruct((L, M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
    )(x, wq, scale.reshape(L, 1, N))
    return out


def main():
    @jax.jit
    def nop(x):
        return x.sum()
    z = jnp.zeros((8, 8), jnp.float32)
    floor = timed(lambda: float(nop(z)), n=5)
    print(f"dispatch floor: {floor*1e3:.1f} ms", flush=True)

    M, K, N, L = 64, 3584, 18944, 28
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 127, (L, K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (L, N)), jnp.float32)
    bytes_w = L * K * N
    print(f"shape [{M},{K}]x[{K},{N}] x{L}: {bytes_w/1e9:.2f}GB, "
          f"roofline {bytes_w/819e9*1e3:.2f}ms", flush=True)

    @jax.jit
    def onelaunch(x0, wq, scale):
        return all_layers_matmul(x0, wq, scale).astype(jnp.float32).sum()

    @jax.jit
    def scan28(x0, wq, scale):
        def step(acc, l):
            y = int8_matmul_stacked(x0, wq, scale, l, block_k=512, block_n=512)
            return acc + y.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(L))
        return acc

    @jax.jit
    def xla(x0, wq, scale):
        def step(acc, wl):
            w, s = wl
            y = jnp.einsum("mk,kn->mn", x0, w.astype(x0.dtype)) * s.astype(x0.dtype)
            return acc + y.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), (wq, scale))
        return acc

    for name, fn in [("onelaunch", onelaunch), ("scan28", scan28),
                     ("xla", xla)]:
        t_total = timed(lambda: float(fn(x0, wq, scale)))
        t = max(t_total - floor, 1e-9)
        print(f"   {name:12s} {t*1e3:8.2f} ms (+floor)  "
              f"{bytes_w/t/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
