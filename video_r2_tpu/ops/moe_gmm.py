"""Sorted grouped-matmul (megablox-style) MoE prefill: exact AND cheap.

The grouped-einsum dispatch (models/moe.py) is exact only at
capacity_factor=0, where its [G, E, C] slot tensor has C = group*k — every
expert gets a full-group's worth of slots whether tokens routed there or
not. At the judge shape (qwen3_moe_30b_a3b: E=128, top-8) that is ~E x the
necessary FLOPs and a multi-GB expert_in for a 1k-token prefill: exactness
was priced as if every expert were dense. Raising the factor shrinks C but
DROPS tokens (measured 15-64% of router weight at skewed prefill shapes,
profile_moe_capacity.py) — not a safe judging tradeoff.

This module is the third way, the one vLLM/megablox take: sort the T*k
routing slots by expert id, pad each expert's run of rows up to a multiple
of `block_rows`, and run ONE Pallas grouped FFN over the sorted rows with
a scalar-prefetched block->expert map — the same kernel as the ragged
decode path (ops/moe_ragged.ragged_expert_ffn: its "active slot" axis
becomes the row-block axis, its id table the block->expert map; Mosaic
re-DMAs expert weights only when the id changes between consecutive
blocks, which the sort makes rare). Compute is T*k rows + at most
E*(block_rows-1) padding rows — 1.1-1.5x the routed work at prefill sizes
instead of the einsum's E x — and NOTHING drops.

Everything around the kernel is static-shape XLA: stable argsort by
expert, bincount/cumsum row offsets, one scatter into the sorted layout,
one gather + segment-add back to token order. The FLOAT-weight path is
differentiable (gmm_expert_ffn_diff: recompute custom VJP, two grouped
backward kernels), so exact MoE training escapes the E x einsum too;
int8-weight and W8A8 variants are inference-only (no VJP — the trainers
force the einsum for safety, and the reference never trains its judge,
train/serve_llm/serve_qwen3.sh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .moe_ragged import expert_leaf_specs, quantize_rows, ragged_expert_ffn


def sorted_expert_layout(topi: jax.Array, E: int, block_rows: int
                         ) -> tuple[jax.Array, jax.Array, jax.Array, int]:
    """Routing table [T, k] -> (dst [Tk], blk_expert [n_blocks],
    blk_valid [n_blocks], R_pad). Row dst[j] holds flat routing slot j,
    inside expert-contiguous, block-aligned runs. blk_expert[b] is the
    expert whose weights row-block b uses. blk_valid[b] == 0 marks blocks
    past the occupied region (the static bound's slack — the kernel skips
    their compute and writes zeros). Sentinel ids == E (the
    expert-parallel path's "not ours" marker) do NOT occupy rows: they
    all map to the reserved trash row R_pad - 1, whose (zeroed) output
    they gather back with a zero combine weight.

    R_pad is a STATIC bound: Tk + E * (block_rows - 1) + 1 trash row,
    rounded up to a block multiple; blk_valid trims the actual compute to
    the occupied blocks."""
    T, k = topi.shape
    Tk = T * k
    bm = block_rows
    f = topi.reshape(-1).astype(jnp.int32)
    is_real = f < E
    fc = jnp.minimum(f, E - 1)
    perm = jnp.argsort(f, stable=True)      # sentinels sort past real ids
    f_sorted = f[perm]
    counts = jnp.zeros((E,), jnp.int32).at[fc].add(is_real.astype(jnp.int32))
    starts = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                              jnp.cumsum(counts)[:-1]])
    padded = -(-counts // bm) * bm
    pstart = jnp.concatenate([jnp.zeros((1,), padded.dtype),
                              jnp.cumsum(padded)[:-1]])
    total = jnp.sum(padded)                  # occupied rows (traced)
    R_pad = -(-(Tk + E * (bm - 1) + 1) // bm) * bm
    rank = jnp.arange(Tk) - starts[jnp.minimum(f_sorted, E - 1)]
    dst_sorted = jnp.where(f_sorted < E,
                           pstart[jnp.minimum(f_sorted, E - 1)] + rank,
                           R_pad - 1)
    # invert: flat slot j -> its row
    dst = jnp.zeros((Tk,), jnp.int32).at[perm].set(dst_sorted.astype(jnp.int32))

    n_blocks = R_pad // bm
    pend = pstart + padded
    row0 = jnp.arange(n_blocks) * bm
    blk_expert = jnp.minimum(jnp.searchsorted(pend, row0, side="right"),
                             E - 1).astype(jnp.int32)
    blk_valid = (row0 < total).astype(jnp.int32)
    return dst, blk_expert, blk_valid, R_pad


def auto_block_rows(Tk: int, E: int) -> int:
    """Row-block size tradeoff: per-expert padding wastes up to
    E*(block_rows-1) rows of compute, while small blocks underuse the
    MXU's row pipeline. block ~= the average rows per expert keeps the
    padding ~30-50% (weight DMA is bm-independent: consecutive blocks of
    one expert share the index_map id, so Mosaic reads each active
    expert's weights once). Revisit against an on-chip sweep
    (scripts/profile_moe_gmm.py)."""
    avg = Tk // max(E, 1)
    bm = 8
    while bm < 128 and bm * 2 <= avg:
        bm *= 2
    return bm


def moe_mlp_gmm(p: dict, xt: jax.Array, k: int, norm_topk_prob: bool,
                block_rows: int | None = None,
                interpret: bool | None = None,
                act_quant: str | None = None) -> jax.Array:
    """Exact sparse MoE forward over sorted expert groups. xt [T, H] ->
    [T, H]. Routing semantics identical to models/moe.py:route; output
    equals the dense HF oracle (no capacity, no drops) at T*k + O(E*bm)
    row-compute. Expert leaves may be f32/bf16 {kernel} or int8
    {kernel_q, scale} (in-kernel dequant, as the ragged decode path)."""
    from ..models.moe import route

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, H = xt.shape
    E = p["router"]["kernel"].shape[-1]
    if block_rows is None:
        block_rows = auto_block_rows(T * k, E)
    topv, topi = route(p["router"]["kernel"], xt, k, norm_topk_prob)
    return _gmm_apply(xt, topv, topi, E, p["experts"]["gate"],
                      p["experts"]["up"], p["experts"]["down"],
                      block_rows, interpret, act_quant=act_quant)


def _gmm_apply(xt, topv, topi, E: int, gate, up, down, block_rows: int,
               interpret: bool, act_quant: str | None = None) -> jax.Array:
    """Sort/scatter -> grouped kernel -> gather/combine. topi may carry
    sentinel ids == E (masked non-local slots under expert parallelism):
    their rows compute against a clamped local expert and combine with the
    zeroed weight."""
    T, H = xt.shape
    k = topi.shape[-1]
    Tk = T * k
    bm = block_rows
    dst, blk_expert, blk_valid, R_pad = sorted_expert_layout(topi, E, bm)

    tok_of_flat = jnp.arange(Tk) // k
    x_sorted = jnp.zeros((R_pad, H), xt.dtype).at[dst].set(xt[tok_of_flat])
    xs = x_sorted.reshape(R_pad // bm, bm, H)
    if act_quant == "int8" and "kernel_q" in gate:
        xq, ax = quantize_rows(xs)
        y = ragged_expert_ffn(xq, blk_expert, gate, up, down,
                              interpret=interpret, blk_valid=blk_valid,
                              x_scales=ax)
    else:
        y = ragged_expert_ffn(xs, blk_expert, gate, up, down,
                              interpret=interpret, blk_valid=blk_valid)
    yflat = y.reshape(R_pad, H)
    w = topv.reshape(-1)
    contrib = yflat[dst] * w[:, None].astype(yflat.dtype)
    out = jnp.zeros((T, H), yflat.dtype).at[tok_of_flat].add(contrib)
    return out.astype(xt.dtype)


# --------------------------------------------------------------------------
# Differentiable float path: custom VJP with recompute (FA2-style — the
# residuals are just (xt, topv, topi); g/u/h are rebuilt per block in the
# backward kernels). Total ~4x forward FLOPs vs the exact einsum's E x.
# Float weights only; int8 expert training is unsupported (clear missing-
# VJP error from pallas if attempted).
# --------------------------------------------------------------------------

def _silu_terms(x, wg_blk, wu_blk, dy, wd_blk):
    """Shared recompute for the backward kernels: returns (h, dg, du) for
    one (row-block, i-tile). dot_general avoids materialized transposes
    (in-kernel transpose = a Mosaic relayout per block, CLAUDE.md)."""
    g = jnp.dot(x, wg_blk, preferred_element_type=jnp.float32)
    u = jnp.dot(x, wu_blk, preferred_element_type=jnp.float32)
    s = jax.nn.sigmoid(g)
    silu = g * s
    dsilu = s * (1.0 + g * (1.0 - s))
    # dh = dy @ wd^T: contract H (dy dim 1 with wd dim 1)
    dh = jax.lax.dot_general(dy, wd_blk, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dg = dh * u * dsilu
    du = dh * silu
    return (silu * u), dg, du


def _bwd_dx_kernel(ids_ref, valid_ref, x_ref, dy_ref, wg_ref, wu_ref,
                   wd_ref, o_ref, acc_ref, *, n_i: int):
    """dX for one row block: sum_i dg_i @ Wg_i^T + du_i @ Wu_i^T."""
    a = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(valid_ref[a] != 0)
    def _():
        x = x_ref[0].astype(jnp.float32)
        dy = dy_ref[0].astype(jnp.float32)
        _, dg, du = _silu_terms(x, wg_ref[0], wu_ref[0], dy, wd_ref[0])
        # dg [bm, bi] @ wg [H, bi]^T: contract bi (dim 1 with dim 1)
        acc_ref[...] += jax.lax.dot_general(
            dg, wg_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] += jax.lax.dot_general(
            du, wu_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _bwd_dw_kernel(ids_ref, valid_ref, x_ref, dy_ref, wg_ref, wu_ref,
                   wd_ref, dwg_ref, dwu_ref, accg_ref, accu_ref,
                   *, n_blocks: int):
    """dWg/dWu per expert. Grid (i, a) — a INNER, so the sorted
    layout's expert runs revisit each (e, i) output block consecutively:
    accumulate the run in VMEM scratch and flush on the run's last block
    (the standard k-loop revisiting pattern, applied along a). Experts
    with no blocks are never visited — their output blocks stay
    UNINITIALIZED and the caller masks them to zero (aliasing zero-filled
    inputs instead would donate one CSE'd zeros buffer to several
    outputs, an ill-defined must-alias on the compiled path). dWd lives
    in its own kernel (_bwd_dwd_kernel): one fused kernel's working set
    (5 double-buffered ins + 3 double-buffered outs + 3 f32 accumulators)
    exceeds the 16 MB VMEM at the f32 judge block shape (H=2048, bi=128)."""
    a = pl.program_id(1)
    e = ids_ref[a]
    prev_e = ids_ref[jnp.maximum(a - 1, 0)]
    nxt_e = ids_ref[jnp.minimum(a + 1, n_blocks - 1)]
    first = jnp.logical_or(a == 0, e != prev_e)
    last = jnp.logical_or(a == n_blocks - 1, e != nxt_e)

    @pl.when(first)
    def _():
        accg_ref[...] = jnp.zeros_like(accg_ref)
        accu_ref[...] = jnp.zeros_like(accu_ref)

    @pl.when(valid_ref[a] != 0)
    def _():
        x = x_ref[0].astype(jnp.float32)
        dy = dy_ref[0].astype(jnp.float32)
        _, dg, du = _silu_terms(x, wg_ref[0], wu_ref[0], dy, wd_ref[0])
        # x [bm, H]^T @ dg [bm, bi]: contract bm (dim 0 with dim 0)
        accg_ref[...] += jax.lax.dot_general(
            x, dg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        accu_ref[...] += jax.lax.dot_general(
            x, du, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(last)
    def _():
        dwg_ref[0] = accg_ref[...].astype(dwg_ref.dtype)
        dwu_ref[0] = accu_ref[...].astype(dwu_ref.dtype)


def _bwd_dwd_kernel(ids_ref, valid_ref, x_ref, dy_ref, wg_ref, wu_ref,
                    dwd_ref, accd_ref, *, n_blocks: int):
    """dWd per expert: h^T @ dY with h = silu(x@Wg) * (x@Wu) recomputed
    per (i, a) step. Same run-flush pattern as _bwd_dw_kernel; needs no
    Wd block, which is what lets the pair of kernels fit VMEM."""
    a = pl.program_id(1)
    e = ids_ref[a]
    prev_e = ids_ref[jnp.maximum(a - 1, 0)]
    nxt_e = ids_ref[jnp.minimum(a + 1, n_blocks - 1)]
    first = jnp.logical_or(a == 0, e != prev_e)
    last = jnp.logical_or(a == n_blocks - 1, e != nxt_e)

    @pl.when(first)
    def _():
        accd_ref[...] = jnp.zeros_like(accd_ref)

    @pl.when(valid_ref[a] != 0)
    def _():
        x = x_ref[0].astype(jnp.float32)
        dy = dy_ref[0].astype(jnp.float32)
        g = jnp.dot(x, wg_ref[0], preferred_element_type=jnp.float32)
        u = jnp.dot(x, wu_ref[0], preferred_element_type=jnp.float32)
        h = jax.nn.sigmoid(g) * g * u
        # h [bm, bi]^T @ dy [bm, H]: contract bm (dim 0 with dim 0)
        accd_ref[...] += jax.lax.dot_general(
            h, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(last)
    def _():
        dwd_ref[0] = accd_ref[...].astype(dwd_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gmm_expert_ffn_diff(xt, topv, topi, weights, block_rows: int,
                        interpret: bool):
    """Differentiable exact MoE FFN over sorted expert groups (float
    weights: weights = (wg [E,H,I], wu [E,H,I], wd [E,I,H])). Forward is
    _gmm_apply's math; backward recomputes per block. topi carries no
    gradient (top-k indices are piecewise constant); topv's cotangent
    chains into the router softmax through autodiff outside."""
    wg, wu, wd = weights
    return _gmm_apply(xt, topv, topi, wg.shape[0],
                      {"kernel": wg}, {"kernel": wu}, {"kernel": wd},
                      block_rows, interpret)


def _gmm_diff_fwd(xt, topv, topi, weights, block_rows, interpret):
    out = gmm_expert_ffn_diff(xt, topv, topi, weights, block_rows,
                              interpret)
    return out, (xt, topv, topi, weights)


def _bwd_tiles(block_rows: int, H: int, I: int, xbytes: int,
               wbytes: int) -> tuple[int, int]:
    """(bm, bi) for the backward kernels. Mosaic requires the LAST block
    dim be a multiple of 128 or equal to the full array dim (interpret
    mode never checks this — the r4 on-chip smoke caught a 64-wide tile
    here), so bi is the smallest lane-aligned divisor of I, or I itself
    for tiny shapes. bm then shrinks until the tightest kernel's VMEM
    estimate (the dWg/dWu kernel: 5 double-buffered in blocks, 2
    double-buffered outs, 2 f32 accumulators) fits under ~14 MB of the
    16 MB ceiling; bm is free here because the backward derives its own
    sorted layout from the residual (topi) rather than reusing the
    forward's."""
    bi = 128 if I % 128 == 0 else I

    # VMEM estimates per kernel (every in/out block double-buffered).
    # dY rows and ALL outputs/accumulators are f32 (out_shape f32) — pricing
    # them at wbytes under-estimated 2x for bf16 weights, and modeling only
    # the dWg/dWu kernel let a large explicit block_rows pass while the dX
    # kernel's f32 out + f32 [bm, H] scratch overflowed (advisor r4). The
    # shrink loop now takes the max over all three backward kernels.
    def dx_bytes(bm: int) -> int:
        ins = 2 * (bm * H * xbytes + bm * H * 4 + 3 * H * bi * wbytes)
        return ins + 2 * bm * H * 4 + bm * H * 4

    def dw_bytes(bm: int) -> int:
        ins = 2 * (bm * H * xbytes + bm * H * 4 + 3 * H * bi * wbytes)
        return ins + 2 * 2 * H * bi * 4 + 2 * H * bi * 4

    def dwd_bytes(bm: int) -> int:
        ins = 2 * (bm * H * xbytes + bm * H * 4 + 2 * H * bi * wbytes)
        return ins + 2 * bi * H * 4 + bi * H * 4

    def worst(bm: int) -> int:
        return max(dx_bytes(bm), dw_bytes(bm), dwd_bytes(bm))

    bm = block_rows
    while bm > 8 and worst(bm) > 14 * 2 ** 20:
        bm = max(8, (bm // 2) & ~7)
    return bm, bi


def _gmm_diff_bwd(block_rows, interpret, res, dy):
    xt, topv, topi, (wg, wu, wd) = res
    T, H = xt.shape
    k = topi.shape[-1]
    Tk = T * k
    E, _, I = wg.shape
    bm, bi = _bwd_tiles(block_rows, H, I, xt.dtype.itemsize,
                        wg.dtype.itemsize)
    n_i = I // bi
    dst, blk_expert, blk_valid, R_pad = sorted_expert_layout(topi, E, bm)
    n_blocks = R_pad // bm

    tok_of_flat = jnp.arange(Tk) // k
    x_sorted = jnp.zeros((R_pad, H), xt.dtype).at[dst].set(xt[tok_of_flat])
    xs = x_sorted.reshape(n_blocks, bm, H)

    # d_topv needs the UNWEIGHTED per-slot outputs: one forward recompute
    y = ragged_expert_ffn(xs, blk_expert, {"kernel": wg}, {"kernel": wu},
                          {"kernel": wd}, interpret=interpret,
                          blk_valid=blk_valid).reshape(R_pad, H)
    dy_tok = dy.astype(jnp.float32)
    d_topv = jnp.sum(dy_tok[tok_of_flat] * y[dst].astype(jnp.float32),
                     axis=-1).reshape(T, k).astype(topv.dtype)

    # dY rows carry the combine weight (output is linear in it)
    w = topv.reshape(-1).astype(jnp.float32)
    dY = jnp.zeros((R_pad, H), jnp.float32).at[dst].set(
        w[:, None] * dy_tok[tok_of_flat])
    dYs = dY.reshape(n_blocks, bm, H)

    ids32 = blk_expert.astype(jnp.int32)
    v32 = blk_valid.astype(jnp.int32)
    x_spec = pl.BlockSpec((1, bm, H), lambda a, i, ids, v: (a, 0, 0))
    gu_spec = pl.BlockSpec((1, H, bi), lambda a, i, ids, v: (ids[a], 0, i))
    d_spec = pl.BlockSpec((1, bi, H), lambda a, i, ids, v: (ids[a], i, 0))

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, n_i=n_i),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks, n_i),
            in_specs=[x_spec, x_spec, gu_spec, gu_spec, d_spec],
            out_specs=x_spec,
            scratch_shapes=[pltpu.VMEM((bm, H), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, bm, H), jnp.float32),
        interpret=interpret,
    )(ids32, v32, xs, dYs, wg, wu, wd).reshape(R_pad, H)
    d_xt = (jnp.zeros((T, H), jnp.float32).at[tok_of_flat].add(dx[dst])
            .astype(xt.dtype))

    # dW: grid (i, a) — a inner so each (e, i) output block's visits are
    # one consecutive run; index_maps swap accordingly. Two kernels
    # (dWg/dWu, then dWd) — see _bwd_dw_kernel's docstring for why.
    xw_spec = pl.BlockSpec((1, bm, H), lambda i, a, ids, v: (a, 0, 0))
    gw_spec = pl.BlockSpec((1, H, bi), lambda i, a, ids, v: (ids[a], 0, i))
    dw_spec = pl.BlockSpec((1, bi, H), lambda i, a, ids, v: (ids[a], i, 0))
    dwg, dwu = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, n_blocks=n_blocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i, n_blocks),
            in_specs=[xw_spec, xw_spec, gw_spec, gw_spec, dw_spec],
            out_specs=[gw_spec, gw_spec],
            scratch_shapes=[pltpu.VMEM((H, bi), jnp.float32),
                            pltpu.VMEM((H, bi), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((E, H, I), jnp.float32),
                   jax.ShapeDtypeStruct((E, H, I), jnp.float32)],
        interpret=interpret,
    )(ids32, v32, xs, dYs, wg, wu, wd)
    dwd = pl.pallas_call(
        functools.partial(_bwd_dwd_kernel, n_blocks=n_blocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i, n_blocks),
            in_specs=[xw_spec, xw_spec, gw_spec, gw_spec],
            out_specs=dw_spec,
            scratch_shapes=[pltpu.VMEM((bi, H), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((E, I, H), jnp.float32),
        interpret=interpret,
    )(ids32, v32, xs, dYs, wg, wu)
    # experts with zero routed tokens were never visited: their output
    # blocks are uninitialized HBM (could be NaN bits) — mask, don't trust
    # .add, not .set: a slack block clamped to id E-1 with v=0 must not
    # overwrite a real visit of expert E-1
    visited = jnp.zeros((E,), jnp.int32).at[ids32].add(v32) > 0
    dwg = jnp.where(visited[:, None, None], dwg, 0.0)
    dwu = jnp.where(visited[:, None, None], dwu, 0.0)
    dwd = jnp.where(visited[:, None, None], dwd, 0.0)

    import numpy as _np

    d_topi = _np.zeros(topi.shape, jax.dtypes.float0)
    return (d_xt, d_topv, d_topi,
            (dwg.astype(wg.dtype), dwu.astype(wu.dtype),
             dwd.astype(wd.dtype)))


gmm_expert_ffn_diff.defvjp(_gmm_diff_fwd, _gmm_diff_bwd)


def moe_mlp_gmm_diff(p: dict, xt: jax.Array, k: int, norm_topk_prob: bool,
                     block_rows: int | None = None,
                     interpret: bool | None = None) -> jax.Array:
    """Differentiable exact MoE forward (float expert weights): GMM with
    the recompute VJP — router grads flow through route()'s autodiff via
    the topv cotangent. Used by moe_mlp when gmm_prefill is on and the
    weights are float, so exact MoE TRAINING escapes the E x einsum too."""
    from ..models.moe import route

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    E = p["router"]["kernel"].shape[-1]
    if block_rows is None:
        block_rows = auto_block_rows(xt.shape[0] * k, E)
    topv, topi = route(p["router"]["kernel"], xt, k, norm_topk_prob)
    return gmm_expert_ffn_diff(
        xt, topv, topi,
        (p["experts"]["gate"]["kernel"], p["experts"]["up"]["kernel"],
         p["experts"]["down"]["kernel"]), block_rows, interpret)


@functools.lru_cache(maxsize=64)
def _sharded_gmm_fn(mesh, k: int, norm_topk_prob: bool, quant: bool,
                    E: int, block_rows: int, interpret: bool,
                    act_quant: str | None = None):
    """Cached jitted shard_map for ep x tp GMM prefill — same structure as
    ops/moe_ragged._sharded_ragged_fn (which documents the check_vma /
    eager-impl / tiled-output-combine constraints): every shard routes
    replicated, masks non-local slots to the sentinel id (they sort into
    the tail pad region and combine with zero weight), sorts/computes only
    its LOCAL experts' rows, and the [1, T, H] partials sum outside."""
    from jax.sharding import PartitionSpec as P

    from ..models.moe import route

    ep = dict(mesh.shape).get("ep", 1)
    E_local = E // ep

    def body(rk, gate, up, down, xt_l):
        e0 = jax.lax.axis_index("ep") * E_local
        topv, topi = route(rk, xt_l, k, norm_topk_prob)
        local = (topi >= e0) & (topi < e0 + E_local)
        topi_l = jnp.where(local, topi - e0, E_local)
        topv_l = jnp.where(local, topv, jnp.zeros_like(topv))
        out = _gmm_apply(xt_l, topv_l, topi_l, E_local, gate, up, down,
                         block_rows, interpret, act_quant=act_quant)
        return out[None]

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), expert_leaf_specs("gu", quant),
                  expert_leaf_specs("gu", quant),
                  expert_leaf_specs("d", quant), P()),
        out_specs=P(("ep", "tp")), axis_names={"ep", "tp"},
        check_vma=False))


def moe_mlp_gmm_sharded(p: dict, xt: jax.Array, k: int,
                        norm_topk_prob: bool, mesh,
                        block_rows: int | None = None,
                        interpret: bool | None = None,
                        act_quant: str | None = None) -> jax.Array:
    """GMM prefill under an ep x tp serving mesh: each shard computes only
    the rows routed to ITS experts (plus block padding) with tp-split
    intermediate channels — exact judge prefill at any scale, replacing
    the einsum whose exact mode is E x oversized."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    E = p["router"]["kernel"].shape[-1]
    if block_rows is None:
        ep = dict(mesh.shape).get("ep", 1)
        block_rows = auto_block_rows(xt.shape[0] * k, E // ep)
    gate = p["experts"]["gate"]
    quant = "kernel_q" in gate
    keep = ("kernel_q", "scale") if quant else ("kernel",)
    fn = _sharded_gmm_fn(mesh, k, norm_topk_prob, quant, E, block_rows,
                         interpret, act_quant if quant else None)
    parts = fn(p["router"]["kernel"],
               *({n: leaf[n] for n in keep}
                 for leaf in (gate, p["experts"]["up"],
                              p["experts"]["down"])), xt)
    return parts.sum(0)
