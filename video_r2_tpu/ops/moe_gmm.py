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
one gather + segment-add back to token order. Inference-only for now (the
kernel has no VJP; MoE training keeps the einsum — the reference never
trains its judge, train/serve_llm/serve_qwen3.sh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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
