"""Ragged (active-experts-only) MoE expert FFN for small-batch decode.

The grouped-einsum dispatch in models/moe.py streams EVERY expert's
gate/up/down weights from HBM each step — correct and MXU-friendly for
prefill, but small-batch MoE decode (the judge workload: the reference
serves an 80B-A3B, i.e. 3B ACTIVE of 80B, train/serve_llm/serve_qwen3.sh:13)
is all-weights-HBM-bound: a B=8 decode step touches at most B*top_k
distinct experts yet pays the full E-expert weight read.

This is the megablox-style fix, TPU-native: each step builds a
static-size table of its ACTIVE experts (A = min(E, T*k) slots,
sorted-unique over the routing table, padded by repeating the last valid
id), and a Pallas kernel grids over those slots with the expert id
SCALAR-PREFETCHED into the weight BlockSpec index_map — exactly the int4
kernel's layer-indexing trick (ops/int4_matmul.py) — so Mosaic only ever
DMAs the routed experts' weight tiles. Padding slots repeat the previous
grid step's id, and Mosaic skips the re-DMA of an unchanged block, so pad
slots cost compute (masked to zero by the combine weights) but NO HBM
traffic.

HBM bytes/step: A/E of the all-experts einsum (e.g. B=1 greedy judge
decode on a 128-expert A3B: 8/128 = 16x less weight traffic). Exactness:
per-active-expert capacity is T (every routed token always fits), so this
path NEVER drops tokens — it reproduces capacity_factor=0 (exact)
semantics regardless of the configured factor, which is what a serving
decode step wants.

int8 weight-only experts ({kernel_q, scale}, models/quant.py) dequantize
in-kernel per tile (convert + per-output-channel scale fused after the
dot), halving the weight read again.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(ids_ref, valid_ref, x_ref, wg_ref, wu_ref, wd_ref, o_ref,
                acc_ref, *, n_i: int):
    """One (active-expert slot, intermediate tile) grid step of the fused
    SwiGLU expert FFN: acc += silu(x @ wg_b) * (x @ wu_b) @ wd_b.
    valid_ref[a] == 0 marks a slack block (the GMM layout's static bound
    past the occupied rows): its dots are skipped and its output written
    as zeros — uninitialized HBM could hold NaN bits that would poison
    the 0-weight combine downstream."""
    a = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(valid_ref[a] != 0)
    def _():
        x = x_ref[0]                       # [C, H]
        g = jax.nn.silu(jnp.dot(x, wg_ref[0],
                                preferred_element_type=jnp.float32))
        u = jnp.dot(x, wu_ref[0], preferred_element_type=jnp.float32)
        h = (g * u).astype(x.dtype)        # [C, bi]
        acc_ref[...] += jnp.dot(h, wd_ref[0],
                                preferred_element_type=jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _ffn_kernel_q(ids_ref, valid_ref, x_ref, wg_ref, sg_ref, wu_ref, su_ref,
                  wd_ref, sd_ref, o_ref, acc_ref, *, n_i: int):
    """int8 weight-only variant: per-output-channel scales (fed as
    [E, 1, I] for gate/up, [E, 1, H] for down — Mosaic rejects a (1, N)
    block of a 2-D [E, N] array because 1 neither divides 8 nor equals E;
    a leading singleton makes the trailing block dims (1, N) match the
    array, caught on chip r5) multiply the f32 dot outputs — the same
    factoring models/quant.py uses, done per tile in VMEM."""
    a = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(valid_ref[a] != 0)
    def _():
        x = x_ref[0]
        g = (jnp.dot(x, wg_ref[0].astype(x.dtype),
                     preferred_element_type=jnp.float32)
             * sg_ref[0, 0].astype(jnp.float32)[None, :])
        u = (jnp.dot(x, wu_ref[0].astype(x.dtype),
                     preferred_element_type=jnp.float32)
             * su_ref[0, 0].astype(jnp.float32)[None, :])
        h = (jax.nn.silu(g) * u).astype(x.dtype)
        acc_ref[...] += (jnp.dot(h, wd_ref[0].astype(x.dtype),
                                 preferred_element_type=jnp.float32)
                         * sd_ref[0, 0].astype(jnp.float32)[None, :])

    @pl.when(i == n_i - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _ffn_kernel_qq(ids_ref, valid_ref, xq_ref, ax_ref, wg_ref, sg_ref,
                   wu_ref, su_ref, wd_ref, sd_ref, o_ref, acc_ref,
                   *, n_i: int):
    """W8A8 variant: int8 activations x int8 weights on the integer MXU
    (the MoE counterpart of layers._w8a8_linear). Row scales ax [C] factor
    onto the f32 dot outputs with the per-channel weight scales; the
    intermediate h re-quantizes per row PER TILE (finer than the einsum
    path's full-row quant — a tolerance difference, not a bug)."""
    a = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(valid_ref[a] != 0)
    def _():
        xq = xq_ref[0]                                     # [C, H] int8
        ax = ax_ref[0, 0].astype(jnp.float32)              # [C]
        g = (jnp.dot(xq, wg_ref[0], preferred_element_type=jnp.int32)
             .astype(jnp.float32) * ax[:, None]
             * sg_ref[0, 0].astype(jnp.float32)[None, :])
        u = (jnp.dot(xq, wu_ref[0], preferred_element_type=jnp.int32)
             .astype(jnp.float32) * ax[:, None]
             * su_ref[0, 0].astype(jnp.float32)[None, :])
        h = jax.nn.silu(g) * u                             # [C, bi] f32
        ah = jnp.maximum(jnp.max(jnp.abs(h), axis=-1), 1e-6) / 127.0
        hq = jnp.clip(jnp.round(h / ah[:, None]), -127, 127).astype(jnp.int8)
        acc_ref[...] += (jnp.dot(hq, wd_ref[0],
                                 preferred_element_type=jnp.int32)
                         .astype(jnp.float32) * ah[:, None]
                         * sd_ref[0, 0].astype(jnp.float32)[None, :])

    @pl.when(i == n_i - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _fit_block_i(cap: int, C: int, H: int, I: int, xbytes: int,
                 wbytes: int, obytes: int) -> int:
    """Intermediate tile for the grouped FFN kernels: the largest
    lane-aligned (x128) divisor of I <= cap whose working set — Mosaic
    double-buffers every in/out block across grid steps — fits under
    ~14 MB of the 16 MB scoped-VMEM ceiling. I=768 (the A3B judge preset)
    picks 384 for int8 decode but 128 for the f32 training recompute,
    where 384 tiles overflowed on chip (r4 smoke: 18.5M > 16M). Falls back
    to the largest plain divisor for tiny I (bi == I is a full-dim block,
    which Mosaic always accepts)."""
    lim = min(cap, I)
    aligned = [d for d in range(lim, 0, -1) if I % d == 0 and d % 128 == 0]
    if not aligned:
        return next(d for d in range(lim, 0, -1) if I % d == 0)

    def vmem(bi: int) -> int:
        ins = 2 * (C * H * xbytes + 3 * H * bi * wbytes)
        outs = 2 * C * H * obytes
        return ins + outs + C * H * 4

    return next((bi for bi in aligned if vmem(bi) <= 14 * 2 ** 20),
                aligned[-1])


@functools.partial(jax.jit, static_argnames=("block_i", "interpret"))
def ragged_expert_ffn(
    x_slots: jax.Array,        # [A, C, H] dispatched tokens (zero-padded)
    active_ids: jax.Array,     # [A] int32, sorted; pads repeat the last id
    gate: dict, up: dict, down: dict,   # expert weight leaves ([E, ..] each)
    block_i: int = 512,
    interpret: bool = False,
    blk_valid: jax.Array | None = None,  # [A] int32; 0 = slack block (skip
                                         # compute, write zeros) — the GMM
                                         # layout's static-bound tail
    x_scales: jax.Array | None = None,   # [A, C] f32: x_slots is int8 with
                                         # these per-row absmax scales ->
                                         # W8A8 dots on the integer MXU
                                         # (requires int8 weight leaves)
) -> jax.Array:
    """Fused SwiGLU over ACTIVE experts only. Returns [A, C, H].

    Weight leaves are models/moe.py expert leaves: {"kernel" [E, K, N]} or
    int8 {"kernel_q" [E, K, N] int8, "scale" [E, N]}. Only rows
    active_ids[:] are ever read from HBM (BlockSpec index_map on the
    scalar-prefetched ids)."""
    A, C, H = x_slots.shape
    quant = "kernel_q" in gate
    assert x_scales is None or quant, "W8A8 needs int8 weight leaves"
    wg = gate["kernel_q"] if quant else gate["kernel"]
    wu = up["kernel_q"] if quant else up["kernel"]
    wd = down["kernel_q"] if quant else down["kernel"]
    E, _, I = wg.shape
    obytes = 4 if (quant and x_scales is not None) else x_slots.dtype.itemsize
    bi = _fit_block_i(block_i, C, H, I, x_slots.dtype.itemsize,
                      wg.dtype.itemsize, obytes)
    n_i = I // bi
    if blk_valid is None:
        blk_valid = jnp.ones((A,), jnp.int32)

    x_spec = pl.BlockSpec((1, C, H), lambda a, i, ids, v: (a, 0, 0))
    gu_spec = pl.BlockSpec((1, H, bi), lambda a, i, ids, v: (ids[a], 0, i))
    d_spec = pl.BlockSpec((1, bi, H), lambda a, i, ids, v: (ids[a], i, 0))
    out_spec = pl.BlockSpec((1, C, H), lambda a, i, ids, v: (a, 0, 0))
    scratch = [pltpu.VMEM((C, H), jnp.float32)]

    # scale operands ride as 3-D [E, 1, N] with (1, 1, tile) blocks: Mosaic
    # requires a block's last two dims divisible by (8, 128) OR equal to
    # the array's — a (1, N) block of a 2-D [E, N] array violates that
    # (caught on the real chip r5; interpret mode accepts it silently)
    if quant:
        sg3 = gate["scale"].reshape(E, 1, I)
        su3 = up["scale"].reshape(E, 1, I)
        sd3 = down["scale"].reshape(E, 1, H)
        s_spec = pl.BlockSpec((1, 1, bi), lambda a, i, ids, v: (ids[a], 0, i))
        sd_spec = pl.BlockSpec((1, 1, H), lambda a, i, ids, v: (ids[a], 0, 0))

    if quant and x_scales is not None:
        ax_spec = pl.BlockSpec((1, 1, C), lambda a, i, ids, v: (a, 0, 0))
        kernel = functools.partial(_ffn_kernel_qq, n_i=n_i)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(A, n_i),
                in_specs=[x_spec, ax_spec, gu_spec, s_spec, gu_spec, s_spec,
                          d_spec, sd_spec],
                out_specs=out_spec,
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((A, C, H), jnp.float32),
            interpret=interpret,
        )(active_ids.astype(jnp.int32), blk_valid.astype(jnp.int32),
          x_slots, x_scales.astype(jnp.float32).reshape(A, 1, C),
          wg, sg3, wu, su3, wd, sd3)

    if quant:
        kernel = functools.partial(_ffn_kernel_q, n_i=n_i)
        # the [E, H] down scale multiplies each I-tile's partial sum before
        # accumulation — scaling is linear, so per-tile application equals
        # scaling the full sum once (exactness pinned by the parity test)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(A, n_i),
                in_specs=[x_spec, gu_spec, s_spec, gu_spec, s_spec,
                          d_spec, sd_spec],
                out_specs=out_spec,
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((A, C, H), x_slots.dtype),
            interpret=interpret,
        )(active_ids.astype(jnp.int32), blk_valid.astype(jnp.int32), x_slots,
          wg, sg3, wu, su3, wd, sd3)

    kernel = functools.partial(_ffn_kernel, n_i=n_i)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(A, n_i),
            in_specs=[x_spec, gu_spec, gu_spec, d_spec],
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((A, C, H), x_slots.dtype),
        interpret=interpret,
    )(active_ids.astype(jnp.int32), blk_valid.astype(jnp.int32),
      x_slots, wg, wu, wd)


def quantize_rows(x: jax.Array, keepdims: bool = False
                  ) -> tuple[jax.Array, jax.Array]:
    """Per-row absmax int8 over the last axis — THE quantizer both the
    einsum W8A8 path (models/moe._expert_matmul, via lazy import) and the
    grouped kernels share, so their rounding can never drift apart."""
    x32 = x.astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=keepdims),
                    1e-6) / 127.0
    xq = jnp.clip(jnp.round(x32 / (a if keepdims else a[..., None])),
                  -127, 127).astype(jnp.int8)
    return xq, a


def active_expert_table(topi: jax.Array, num_experts: int
                        ) -> tuple[jax.Array, jax.Array]:
    """Routing table [T, k] -> (active_ids [A] sorted, a_idx [T, k]).

    A = min(E, T*k) static. active_ids holds the step's distinct routed
    experts in ascending order; pad slots REPEAT the last valid id (so
    consecutive kernel grid steps see an unchanged block index and Mosaic
    skips the DMA). a_idx maps each routing slot to its active row.

    Slots may carry the SENTINEL id E (= num_experts): "not routed here" —
    the expert-parallel path masks non-local slots this way. Sentinel slots
    never enter the active set and map to a_idx == A (out of range), which
    one_hot turns into an all-zero dispatch row. A shard whose step routes
    ZERO local tokens still gets in-range active_ids (clamped to E-1): the
    kernel DMAs one expert's weights and the combine zeroes the output."""
    T, k = topi.shape
    E = num_experts
    A = min(E, T * k)
    flat = topi.reshape(-1).astype(jnp.int32)
    s = jnp.sort(flat)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    key = jnp.where(first, s, E)          # duplicates sort to the tail
    su = jnp.sort(key)[:A]
    valid = su < E
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    last = su[n_valid - 1]
    active_ids = jnp.minimum(jnp.where(valid, su, last), E - 1)
    # each token's expert is in the valid (sorted, duplicate-free) prefix,
    # so searchsorted finds its exact row; sentinel slots (flat == E) land
    # at A (all active_ids < E), i.e. a zero one-hot row downstream
    a_idx = jnp.searchsorted(active_ids, flat).reshape(T, k)
    return active_ids, a_idx


def _ragged_apply(xt: jax.Array, topv: jax.Array, topi: jax.Array, E: int,
                  gate: dict, up: dict, down: dict, interpret: bool,
                  act_quant: str | None = None) -> jax.Array:
    """Dispatch/kernel/combine over the active-expert table for a routed
    step. topi entries may be the sentinel E (masked slot — zero dispatch
    AND zero combine; the ep-sharded path masks non-local slots this way).
    xt [T, H], topv/topi [T, k] -> [T, H]."""
    T, H = xt.shape
    k = topi.shape[-1]
    active_ids, a_idx = active_expert_table(topi, E)
    A = active_ids.shape[0]
    C = max(T, 8)   # sublane-friendly capacity; every routed token fits

    # position within active expert: slot-major cumsum (T*k is tiny);
    # sentinel slots (a_idx == A) one-hot to zero rows everywhere
    oh_a = jax.nn.one_hot(a_idx.reshape(-1), A, dtype=jnp.int32)   # [Tk, A]
    pos = (jnp.cumsum(oh_a, axis=0) - 1)
    pos = jnp.take_along_axis(pos, jnp.minimum(a_idx.reshape(-1), A - 1)[:, None],
                              1)[:, 0]
    oh = (jax.nn.one_hot(a_idx.reshape(-1), A, dtype=xt.dtype)[:, :, None]
          * jax.nn.one_hot(pos, C, dtype=xt.dtype)[:, None, :])    # [Tk,A,C]
    x_rep = jnp.repeat(xt, k, axis=0)                              # [Tk, H]
    x_slots = jnp.einsum("tac,th->ach", oh, x_rep)

    if act_quant == "int8" and "kernel_q" in gate:
        xq, ax = quantize_rows(x_slots)
        y_slots = ragged_expert_ffn(xq, active_ids, gate, up, down,
                                    interpret=interpret, x_scales=ax)
    else:
        y_slots = ragged_expert_ffn(x_slots, active_ids, gate, up, down,
                                    interpret=interpret)

    w_rep = topv.reshape(-1)                                       # [Tk]
    out = jnp.einsum("tac,ach->th", oh * w_rep[:, None, None], y_slots)
    # the W8A8 kernel accumulates/returns f32 — cast back so the decoder's
    # residual-add (a lax.scan carry) keeps the model dtype
    return out.reshape(T, k, H).sum(1).astype(xt.dtype)


def moe_mlp_ragged(p: dict, xt: jax.Array, k: int, norm_topk_prob: bool,
                   interpret: bool | None = None,
                   act_quant: str | None = None) -> jax.Array:
    """Decode-path sparse MoE over active experts only. xt [T, H] (T small:
    a decode step's tokens); returns [T, H]. Exact (never drops — per-
    active-expert capacity is T). Routing semantics identical to
    models/moe.py:route (HF Qwen3MoeSparseMoeBlock parity)."""
    from ..models.moe import route

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    E = p["router"]["kernel"].shape[-1]
    topv, topi = route(p["router"]["kernel"], xt, k, norm_topk_prob)
    return _ragged_apply(xt, topv, topi, E, p["experts"]["gate"],
                         p["experts"]["up"], p["experts"]["down"], interpret,
                         act_quant=act_quant)


def ragged_mesh_ok(mesh, p: dict) -> bool:
    """Can this step run the ep x tp sharded ragged path? Requires: every
    mesh axis other than ep/tp is size 1 (the shard_map body is manual over
    ep/tp only — a >1 fsdp/dp/sp/pp axis would leave operands auto-sharded
    inside the Pallas call), ep divides the expert count, and tp divides the
    intermediate width (gate/up out-channels, down in-channels)."""
    shape = dict(mesh.shape)
    if any(s > 1 for name, s in shape.items() if name not in ("ep", "tp")):
        return False
    gate = p["experts"]["gate"]
    wg = gate["kernel_q"] if "kernel_q" in gate else gate["kernel"]
    E, _, I = wg.shape
    ep, tp = shape.get("ep", 1), shape.get("tp", 1)
    return E % ep == 0 and I % tp == 0 and (E // ep) >= 1


def expert_leaf_specs(kind: str, quant: bool):
    """shard_map in_specs for one expert weight leaf dict, matching
    parallel/sharding.py's expert rules with fsdp collapsed (the sharded
    ragged/GMM paths require every non-ep/tp mesh axis to be size 1).
    kind: "gu" (gate/up [E, H, I] — I on "tp") or "d" (down [E, I, H])."""
    from jax.sharding import PartitionSpec as P

    kspec = P("ep", None, "tp") if kind == "gu" else P("ep", "tp", None)
    if not quant:
        return {"kernel": kspec}
    sspec = P("ep", "tp") if kind == "gu" else P("ep", None)
    return {"kernel_q": kspec, "scale": sspec}


@functools.lru_cache(maxsize=64)
def _sharded_ragged_fn(mesh, k: int, norm_topk_prob: bool, quant: bool,
                       E: int, interpret: bool,
                       act_quant: str | None = None):
    """Cached jitted shard_map for one (mesh, routing, leaf-kind, E) combo.

    The jit wrapper is required because partial-manual shard_map has no
    EAGER impl in this jax (its unmatch path re-enters shard_map with
    all-axes specs and trips the manual-axes check); engine call sites are
    already inside jit and inline it. Caching here keeps eager callers
    (tests, on-chip probes) from retracing a fresh shard_map object every
    call — jit's cache is keyed on function identity."""
    from jax.sharding import PartitionSpec as P

    from ..models.moe import route

    ep = dict(mesh.shape).get("ep", 1)
    E_local = E // ep
    leaf_spec = lambda kind: expert_leaf_specs(kind, quant)  # noqa: E731

    def body(rk, gate, up, down, xt_l):
        e0 = jax.lax.axis_index("ep") * E_local
        topv, topi = route(rk, xt_l, k, norm_topk_prob)
        local = (topi >= e0) & (topi < e0 + E_local)
        topi_l = jnp.where(local, topi - e0, E_local)   # sentinel: not ours
        topv_l = jnp.where(local, topv, jnp.zeros_like(topv))
        out = _ragged_apply(xt_l, topv_l, topi_l, E_local, gate, up, down,
                            interpret, act_quant=act_quant)
        return out[None]   # [1, T, H] partial: this shard's experts/channels

    # Combine OUTSIDE the shard_map: shards return [1, T, H] partials
    # tiled over ("ep", "tp") and a plain sum reduces them in GSPMD-land.
    # (An in-body psum wants check_vma=True — replicated out_specs=P() is
    # rejected under check_vma=False — but Pallas + the strict VMA typing
    # then demands pvary at every invariant/varying mix; the tiled output
    # sidesteps the whole system for a [n_shards, T, H]-sized concat, tiny
    # at decode shapes.)
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), leaf_spec("gu"), leaf_spec("gu"), leaf_spec("d"),
                  P()),
        out_specs=P(("ep", "tp")), axis_names={"ep", "tp"},
        check_vma=False))


def moe_mlp_ragged_sharded(p: dict, xt: jax.Array, k: int,
                           norm_topk_prob: bool, mesh,
                           interpret: bool | None = None,
                           act_quant: str | None = None) -> jax.Array:
    """Ragged decode under an ep x tp serving mesh (the judge topology:
    vLLM --tensor-parallel-size 4 in the reference, serve_qwen3.sh:13).

    Partial-manual shard_map over {"ep", "tp"} (the paged-attention
    pattern, ops/paged_attention.py): every shard routes the full step
    replicated (router kernel is replicated over ep/tp), masks slots not
    owned by its ep block to the sentinel id, and runs the SAME ragged
    kernel over its local expert stack — gate/up split their intermediate
    channels on "tp" (megatron FFN), down consumes the local channels, so
    shard outputs are partial sums combined across ("ep", "tp"). HBM win
    per shard: only the shard's LOCALLY-ROUTED experts' weight rows
    stream — vs the ep-meshed einsum which reads all E/ep local experts
    every step."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    E = p["router"]["kernel"].shape[-1]
    gate = p["experts"]["gate"]
    quant = "kernel_q" in gate
    keep = ("kernel_q", "scale") if quant else ("kernel",)
    fn = _sharded_ragged_fn(mesh, k, norm_topk_prob, quant, E, interpret,
                            act_quant if quant else None)
    parts = fn(p["router"]["kernel"],
               *({n: leaf[n] for n in keep}
                 for leaf in (gate, p["experts"]["up"],
                              p["experts"]["down"])), xt)
    return parts.sum(0)
