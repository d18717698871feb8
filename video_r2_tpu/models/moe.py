"""Mixture-of-Experts MLP with expert parallelism (the judge-model family).

The reference's judge is Qwen3-Next-80B-A3B — a sparse MoE it can only serve
through vLLM (serve_qwen3.sh:11-17). This module makes MoE decoders a
first-class citizen of the engine so the judge role runs on our own stack:
Qwen3-MoE-style top-k routing (softmax over all experts, top-k, optional
renormalization — HF Qwen3MoeSparseMoeBlock semantics), experts stacked on
an [E] axis that shards over the "ep" mesh axis.

TPU-first dispatch (t5x/flax MoE layout, not a torch expert loop):
- tokens are chunked into fixed-size GROUPS; each group computes a
  [n, E, C] dispatch/combine tensor (C = per-group expert capacity), so the
  routing tensors stay O(group) instead of O(batch*seq);
- dispatch/expert-FFN/combine are einsums — under GSPMD the [*, E, ...]
  operands shard over "ep" (propagated from the expert weights), and XLA
  inserts the all_to_all pair that moves tokens to their experts' devices
  and back; nothing is hand-scheduled;
- position-in-expert comes from a cumsum over the slot-major one-hot;
  tokens over capacity are DROPPED (contribute zero, standard GShard/Switch
  behavior). capacity_factor=0 means full capacity (no drops — exactness
  mode for tests and tiny judges); production serving uses ~1.25-2.0.

Parity anchor: HF Qwen3MoeSparseMoeBlock (top_k softmax+renorm, silu-gated
experts); the dense-vs-grouped equivalence is pinned by tests/test_moe.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# moe_mlp(ragged_decode=True) uses the active-experts-only kernel up to
# this many tokens per step; the dispatch one-hots are O(T*k * T*k) and the
# active-set win fades as T*k approaches E, so bigger steps (prefill) stay
# on the grouped einsum
RAGGED_MAX_TOKENS = 32


def _expert_w(leaf: dict, dtype) -> tuple[jax.Array, jax.Array | None]:
    """Expert weight leaf -> (kernel [E, K, N], per-channel scale [E, N] or
    None). int8 weight-only leaves ({kernel_q, scale}, models/quant.py) cast
    inside the einsum — XLA fuses the convert into the dot — and the scale
    multiplies the OUTPUT (factorable because it is per-output-channel), so
    the dequantized [E, K, N] tensor never materializes in HBM."""
    if "kernel_q" in leaf:
        return leaf["kernel_q"].astype(dtype), leaf["scale"]
    return leaf["kernel"], None


def _scaled(y: jax.Array, scale: jax.Array | None) -> jax.Array:
    if scale is None:
        return y
    return y * scale.astype(y.dtype)[None, :, None, :]   # [E, N] over [G,E,C,N]


def _capacity(group: int, num_experts: int, k: int,
              capacity_factor: float) -> int:
    if capacity_factor <= 0:
        return group * k                      # full: no token ever drops
    c = int(-(-group * k * capacity_factor // num_experts))
    return max(k, min(c, group * k))


def route(router_kernel: jax.Array, x: jax.Array, k: int,
          norm_topk_prob: bool) -> tuple[jax.Array, jax.Array]:
    """Top-k routing. x [T, H] -> (weights [T, k] in x.dtype, ids [T, k]).
    Router math runs in float32 (HF computes routing logits/softmax in
    fp32 regardless of model dtype)."""
    logits = x.astype(jnp.float32) @ router_kernel.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, k)
    if norm_topk_prob:
        topv = topv / jnp.clip(topv.sum(-1, keepdims=True), 1e-9)
    return topv.astype(x.dtype), topi


def _expert_matmul(x: jax.Array, leaf: dict, eq: str,
                   act_quant: str | None) -> jax.Array:
    """x [G,E,C,K] @ expert kernels [E,K,N] -> [G,E,C,N]. int8 weight
    leaves dequantize inside the dot (scales factored onto outputs); with
    act_quant="int8" the dot itself runs int8 x int8 -> int32 on the
    integer MXU (the MoE counterpart of layers._w8a8_linear)."""
    if act_quant == "int8" and "kernel_q" in leaf:
        from ..ops.moe_ragged import quantize_rows

        xq, a = quantize_rows(x, keepdims=True)
        y = jnp.einsum(eq, xq, leaf["kernel_q"],
                       preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * a
             * leaf["scale"].astype(jnp.float32)[None, :, None, :])
        return y.astype(x.dtype)
    w, scale = _expert_w(leaf, x.dtype)
    return _scaled(jnp.einsum(eq, x, w), scale)


def _keep_mask(topi, G: int, n: int, E: int, C: int
               ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(ids [G, nk], pos [G, nk] position-within-expert, keep [G, nk]).

    Token-major flattening fixes intra-group priority (all of token i's
    slots claim capacity before token i+1's); slots whose position within
    their expert reaches C DROP (keep=False -> zero dispatch row)."""
    k = topi.shape[-1]
    ids = topi.reshape(G, n * k)                       # [G, nk]
    oh_e = jax.nn.one_hot(ids, E, dtype=jnp.int32)     # [G, nk, E]
    pos = jnp.cumsum(oh_e, axis=1) - 1                 # position within expert
    pos = jnp.take_along_axis(pos, ids[..., None], axis=2)[..., 0]  # [G, nk]
    return ids, pos, pos < C


def _dispatch_tensors(topi, topv, G: int, n: int, E: int, C: int, dtype
                      ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Group-view dispatch/combine tensors + keep mask ([G, nk] bool)."""
    k = topi.shape[-1]
    ids, pos, keep = _keep_mask(topi, G, n, E, C)
    w = topv.reshape(G, n * k)
    oh_c = jax.nn.one_hot(jnp.where(keep, pos, C), C, dtype=dtype)
    disp = (jax.nn.one_hot(ids, E, dtype=dtype)[..., None]
            * oh_c[..., None, :])                      # [G, nk, E, C]
    comb = disp * w[..., None, None]
    return disp, comb, keep


def capacity_drop_stats(p: dict, x: jax.Array, num_experts_per_tok: int,
                        norm_topk_prob: bool = True,
                        capacity_factor: float = 0.0,
                        group_size: int = 256) -> dict:
    """Operator telemetry for the GShard capacity tradeoff (VERDICT r3 #7):
    what fraction of routing SLOTS — and of router WEIGHT mass, the better
    quality proxy — does this (batch, capacity_factor) drop? Runs the exact
    moe_mlp routing + keep computation (shared _dispatch_tensors), so the
    numbers are the true drops, not an estimate. Returns python floats:
    {slot_drop_rate, weight_drop_rate, capacity, expert_max_fill}."""
    B, S, H = x.shape if x.ndim == 3 else (1, *x.shape)
    xt = x.reshape(B * S, H)
    k = num_experts_per_tok
    E = p["router"]["kernel"].shape[-1]
    T = B * S
    n = min(group_size, T)
    G = -(-T // n)
    Tp = G * n
    pad = Tp - T
    if pad:
        xt = jnp.pad(xt, ((0, pad), (0, 0)))
    topv, topi = route(p["router"]["kernel"], xt, k, norm_topk_prob)
    C = _capacity(n, E, k, capacity_factor)
    ids, _, keep = _keep_mask(topi, G, n, E, C)
    keep = keep.reshape(-1)[:T * k] if pad else keep.reshape(-1)
    w = topv.reshape(-1)[:T * k].astype(jnp.float32)
    slot_drop = 1.0 - float(jnp.mean(keep.astype(jnp.float32)))
    weight_drop = 1.0 - float(jnp.sum(jnp.where(keep, w, 0.0))
                              / jnp.maximum(jnp.sum(w), 1e-9))
    fill = jax.nn.one_hot(topi.reshape(G, n * k), E,
                          dtype=jnp.int32).sum(1)       # [G, E]
    return {"slot_drop_rate": slot_drop, "weight_drop_rate": weight_drop,
            "capacity": C, "expert_max_fill": int(jnp.max(fill))}


def moe_mlp(
    p: dict,                     # {"router": {"kernel" [H,E]}, "experts":
                                 #  {"gate"/"up" [E,H,I], "down" [E,I,H]}}
    x: jax.Array,                # [B, S, H]
    num_experts_per_tok: int,
    norm_topk_prob: bool = True,
    capacity_factor: float = 0.0,
    group_size: int = 256,
    act_quant: str | None = None,
    ragged_decode: bool = False,
    mesh=None,
    gmm_prefill: bool = False,
) -> jax.Array:
    """Sparse MoE feed-forward. Drop-in for swiglu_mlp on MoE layers.

    ragged_decode=True (cfg.moe_ragged_decode): small-batch steps (decode:
    T = B*S <= RAGGED_MAX_TOKENS) route through ops/moe_ragged.py — a
    Pallas grouped matmul that reads ONLY the step's routed experts'
    weights from HBM (megablox-style; the all-experts einsum's weight
    stream is the small-batch MoE decode bottleneck — an A3B judge reads
    3B active but streams the full 80B otherwise). Exact (never drops).
    With a mesh (ep x tp judge serving) the ragged kernel runs per-shard
    over local experts/channels inside a partial-manual shard_map
    (moe_mlp_ragged_sharded); meshes the shard_map can't cover (fsdp/dp/
    sp/pp > 1, non-dividing ep/tp) fall back to the grouped einsum, whose
    GSPMD sharding already reads only local experts per device.

    gmm_prefill=True (cfg.moe_gmm_prefill): larger (prefill) steps route
    through ops/moe_gmm.py — sorted grouped matmul over exactly the
    routed rows (+ block padding). The einsum's EXACT mode
    (capacity_factor=0, the judge default: drops are not a safe judging
    tradeoff) allocates C = group*k slots for every expert, ~E x the
    routed compute at the A3B judge shape and a multi-GB expert_in at
    real prompt lengths; GMM is exact at ~1.1-1.5x. Float weights on a
    single device DIFFERENTIATE (recompute custom VJP, grads == einsum);
    the sharded and int8/W8A8 variants are inference-only. Without the
    flag prefill falls through to the grouped einsum unchanged."""
    B, S, H = x.shape
    k = num_experts_per_tok
    E = p["router"]["kernel"].shape[-1]
    T = B * S
    xt = x.reshape(T, H)

    # W8A8 (act_quant="int8") rides the kernels too when the weights are
    # int8 (integer-MXU dots with row-scale factoring, _ffn_kernel_qq);
    # int8 activations with FLOAT weights have no kernel — einsum then.
    quant_w = "kernel_q" in p["experts"]["gate"]
    aq_ok = act_quant != "int8" or quant_w
    kernel_aq = act_quant if quant_w else None

    if ragged_decode and T <= RAGGED_MAX_TOKENS and aq_ok:
        from ..ops.moe_ragged import (moe_mlp_ragged, moe_mlp_ragged_sharded,
                                      ragged_mesh_ok)

        interpret = jax.default_backend() != "tpu"
        if mesh is not None:
            if ragged_mesh_ok(mesh, p):
                return moe_mlp_ragged_sharded(
                    p, xt, k, norm_topk_prob, mesh, interpret=interpret,
                    act_quant=kernel_aq).reshape(B, S, H)
            # unqualifying mesh: grouped einsum below (GSPMD-sharded)
        else:
            return moe_mlp_ragged(p, xt, k, norm_topk_prob,
                                  interpret=interpret,
                                  act_quant=kernel_aq).reshape(B, S, H)

    if gmm_prefill and aq_ok:
        from ..ops.moe_gmm import moe_mlp_gmm, moe_mlp_gmm_sharded
        from ..ops.moe_ragged import ragged_mesh_ok

        interpret = jax.default_backend() != "tpu"
        if mesh is not None:
            if ragged_mesh_ok(mesh, p):
                return moe_mlp_gmm_sharded(
                    p, xt, k, norm_topk_prob, mesh, interpret=interpret,
                    act_quant=kernel_aq).reshape(B, S, H)
            # unqualifying mesh: grouped einsum below (GSPMD-sharded)
        elif quant_w:
            return moe_mlp_gmm(p, xt, k, norm_topk_prob,
                               interpret=interpret,
                               act_quant=kernel_aq).reshape(B, S, H)
        else:
            # float weights: the custom-VJP wrapper — identical forward,
            # and jax.grad works (exact MoE training without the E x
            # einsum; recompute backward, ops/moe_gmm.py)
            from ..ops.moe_gmm import moe_mlp_gmm_diff

            return moe_mlp_gmm_diff(p, xt, k, norm_topk_prob,
                                    interpret=interpret).reshape(B, S, H)

    n = min(group_size, T)
    G = -(-T // n)
    Tp = G * n
    if Tp != T:  # pad the tail group; padded tokens route but combine to 0
        xt = jnp.pad(xt, ((0, Tp - T), (0, 0)))

    topv, topi = route(p["router"]["kernel"], xt, k, norm_topk_prob)
    C = _capacity(n, E, k, capacity_factor)
    disp, comb, _ = _dispatch_tensors(topi, topv, G, n, E, C, x.dtype)

    xg = xt.reshape(G, n, H)
    disp_t = disp.reshape(G, n, k, E, C).sum(2)        # token -> (e, c) slots
    expert_in = jnp.einsum("gnec,gnh->gech", disp_t, xg)
    hmid = (jax.nn.silu(_expert_matmul(expert_in, p["experts"]["gate"],
                                       "gech,ehi->geci", act_quant))
            * _expert_matmul(expert_in, p["experts"]["up"],
                             "gech,ehi->geci", act_quant))
    expert_out = _expert_matmul(hmid, p["experts"]["down"],
                                "geci,eih->gech", act_quant)
    comb_t = comb.reshape(G, n, k, E, C).sum(2)
    out = jnp.einsum("gnec,gech->gnh", comb_t, expert_out)
    return out.reshape(Tp, H)[:T].reshape(B, S, H)


def moe_mlp_dense_oracle(p: dict, x: jax.Array, num_experts_per_tok: int,
                         norm_topk_prob: bool = True) -> jax.Array:
    """Reference semantics (HF Qwen3MoeSparseMoeBlock expert loop): every
    token's top-k experts computed densely. Test oracle only."""
    B, S, H = x.shape
    xt = x.reshape(-1, H)
    topv, topi = route(p["router"]["kernel"], xt,
                       num_experts_per_tok, norm_topk_prob)
    wg = p["experts"]["gate"]["kernel"]
    wu = p["experts"]["up"]["kernel"]
    wd = p["experts"]["down"]["kernel"]
    out = jnp.zeros_like(xt)
    for e in range(wg.shape[0]):
        fe = (jax.nn.silu(xt @ wg[e]) * (xt @ wu[e])) @ wd[e]
        we = jnp.sum(jnp.where(topi == e, topv, 0.0), axis=-1)
        out = out + fe * we[:, None]
    return out.reshape(B, S, H)


def load_balancing_loss(router_kernel: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """Switch-style auxiliary load-balance loss: E * sum_e f_e * P_e, where
    f_e is the fraction of tokens whose top-k includes expert e and P_e the
    mean router probability. For MoE fine-tuning; the reference never trains
    its judge, so this is opt-in."""
    T = x.shape[0] * x.shape[1] if x.ndim == 3 else x.shape[0]
    xt = x.reshape(T, -1)
    logits = xt.astype(jnp.float32) @ router_kernel.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    E = probs.shape[-1]
    _, topi = jax.lax.top_k(probs, k)
    f = jnp.mean(jax.nn.one_hot(topi, E, dtype=jnp.float32).sum(1), axis=0)
    return E * jnp.sum(f * probs.mean(0)) / k
