"""Qwen3-Next (hybrid gated-DeltaNet / gated-attention MoE) — the judge model.

The reference's judge is literally Qwen/Qwen3-Next-80B-A3B-Instruct served on
vLLM at TP=4 (reference train/serve_llm/serve_qwen3.sh:11-17). models/moe.py
hosts the plain Qwen3-MoE family; THIS module hosts the actual Qwen3-Next
architecture natively:

- 3:1 hybrid layer pattern — three gated-DeltaNet linear-attention layers,
  then one gated full-attention layer (partial RoPE, sigmoid output gate);
- gated DeltaNet: depthwise causal conv over the fused q/k/v stream, qk
  l2-norm, decay g = -exp(A_log)*softplus(a + dt_bias), write strength
  beta = sigmoid(b), delta-rule state S in float32;
- MoE MLP in every layer: Qwen3-MoE top-k routing (reuses models/moe.py,
  including the ragged-decode and GMM-prefill Pallas kernels) PLUS a shared
  expert scaled by a sigmoid gate;
- zero-centered RMSNorm everywhere ((1 + w) * normed — HF Qwen3NextRMSNorm).

TPU-first design, not a torch translation:
- layers are STACKED per role and scanned — params carry a leading
  [G = layers/4] axis (full-attention role) and [G, 3] axes (linear role);
  one lax.scan over groups with an inner scan over the 3 linear sublayers
  traces each role once instead of 48 times;
- the chunked delta rule is matmul-only: the per-chunk unit-lower-triangular
  inverse (I - M)^{-1} (HF runs a sequential python loop over 64 rows,
  modeling_qwen3_next.py:486-489) is computed by log-depth Neumann doubling
  Prod_j (I + M^(2^j)) — six batched [64,64] matmuls on the MXU, no
  row-serial dependency;
- the recurrent decode state is CONSTANT-SIZE ([B, nv, dk, dv] per linear
  layer + a [B, K-1, conv_dim] conv tail): 36 of 48 layers need no KV cache
  growth at all, so long-context judge serving is paged-KV-light by
  construction;
- right-padded batches (the engine convention) are exact via "pause"
  masking: pad positions get g = 0 (no decay) and beta = 0 (no state write),
  and the conv tail is gathered at each row's true length — equivalent to
  the pad tokens not existing (HF instead requires left padding,
  modeling_qwen3_next.py:1057-1067).

Numerics parity anchor: HF Qwen3NextForCausalLM torch fallback paths
(torch_chunk_gated_delta_rule / torch_recurrent_gated_delta_rule,
modeling_qwen3_next.py:442-561) — pinned by tests/test_qwen3_next.py.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import linear, rotate_half, rotary_inv_freq, swiglu_mlp
from .moe import moe_mlp


@dataclass(frozen=True)
class Qwen3NextConfig:
    vocab_size: int = 151936
    hidden_size: int = 2048
    intermediate_size: int = 5632          # dense MLP (only if num_experts=0)
    num_hidden_layers: int = 48
    full_attention_interval: int = 4       # every 4th layer is full attention
    # full attention (gated, partial RoPE)
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    head_dim: int = 256
    partial_rotary_factor: float = 0.25
    rope_theta: float = 10_000_000.0
    rms_norm_eps: float = 1e-6
    # gated DeltaNet
    linear_num_key_heads: int = 16
    linear_num_value_heads: int = 32
    linear_key_head_dim: int = 128
    linear_value_head_dim: int = 128
    linear_conv_kernel_dim: int = 4
    # MoE (every layer; shared expert on top of the routed experts)
    num_experts: int = 512
    num_experts_per_tok: int = 10
    moe_intermediate_size: int = 512
    shared_expert_intermediate_size: int = 512
    norm_topk_prob: bool = True
    moe_capacity_factor: float = 0.0       # judge default: exact, no drops
    moe_group_size: int = 256
    moe_ragged_decode: bool = True         # ops/moe_ragged.py on decode steps
    moe_gmm_prefill: bool = True           # ops/moe_gmm.py on prefill
    # route LARGE-batch decode steps (T = B > RAGGED_MAX_TOKENS: judge
    # bursts, spec verify windows) through the sorted GMM instead of the
    # Ex-oversized exact einsum. Token-exact (test_next_large_batch_
    # decode_gmm) but OPT-IN: the r5 on-chip probe hit a TPU worker
    # kernel fault at B=64 inside the decode scan (the same kernel is
    # chip-proven at prefill shapes) — r6 must root-cause the small-
    # block-rows decode geometry before this defaults on.
    moe_gmm_decode: bool = False
    # full-attention prefill impl: "auto" = Pallas flash on TPU (the dense
    # path materializes [B, nh, S, S] scores — OOM at the judge's 32k
    # max-model-len, serve_qwen3.sh:14), XLA dense elsewhere/decode.
    attn_impl: str = "auto"                # auto | flash | xla
    # serving quantization knobs (engine-set via cfg.replace — cfg is the
    # one static object every jit already closes over):
    # kv_quant="int8": the 12/48 full-attention layers' KV strips store
    # int8 with per-token/head scales FACTORED out of both attention dots
    # (models/decoder.py's scheme) — halves the 32k-context judge KV.
    # act_quant="int8": W8A8 prefill linears on the integer MXU (dynamic
    # per-token activation int8; needs int8 weight leaves, no-op on float).
    kv_quant: str | None = None            # None | "int8"
    act_quant: str | None = None           # None | "int8" (prefill only)
    tie_word_embeddings: bool = False
    eos_token_id: int = 151645
    pad_token_id: int = 151643
    dtype: str = "bfloat16"

    def replace(self, **kw) -> "Qwen3NextConfig":
        return dataclasses.replace(self, **kw)

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def linear_key_dim(self) -> int:
        return self.linear_num_key_heads * self.linear_key_head_dim

    @property
    def linear_value_dim(self) -> int:
        return self.linear_num_value_heads * self.linear_value_head_dim

    @property
    def conv_dim(self) -> int:
        return 2 * self.linear_key_dim + self.linear_value_dim

    @property
    def num_groups(self) -> int:
        assert self.num_hidden_layers % self.full_attention_interval == 0
        return self.num_hidden_layers // self.full_attention_interval


def qwen3_next_80b_a3b() -> Qwen3NextConfig:
    """Qwen/Qwen3-Next-80B-A3B-Instruct — the reference judge
    (serve_qwen3.sh:11). Defaults above ARE this checkpoint's shape."""
    return Qwen3NextConfig()


def is_qwen3_next_config(cfg) -> bool:
    """THE model-family dispatch predicate (apps/common.build_model,
    engine/server.ChatEngine) — one place, isinstance-based."""
    return isinstance(cfg, Qwen3NextConfig)


# --------------------------------------------------------------------- norms


def rms_norm_zc(w: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    """Zero-centered RMSNorm (HF Qwen3NextRMSNorm): scale is (1 + w), the
    product stays in float32 until the final cast."""
    x32 = x.astype(jnp.float32)
    normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (normed * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def rms_norm_gated(w: jax.Array, x: jax.Array, z: jax.Array,
                   eps: float) -> jax.Array:
    """Gated RMSNorm (HF Qwen3NextRMSNormGated): norm-before-gate, standard
    (ones-centered) weight, gate applied as silu(z) in float32."""
    x32 = x.astype(jnp.float32)
    normed = (x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                                  + eps)).astype(x.dtype)
    h = w.astype(x.dtype) * normed
    return (h.astype(jnp.float32)
            * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)


def _l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + eps)


# ---------------------------------------------------------------- delta rule


def _tri_inverse(m: jax.Array) -> jax.Array:
    """(I - M)^{-1} for strictly-lower-triangular M [..., c, c] via Neumann
    doubling: Prod_j (I + M^(2^j)). M is nilpotent (M^c = 0), so
    ceil(log2(c)) rounds are exact — batched MXU matmuls instead of the
    reference's row-sequential substitution loop."""
    c = m.shape[-1]
    eye = jnp.eye(c, dtype=m.dtype)
    result = eye + m
    power = m
    steps = max(int(np.ceil(np.log2(c))), 1)
    for _ in range(steps - 1):
        power = power @ power
        result = result + power @ result
    return result


def chunk_gated_delta_rule(q: jax.Array, k: jax.Array, v: jax.Array,
                           g: jax.Array, beta: jax.Array,
                           chunk_size: int = 64,
                           initial_state: jax.Array | None = None,
                           ) -> tuple[jax.Array, jax.Array]:
    """Chunked gated delta rule (prefill path).

    q, k: [B, S, H, dk] (kv heads already repeated to H), v: [B, S, H, dv],
    g (log decay, <= 0), beta (write strength): [B, S, H]. Pad/pause
    positions must arrive with g = 0 and beta = 0 — they then neither decay
    nor write the state (the right-padding exactness contract).

    Returns (out [B, S, H, dv] in v.dtype, final_state [B, H, dk, dv] f32).
    Matches HF torch_chunk_gated_delta_rule (use_qk_l2norm_in_kernel=True)
    including the in-kernel qk l2-norm and dk^-0.5 query scale.
    """
    B, S, H, dk = q.shape
    dv = v.shape[-1]
    c = chunk_size
    pad = (-S) % c
    q32 = _l2norm(q.astype(jnp.float32)) * (dk ** -0.5)
    k32 = _l2norm(k.astype(jnp.float32))
    v32 = v.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    b32 = beta.astype(jnp.float32)
    if pad:
        q32, k32, v32 = (jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
                         for x in (q32, k32, v32))
        # zero g/beta on the tail = pause (same trick HF uses for its pad)
        g32, b32 = (jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                    for x in (g32, b32))
    nc = (S + pad) // c

    def chunked(x, d):
        return x.reshape(B, nc, c, H, d).transpose(0, 3, 1, 2, 4)  # [B,H,nc,c,d]

    qc, kc, vc = chunked(q32, dk), chunked(k32, dk), chunked(v32, dv)
    gc = g32.reshape(B, nc, c, H).transpose(0, 3, 1, 2)            # [B,H,nc,c]
    bc = b32.reshape(B, nc, c, H).transpose(0, 3, 1, 2)

    gcs = jnp.cumsum(gc, axis=-1)                                  # within-chunk
    # decay[i, j] = exp(g_i - g_j) for j <= i. Mask the EXPONENT, not the
    # exp: at masked (upper) positions g_i - g_j >= 0 can overflow to inf,
    # and where(mask, inf, 0)'s VJP is 0 * inf = NaN — the whole backward
    # would be poisoned (found by the HF golden-gradient test).
    tril = jnp.tril(jnp.ones((c, c), dtype=bool))
    diff = jnp.where(tril, gcs[..., :, None] - gcs[..., None, :], 0.0)
    decay = jnp.where(tril, jnp.exp(diff), 0.0)
    k_beta = kc * bc[..., None]
    v_beta = vc * bc[..., None]
    m = -jnp.where(jnp.tril(jnp.ones((c, c), dtype=bool), -1),
                   jnp.einsum("bhnik,bhnjk->bhnij", k_beta, kc) * decay, 0.0)
    t_inv = _tri_inverse(m)                                        # (I - M)^-1
    v_prime = jnp.einsum("bhnij,bhnjd->bhnid", t_inv, v_beta)
    k_cumdecay = jnp.einsum("bhnij,bhnjd->bhnid", t_inv,
                            k_beta * jnp.exp(gcs)[..., None])

    state0 = (jnp.zeros((B, H, dk, dv), jnp.float32)
              if initial_state is None else initial_state.astype(jnp.float32))

    def body(state, xs):
        q_i, k_i, v_i, kcd_i, g_i, dec_i = xs                      # [B,H,c,*]
        attn = jnp.where(tril,   # incl. diagonal (dec_i is already masked)
                         jnp.einsum("bhik,bhjk->bhij", q_i, k_i) * dec_i, 0.0)
        v_new = v_i - kcd_i @ state
        out_i = (q_i * jnp.exp(g_i)[..., None]) @ state + attn @ v_new
        g_last = g_i[..., -1]
        state = (state * jnp.exp(g_last)[..., None, None]
                 + jnp.einsum("bhck,bhcd->bhkd",
                              k_i * jnp.exp(g_last[..., None] - g_i)[..., None],
                              v_new))
        return state, out_i

    xs = tuple(x.transpose(2, 0, 1, 3, 4) for x in (qc, kc, v_prime,
                                                    k_cumdecay)) \
        + (gcs.transpose(2, 0, 1, 3), decay.transpose(2, 0, 1, 3, 4))
    final_state, out = jax.lax.scan(body, state0, xs)
    out = out.transpose(1, 2, 0, 3, 4).reshape(B, H, nc * c, dv)
    out = out[:, :, :S].transpose(0, 2, 1, 3)                      # [B,S,H,dv]
    return out.astype(v.dtype), final_state


def recurrent_gated_delta_step(q: jax.Array, k: jax.Array, v: jax.Array,
                               g: jax.Array, beta: jax.Array,
                               state: jax.Array,
                               ) -> tuple[jax.Array, jax.Array]:
    """One-token gated delta rule (decode path). q, k: [B, H, dk],
    v: [B, H, dv], g/beta: [B, H], state: [B, H, dk, dv] f32.
    HF torch_recurrent_gated_delta_rule semantics."""
    dk = q.shape[-1]
    q32 = _l2norm(q.astype(jnp.float32)) * (dk ** -0.5)
    k32 = _l2norm(k.astype(jnp.float32))
    v32 = v.astype(jnp.float32)
    state = state * jnp.exp(g.astype(jnp.float32))[..., None, None]
    kv_mem = jnp.einsum("bhk,bhkd->bhd", k32, state)
    delta = (v32 - kv_mem) * beta.astype(jnp.float32)[..., None]
    state = state + jnp.einsum("bhk,bhd->bhkd", k32, delta)
    out = jnp.einsum("bhk,bhkd->bhd", q32, state)
    return out.astype(v.dtype), state


# ------------------------------------------------------------ DeltaNet layer


def _split_qkvz_ba(cfg: Qwen3NextConfig, qkvz: jax.Array, ba: jax.Array):
    """HF fix_query_key_value_ordering: the fused projections interleave
    per-key-head [q | k | v-group | z-group] blocks (and [b-group | a-group])
    — modeling_qwen3_next.py:631-658."""
    *lead, _ = qkvz.shape
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    hk, hv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    r = nv // nk
    qkvz = qkvz.reshape(*lead, nk, 2 * hk + 2 * r * hv)
    q = qkvz[..., :hk]
    k = qkvz[..., hk:2 * hk]
    v = qkvz[..., 2 * hk:2 * hk + r * hv].reshape(*lead, nv, hv)
    z = qkvz[..., 2 * hk + r * hv:].reshape(*lead, nv, hv)
    ba = ba.reshape(*lead, nk, 2 * r)
    b = ba[..., :r].reshape(*lead, nv)
    a = ba[..., r:].reshape(*lead, nv)
    return q, k, v, z, b, a


def _deltanet_gb(p: dict, b: jax.Array, a: jax.Array):
    """beta = sigmoid(b); g = -exp(A_log) * softplus(a + dt_bias), float32
    (HF computes A in float regardless of model dtype)."""
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = -jnp.exp(p["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    return g, beta


def _deltanet_prefill(cfg: Qwen3NextConfig, p: dict, h: jax.Array,
                      valid: jax.Array | None, lengths: jax.Array | None,
                      chunk_size: int, want_state: bool, init=None):
    """Gated DeltaNet over a (right-padded) sequence. init = (conv_tail
    [B, K-1, conv_dim], rec_state [B, nv, dk, dv]) continues from a cached
    prefix (prefill_continue); None starts fresh (a zero conv tail is
    exactly the left zero-padding of a fresh causal conv).
    Returns (out [B, S, H], (conv_tail, state) or None)."""
    B, S, _ = h.shape
    K = cfg.linear_conv_kernel_dim
    aq = cfg.act_quant
    pq = None
    if aq == "int8" and "kernel_q" in p["qkvz"]:
        from .layers import quantize_act

        pq = quantize_act(h)   # qkvz/ba share one activation quantization
    qkvz = linear(p["qkvz"], h, aq, pq)
    ba = linear(p["ba"], h, aq, pq)
    q, k, v, z, b, a = _split_qkvz_ba(cfg, qkvz, ba)
    mixed = jnp.concatenate([q.reshape(B, S, -1), k.reshape(B, S, -1),
                             v.reshape(B, S, -1)], -1)
    conv_tail_in = (init[0] if init is not None
                    else jnp.zeros((B, K - 1, mixed.shape[-1]), mixed.dtype))
    window = jnp.concatenate([conv_tail_in, mixed], 1)   # [B, K-1+S, D]
    w = p["conv"].astype(window.dtype)
    conv_out = jax.nn.silu(
        sum(window[:, j:j + S, :] * w[:, j] for j in range(K)))
    kd, vd = cfg.linear_key_dim, cfg.linear_value_dim
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    q = conv_out[..., :kd].reshape(B, S, nk, cfg.linear_key_head_dim)
    k = conv_out[..., kd:2 * kd].reshape(B, S, nk, cfg.linear_key_head_dim)
    v = conv_out[..., 2 * kd:].reshape(B, S, nv, cfg.linear_value_head_dim)
    g, beta = _deltanet_gb(p, b, a)
    if valid is not None:
        # pause semantics at pad positions: no decay, no write
        g = g * valid[..., None]
        beta = beta * valid[..., None]
    r = nv // nk
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    out, state = chunk_gated_delta_rule(
        q, k, v, g, beta, chunk_size=chunk_size,
        initial_state=init[1] if init is not None else None)
    out = rms_norm_gated(p["norm"], out, z, cfg.rms_norm_eps)
    out = linear(p["out"], out.reshape(B, S, -1), aq)
    new_cache = None
    if want_state:
        tail_len = lengths if lengths is not None \
            else jnp.full((B,), S, jnp.int32)
        conv_tail = jax.vmap(
            lambda row, n: jax.lax.dynamic_slice(
                row, (n, 0), (K - 1, row.shape[-1])))(window, tail_len)
        new_cache = (conv_tail, state)
    return out, new_cache


def _deltanet_decode(cfg: Qwen3NextConfig, p: dict, h: jax.Array,
                     conv_state: jax.Array, state: jax.Array):
    """One-token DeltaNet step. h [B, 1, H]; conv_state [B, K-1, conv_dim];
    state [B, nv, dk, dv] f32."""
    B = h.shape[0]
    qkvz = linear(p["qkvz"], h)
    ba = linear(p["ba"], h)
    q, k, v, z, b, a = _split_qkvz_ba(cfg, qkvz, ba)
    mixed = jnp.concatenate([q.reshape(B, 1, -1), k.reshape(B, 1, -1),
                             v.reshape(B, 1, -1)], -1)
    window = jnp.concatenate([conv_state, mixed], 1)      # [B, K, conv_dim]
    w = p["conv"].astype(window.dtype)                    # [conv_dim, K]
    conv_out = jax.nn.silu(jnp.einsum("bkd,dk->bd", window, w))
    new_conv_state = window[:, 1:]
    kd = cfg.linear_key_dim
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    q = conv_out[:, :kd].reshape(B, nk, cfg.linear_key_head_dim)
    k = conv_out[:, kd:2 * kd].reshape(B, nk, cfg.linear_key_head_dim)
    v = conv_out[:, 2 * kd:].reshape(B, nv, cfg.linear_value_head_dim)
    g, beta = _deltanet_gb(p, b[:, 0], a[:, 0])
    r = nv // nk
    if r > 1:
        q = jnp.repeat(q, r, axis=1)
        k = jnp.repeat(k, r, axis=1)
    out, state = recurrent_gated_delta_step(q, k, v, g, beta, state)
    out = rms_norm_gated(p["norm"], out[:, None], z, cfg.rms_norm_eps)
    out = linear(p["out"], out.reshape(B, 1, -1))
    return out, (new_conv_state, state)


# ------------------------------------------------------- full-attention layer


def _rope_cos_sin(cfg: Qwen3NextConfig, positions: jax.Array):
    """positions [B, S] -> cos/sin [B, S, rotary_dim] (float32)."""
    inv = rotary_inv_freq(cfg.rotary_dim, cfg.rope_theta)
    freqs = positions.astype(jnp.float32)[..., None] * inv
    emb = jnp.concatenate([freqs, freqs], -1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_partial_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
                        rot: int) -> jax.Array:
    """Rotary on the first `rot` dims only (partial_rotary_factor), fp32."""
    x32 = x.astype(jnp.float32)
    x_rot, x_pass = x32[..., :rot], x32[..., rot:]
    c, s = cos[:, :, None, :], sin[:, :, None, :]
    x_rot = x_rot * c + rotate_half(x_rot) * s
    return jnp.concatenate([x_rot, x_pass], -1).astype(x.dtype)


def _gated_attn_qkv(cfg: Qwen3NextConfig, p: dict, h: jax.Array,
                    rope: tuple[jax.Array, jax.Array], aq=None):
    """Projections + per-head-dim zero-centered qk norm + partial RoPE +
    the sigmoid output gate stream. Returns q, k, v, gate. `rope` is the
    (cos, sin) pair — computed ONCE per forward by the caller (it is
    loop-invariant and XLA does not hoist it out of the group scan).
    aq="int8": W8A8 projections (prefill — the caller gates on phase);
    q/k/v share one activation quantization."""
    B, S, _ = h.shape
    nh, kh, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    pq = None
    if aq == "int8" and "kernel_q" in p["q"]:
        from .layers import quantize_act

        pq = quantize_act(h)
    qg = linear(p["q"], h, aq, pq).reshape(B, S, nh, 2 * hd)
    q, gate = qg[..., :hd], qg[..., hd:].reshape(B, S, nh * hd)
    k = linear(p["k"], h, aq, pq).reshape(B, S, kh, hd)
    v = linear(p["v"], h, aq, pq).reshape(B, S, kh, hd)
    q = rms_norm_zc(p["q_norm"], q, cfg.rms_norm_eps)
    k = rms_norm_zc(p["k_norm"], k, cfg.rms_norm_eps)
    cos, sin = rope
    rot = cfg.rotary_dim
    q = _apply_partial_rope(q, cos, sin, rot)
    k = _apply_partial_rope(k, cos, sin, rot)
    return q, k, v, gate


def _attn_core(cfg: Qwen3NextConfig, q: jax.Array, k: jax.Array,
               v: jax.Array, mask: jax.Array) -> jax.Array:
    """Dense attention with GQA repeat. q [B,Sq,nh,hd], k/v [B,Sk,kh,hd],
    mask [B, 1 | Sq, Sk] bool (True = attend)."""
    B, Sq, nh, hd = q.shape
    rep = nh // k.shape[2]
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
    scores = jnp.where(mask[:, None, :, :] if mask.ndim == 3 else mask,
                       scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Sq, nh * hd)


def _attn_core_q(cfg: Qwen3NextConfig, q: jax.Array, kq: jax.Array,
                 vq: jax.Array, ks: jax.Array, vs: jax.Array,
                 mask: jax.Array) -> jax.Array:
    """Dense attention over an int8 KV with the per-token/head scales
    FACTORED out of both dots (models/decoder.py's scheme — a naively
    dequantized operand would materialize the full bf16 KV and erase the
    capacity win). kq/vq [B,Sk,kh,hd] int8; ks/vs [B,Sk,kh] f32."""
    B, Sq, nh, hd = q.shape
    rep = nh // kq.shape[2]
    kq = jnp.repeat(kq, rep, axis=2)
    vq = jnp.repeat(vq, rep, axis=2)
    ks = jnp.repeat(ks, rep, axis=2)
    vs = jnp.repeat(vs, rep, axis=2)
    scores = (jnp.einsum("bqhd,bkhd->bhqk", q, kq.astype(q.dtype))
              .astype(jnp.float32)
              * ks.transpose(0, 2, 1)[:, :, None, :] * (hd ** -0.5))
    scores = jnp.where(mask[:, None, :, :] if mask.ndim == 3 else mask,
                       scores, -jnp.inf)
    probs = jax.nn.softmax(scores, -1)
    pv = (probs * vs.transpose(0, 2, 1)[:, :, None, :]).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", pv, vq.astype(q.dtype)
                      ).reshape(B, Sq, nh * hd)


def _use_flash(cfg: Qwen3NextConfig, S: int, mesh) -> bool:
    if cfg.attn_impl == "xla" or S <= 8:
        return False
    if mesh is not None:
        tp = dict(mesh.shape).get("tp", 1)
        if tp > 1 and (cfg.num_attention_heads % tp
                       or cfg.num_key_value_heads % tp):
            return False   # flash+mesh needs head-divisible tp
    if cfg.attn_impl == "flash":
        return True
    return jax.default_backend() == "tpu"   # "auto"


def _full_attn_prefill(cfg: Qwen3NextConfig, p: dict, h: jax.Array,
                       rope: tuple, want_state: bool,
                       lengths: jax.Array | None = None, mesh=None):
    B, S, _ = h.shape
    q, k, v, gate = _gated_attn_qkv(cfg, p, h, rope, aq=cfg.act_quant)
    if _use_flash(cfg, S, mesh):
        from ..ops.flash import flash_attention

        kvl = lengths if lengths is not None \
            else jnp.full((B,), S, jnp.int32)
        out = flash_attention(
            q, k, v, kv_lengths=kvl, causal=True, mesh=mesh,
            interpret=jax.default_backend() != "tpu"
        ).reshape(B, S, -1)
    else:
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None]
        out = _attn_core(cfg, q, k, v, mask)
    out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
    out = linear(p["o"], out, cfg.act_quant)
    return out, ((k, v) if want_state else None)


def _write_rows(cache3, rows, cur):
    """Scatter [B, W, ...] rows into a [B, Smax, ...] per-row buffer at each
    row's frontier (3-d values or 2-d scales)."""
    if cache3.ndim == 4:
        return jax.vmap(lambda c, x, n: jax.lax.dynamic_update_slice(
            c, x, (n, 0, 0)))(cache3, rows, cur)
    return jax.vmap(lambda c, x, n: jax.lax.dynamic_update_slice(
        c, x, (n, 0)))(cache3, rows, cur)


def _kv_write(kv: tuple, k: jax.Array, v: jax.Array, cur: jax.Array):
    """Write new K/V rows at the frontier. kv = (k, v) bf16 strips or
    (kq, vq, ks, vs) int8 strips + scales (rows quantize on the way in —
    the int8 KV contract of models/decoder.py, applied per strip)."""
    if len(kv) == 4:
        from .decoder import quantize_kv

        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        return (_write_rows(kv[0], kq, cur), _write_rows(kv[1], vq, cur),
                _write_rows(kv[2], ks, cur), _write_rows(kv[3], vs, cur))
    return (_write_rows(kv[0], k, cur), _write_rows(kv[1], v, cur))


def _kv_attn(cfg: Qwen3NextConfig, q: jax.Array, kv: tuple,
             mask: jax.Array) -> jax.Array:
    if len(kv) == 4:
        return _attn_core_q(cfg, q, kv[0], kv[1], kv[2], kv[3], mask)
    return _attn_core(cfg, q, kv[0], kv[1], mask)


def _full_attn_decode(cfg: Qwen3NextConfig, p: dict, h: jax.Array,
                      kv: tuple, cur_len: jax.Array, rope: tuple):
    """h [B, 1, H]; kv = bf16 (k, v) [B, Smax, kh, hd] strips or int8
    (kq, vq, ks, vs); cur_len [B] = the position this token writes (and
    the number of valid cached keys before it)."""
    q, k, v, gate = _gated_attn_qkv(cfg, p, h, rope)
    kv = _kv_write(kv, k, v, cur_len)
    Smax = kv[0].shape[1]
    mask = (jnp.arange(Smax)[None] <= cur_len[:, None])[:, None, :]
    out = _kv_attn(cfg, q, kv, mask)
    out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
    return linear(p["o"], out), kv


# ------------------------------------------------------------------ MLP/MoE


def _next_mlp(cfg: Qwen3NextConfig, p: dict, x: jax.Array,
              is_decode: bool, mesh=None) -> jax.Array:
    # mesh: enables the SHARDED ragged/GMM expert kernels (shard_map over
    # ep x tp) — the pure-einsum path needs no mesh (GSPMD shards it from
    # the param annotations alone)
    """Routed experts (models/moe.py — including the ragged/GMM kernels)
    plus the shared expert scaled by sigmoid(shared_expert_gate(x))."""
    if cfg.num_experts > 0:
        # moe_mlp's own dispatch picks ragged for small steps
        # (T <= RAGGED_MAX_TOKENS) and the sorted GMM otherwise; decode
        # reaches the GMM only via the OPT-IN cfg.moe_gmm_decode (see the
        # config field's note on the r5 on-chip kernel fault)
        gmm = (cfg.moe_gmm_decode if is_decode else cfg.moe_gmm_prefill)
        routed = moe_mlp(
            {"router": p["router"], "experts": p["experts"]}, x,
            cfg.num_experts_per_tok, cfg.norm_topk_prob,
            capacity_factor=cfg.moe_capacity_factor,
            group_size=cfg.moe_group_size, mesh=mesh,
            ragged_decode=cfg.moe_ragged_decode and is_decode,
            gmm_prefill=gmm)
        aq = None if is_decode else cfg.act_quant
        shared = swiglu_mlp(p["shared"], x, act_quant=aq)
        sgate = jax.nn.sigmoid(
            linear(p["shared_gate"], x).astype(jnp.float32)).astype(x.dtype)
        return routed + shared * sgate
    return swiglu_mlp(p["mlp"], x, act_quant=None if is_decode
                      else cfg.act_quant)


# ------------------------------------------------------------------- forward


class Qwen3NextCache(NamedTuple):
    """Hybrid cache. conv [G, 3, B, K-1, conv_dim]; rec [G, 3, B, nv, dk, dv]
    float32; k/v [G, B, Smax, kh, hd]; length [B] current positions."""
    conv: jax.Array
    rec: jax.Array
    k: jax.Array
    v: jax.Array
    length: jax.Array


class QuantNextCache(NamedTuple):
    """cfg.kv_quant="int8" hybrid cache: the full-attention KV strips store
    int8 with per-(token, head) absmax scales (decoder.quantize_kv) — the
    DeltaNet conv/rec states are O(1)-size and stay float. Halves the
    32k-context KV of the 12/48 full-attention judge layers
    (serve_qwen3.sh:14)."""
    conv: jax.Array
    rec: jax.Array
    k: jax.Array          # [G, B, Smax, kh, hd] int8
    v: jax.Array          # [G, B, Smax, kh, hd] int8
    k_scale: jax.Array    # [G, B, Smax, kh] f32
    v_scale: jax.Array    # [G, B, Smax, kh] f32
    length: jax.Array


def _lin_sublayer(cfg, h, lp, valid, lengths, chunk_size, want_state,
                  mesh=None):
    res = h
    hn = rms_norm_zc(lp["in_norm"], h, cfg.rms_norm_eps)
    attn_out, st = _deltanet_prefill(cfg, lp, hn, valid, lengths,
                                     chunk_size, want_state)
    h = res + attn_out
    res = h
    hn = rms_norm_zc(lp["post_norm"], h, cfg.rms_norm_eps)
    h = res + _next_mlp(cfg, lp, hn, is_decode=False, mesh=mesh)
    return h, st


def _full_sublayer(cfg, h, fp, rope, want_state, lengths=None, mesh=None):
    res = h
    hn = rms_norm_zc(fp["in_norm"], h, cfg.rms_norm_eps)
    attn_out, st = _full_attn_prefill(cfg, fp, hn, rope, want_state,
                                      lengths=lengths, mesh=mesh)
    h = res + attn_out
    res = h
    hn = rms_norm_zc(fp["post_norm"], h, cfg.rms_norm_eps)
    h = res + _next_mlp(cfg, fp, hn, is_decode=False, mesh=mesh)
    return h, st


def _run_prefill(params: dict, cfg: Qwen3NextConfig, h: jax.Array,
                 lengths: jax.Array | None, chunk_size: int,
                 want_cache: bool, mesh=None):
    B, S, _ = h.shape
    valid = None
    if lengths is not None:
        valid = (jnp.arange(S)[None] < lengths[:, None]).astype(jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    rope = _rope_cos_sin(cfg, positions)   # loop-invariant: computed once

    def group_body(h, gp):
        def lin_body(h, lp):
            return _lin_sublayer(cfg, h, lp, valid, lengths, chunk_size,
                                 want_cache, mesh=mesh)
        h, lin_states = jax.lax.scan(lin_body, h, gp["lin"])
        h, full_state = _full_sublayer(cfg, h, gp["full"], rope,
                                       want_cache, lengths=lengths,
                                       mesh=mesh)
        return h, (lin_states, full_state)

    h, states = jax.lax.scan(group_body, h, params["groups"])
    h = rms_norm_zc(params["final_norm"], h, cfg.rms_norm_eps)
    cache = None
    if want_cache:
        (conv, rec), (k, v) = states
        cache = Qwen3NextCache(
            conv=conv, rec=rec, k=k, v=v,
            length=(lengths if lengths is not None
                    else jnp.full((B,), S, jnp.int32)))
    return h, cache


def forward(params: dict, cfg: Qwen3NextConfig, input_ids: jax.Array,
            lengths: jax.Array | None = None,
            chunk_size: int = 64, mesh=None) -> jax.Array:
    """Full-sequence logits [B, S, V] (no cache) — training / golden path."""
    h = params["embed"]["weight"][input_ids]
    h, _ = _run_prefill(params, cfg, h, lengths, chunk_size,
                        want_cache=False, mesh=mesh)
    return _lm_head(params, cfg, h)


def _lm_head(params: dict, cfg: Qwen3NextConfig, h: jax.Array) -> jax.Array:
    if cfg.tie_word_embeddings:
        return h @ params["embed"]["weight"].T
    return linear(params["lm_head"], h)


def prefill(params: dict, cfg: Qwen3NextConfig, input_ids: jax.Array,
            lengths: jax.Array, max_len: int,
            chunk_size: int = 64, mesh=None
            ) -> tuple[jax.Array, Qwen3NextCache]:
    """Right-padded prompt prefill. Returns (last-valid-position logits
    [B, V], cache with KV buffers sized to max_len)."""
    B, S = input_ids.shape
    h = params["embed"]["weight"][input_ids]
    h, cache = _run_prefill(params, cfg, h, lengths, chunk_size,
                            want_cache=True, mesh=mesh)
    last = h[jnp.arange(B), lengths - 1]
    logits = _lm_head(params, cfg, last)
    if cfg.kv_quant == "int8":
        cache = _quantize_next_cache(cache)
    if max_len > S:
        pad = ((0, 0), (0, 0), (0, max_len - S), (0, 0), (0, 0))
        kw = {"k": jnp.pad(cache.k, pad), "v": jnp.pad(cache.v, pad)}
        if isinstance(cache, QuantNextCache):
            spad = pad[:-1]
            # pad scales with ONES: a zero scale would make later writes'
            # dequant exact but 0 * uninitialized is fine either way —
            # ones keep the scale strictly positive (decoder.py contract)
            kw["k_scale"] = jnp.pad(cache.k_scale, spad, constant_values=1.0)
            kw["v_scale"] = jnp.pad(cache.v_scale, spad, constant_values=1.0)
        cache = cache._replace(**kw)
    return logits, cache


def _gmm_decode_barrier(cfg: Qwen3NextConfig, hn, state):
    """Serialize this layer's cache-state update against the sorted-GMM
    decode kernel (r6 worker-fault fix). XLA overlaps the decode scan's
    cache-strip dynamic_update_slice with the Pallas kernel's own DMAs,
    and at T = B > 32 decode geometries that concurrency FAULTS the TPU
    worker (scripts/gmm_fault_ablate.py: a stacked-layer scan + a carried-
    buffer DUS + the kernel crashes on chip; either ingredient alone
    passes, and the einsum control passes). One optimization_barrier over
    (h, state) pins the scatter before the kernel launch — the same repro
    then runs clean (onchip_r6/ablate_barrier.log). Active only on the
    opt-in moe_gmm_decode path; identity elsewhere."""
    if not cfg.moe_gmm_decode:
        return hn, state
    hn, state = jax.lax.optimization_barrier((hn, state))
    return hn, state


def decode_step(params: dict, cfg: Qwen3NextConfig, token: jax.Array,
                cache: Qwen3NextCache, mesh=None
                ) -> tuple[jax.Array, Qwen3NextCache]:
    """One decode step. token [B] int32 -> (logits [B, V], new cache)."""
    h = params["embed"]["weight"][token][:, None]                  # [B,1,H]
    rope = _rope_cos_sin(cfg, cache.length[:, None])  # once, not per group
    kv_fields = _cache_kv(cache)

    def group_body(h, xs):
        gp, conv_g, rec_g = xs[:3]
        kv_g = xs[3:]

        def lin_body(h, xs2):
            lp, conv_s, rec_s = xs2
            res = h
            hn = rms_norm_zc(lp["in_norm"], h, cfg.rms_norm_eps)
            out, (conv_s, rec_s) = _deltanet_decode(cfg, lp, hn, conv_s,
                                                    rec_s)
            h = res + out
            res = h
            hn = rms_norm_zc(lp["post_norm"], h, cfg.rms_norm_eps)
            hn, (conv_s, rec_s) = _gmm_decode_barrier(cfg, hn,
                                                      (conv_s, rec_s))
            h = res + _next_mlp(cfg, lp, hn, is_decode=True, mesh=mesh)
            return h, (conv_s, rec_s)

        h, (conv_g, rec_g) = jax.lax.scan(lin_body, h,
                                          (gp["lin"], conv_g, rec_g))
        res = h
        hn = rms_norm_zc(gp["full"]["in_norm"], h, cfg.rms_norm_eps)
        out, kv_g = _full_attn_decode(cfg, gp["full"], hn, kv_g,
                                      cache.length, rope)
        h = res + out
        res = h
        hn = rms_norm_zc(gp["full"]["post_norm"], h, cfg.rms_norm_eps)
        hn, kv_g = _gmm_decode_barrier(cfg, hn, tuple(kv_g))
        h = res + _next_mlp(cfg, gp["full"], hn, is_decode=True, mesh=mesh)
        return h, (conv_g, rec_g) + tuple(kv_g)

    h, st = jax.lax.scan(
        group_body, h, (params["groups"], cache.conv, cache.rec) + kv_fields)
    h = rms_norm_zc(params["final_norm"], h, cfg.rms_norm_eps)
    logits = _lm_head(params, cfg, h[:, 0])
    return logits, _rebuild_cache(cache, st[0], st[1], st[2:],
                                  cache.length + 1)


def _cache_kv(cache) -> tuple:
    """The cache's KV strip fields as a tuple — (k, v) for the bf16 cache,
    (k, v, k_scale, v_scale) for the int8 one."""
    if isinstance(cache, QuantNextCache):
        return (cache.k, cache.v, cache.k_scale, cache.v_scale)
    return (cache.k, cache.v)


def _rebuild_cache(old, conv, rec, kv: tuple, length):
    """Type-preserving cache rebuild (pin_kv_cache's lesson: a hand-rolled
    2-leaf rebuild once silently dropped scale pages)."""
    if isinstance(old, QuantNextCache):
        return QuantNextCache(conv=conv, rec=rec, k=kv[0], v=kv[1],
                              k_scale=kv[2], v_scale=kv[3], length=length)
    return Qwen3NextCache(conv=conv, rec=rec, k=kv[0], v=kv[1],
                          length=length)


class NextGenResult(NamedTuple):
    sequences: np.ndarray    # [B, max_new_tokens]
    lengths: np.ndarray      # [B] tokens up to and including the first EOS


# Module-level jits with hashable statics (frozen cfg / SamplingParams /
# Mesh): repeated engine calls at the same shapes hit the executable cache
# instead of re-tracing (a per-call lambda was recompiling every
# ChatEngine.chat_batch — measured 5.8 s/call vs ms on the tiny config).
@partial(jax.jit, static_argnames=("cfg", "max_len", "chunk_size", "mesh"))
def _prefill_jit(params, cfg, ids, lens, max_len, chunk_size, mesh):
    return prefill(params, cfg, ids, lens, max_len, chunk_size, mesh=mesh)


@partial(jax.jit, static_argnames=("cfg", "sp", "mesh"))
def _decode_scan_jit(params, cfg, cache, first, key, sp, mesh):
    from ..engine.sampling import sample_token

    def step(carry, _):
        cache, tok, key = carry
        logits, cache = decode_step(params, cfg, tok, cache, mesh=mesh)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits, sub, sp).astype(jnp.int32)
        return (cache, nxt, key), nxt

    (cache, _, _), rest = jax.lax.scan(step, (cache, first, key),
                                       length=sp.max_new_tokens - 1)
    return rest


def _decode_tail(params, cfg, logits, cache, sp, seed, mesh
                 ) -> NextGenResult:
    """Sample the first token from prefill logits, run the compiled decode
    scan for the remaining budget, apply the host-side EOS cut."""
    from ..engine.sampling import sample_token

    B = logits.shape[0]
    mnt = sp.max_new_tokens
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    first = sample_token(logits, sub, sp).astype(jnp.int32)
    rest = (_decode_scan_jit(params, cfg, cache, first, key, sp, mesh)
            if mnt > 1 else jnp.zeros((0, B), jnp.int32))
    seqs = np.asarray(jnp.concatenate([first[None], rest], 0).T)
    out_len = np.full((B,), mnt, np.int64)
    for eos in sp.eos_token_ids:
        hit = seqs == eos
        has = hit.any(1)
        out_len = np.where(has, np.minimum(out_len, hit.argmax(1) + 1),
                           out_len)
    return NextGenResult(sequences=seqs, lengths=out_len)


def generate_packed(params: dict, cfg: Qwen3NextConfig,
                    input_ids: np.ndarray, lengths: np.ndarray,
                    sp, seed: int = 0, mesh=None,
                    chunk_size: int = 64) -> NextGenResult:
    """Engine entry: right-padded prompts + engine SamplingParams (greedy /
    temperature / top-k / top-p — HF filter order via engine.sampling).
    The EOS cut is applied post-hoc on the host (the whole budget runs in
    one compiled scan; rows are truncated at their first EOS), so greedy
    output is token-exact vs per-row early-stopped decoding."""
    B, S = input_ids.shape
    ids = jnp.asarray(input_ids)
    lens = jnp.asarray(lengths, jnp.int32)
    logits, cache = _prefill_jit(params, cfg, ids, lens,
                                 S + sp.max_new_tokens, chunk_size, mesh)
    return _decode_tail(params, cfg, logits, cache, sp, seed, mesh)


def generate(params: dict, cfg: Qwen3NextConfig, input_ids: np.ndarray,
             lengths: np.ndarray, max_new_tokens: int,
             temperature: float = 0.0, seed: int = 0,
             chunk_size: int = 64, mesh=None) -> np.ndarray:
    """Batch generation from right-padded prompts. temperature == 0 is
    greedy (token-exact vs HF generate — pinned by tests). Returns
    [B, max_new_tokens] generated ids (rows keep generating past EOS; the
    caller truncates — engine semantics)."""
    from ..engine.sampling import SamplingParams

    sp = SamplingParams(do_sample=temperature > 0.0,
                        temperature=max(temperature, 1e-6),
                        max_new_tokens=max_new_tokens)
    return generate_packed(params, cfg, input_ids, lengths, sp, seed=seed,
                           mesh=mesh, chunk_size=chunk_size).sequences


# ---------------------------------------------------------------- training


def next_loss(params: dict, cfg: Qwen3NextConfig, input_ids: jax.Array,
              labels: jax.Array, lengths: jax.Array | None = None,
              chunk_size: int = 64) -> jax.Array:
    """Causal-LM loss (mean CE over labels != -100, ops/fused_ce — no
    [N, V] materialization). Differentiable end to end: the chunked delta
    rule, conv, gated norms, and MoE are pure jax ops (autodiff through
    the scans); grads match HF torch autograd (tests/test_qwen3_next.py).
    The reference never fine-tunes its judge — this is the beyond-parity
    path for training hybrid-architecture models on TPU."""
    from ..ops.fused_ce import fused_linear_cross_entropy

    # training forces the einsum MoE path like train/sft.py and
    # train/grpo.py do: the int8/W8A8 GMM and ragged kernels have no VJP
    # (only the float single-device GMM differentiates), so a QLoRA step
    # over an int8 base would crash under the judge preset's kernel flags
    if cfg.moe_gmm_prefill or cfg.moe_ragged_decode:
        cfg = cfg.replace(moe_gmm_prefill=False, moe_ragged_decode=False)
    h = params["embed"]["weight"][input_ids]
    h, _ = _run_prefill(params, cfg, h, lengths, chunk_size,
                        want_cache=False)
    if cfg.tie_word_embeddings:
        w = params["embed"]["weight"].T
    elif "kernel_q" in params["lm_head"]:
        # int8 base (QLoRA): the fused CE wants a float [H, V] — one
        # dequant per step, fused into the CE chunks by XLA
        from .quant import dequantize_kernel

        w = dequantize_kernel(params["lm_head"], dtype=h.dtype)
    else:
        w = params["lm_head"]["kernel"]
    return fused_linear_cross_entropy(h.reshape(-1, h.shape[-1]), w,
                                      labels.reshape(-1))


# LoRA targets for this family (train/lora.py is path-generic; stacked
# [G]/[G,3] kernels get stacked adapters). Routers stay full-precision.
NEXT_LORA_TARGETS = (
    ("qkvz", "kernel"), ("out", "kernel"),
    ("q", "kernel"), ("k", "kernel"), ("v", "kernel"), ("o", "kernel"),
    ("shared", "gate", "kernel"), ("shared", "up", "kernel"),
    ("shared", "down", "kernel"),
)


def make_next_lora_sft_step(base_params, cfg: Qwen3NextConfig, lora_cfg,
                            optimizer, donate: bool = True):
    """SFT step training ONLY adapters over a (possibly int8) Qwen3-Next
    base — the QLoRA structure, same contract as train/lora.py's
    make_lora_sft_step. batch = {input_ids, labels[, lengths]}."""
    import optax

    from ..train.lora import LoRATrainState, attach_lora

    def loss_fn(lora, batch):
        eff = attach_lora(base_params, lora, lora_cfg)
        return next_loss(eff, cfg, batch["input_ids"], batch["labels"],
                         batch.get("lengths"))

    def step_fn(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.lora, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.lora)
        lora = optax.apply_updates(state.lora, updates)
        return LoRATrainState(lora, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


# ----------------------------------------------- prefix reuse / continue


def _full_attn_continue(cfg: Qwen3NextConfig, p: dict, h: jax.Array,
                        k_cache: jax.Array, v_cache: jax.Array, P: int,
                        suffix_lengths: jax.Array, rope: tuple, mesh=None):
    """Suffix prefill attention: write the suffix's KV at static offset P,
    attend cached prefix + causal suffix."""
    B, S, _ = h.shape
    q, k, v, gate = _gated_attn_qkv(cfg, p, h, rope)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, P, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, P, 0, 0))
    kv_len = P + S
    k_win, v_win = k_cache[:, :kv_len], v_cache[:, :kv_len]
    if _use_flash(cfg, S, mesh):
        from ..ops.flash import flash_attention

        out = flash_attention(
            q, k_win, v_win, kv_lengths=P + suffix_lengths, causal=True,
            q_offset=P, mesh=mesh,
            interpret=jax.default_backend() != "tpu").reshape(B, S, -1)
    else:
        mask = (jnp.arange(kv_len)[None, None, :]
                <= (P + jnp.arange(S))[None, :, None])     # [1, S, kv_len]
        out = _attn_core(cfg, q, k_win, v_win, mask)
    out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
    return linear(p["o"], out), (k_cache, v_cache)


def prefill_continue(params: dict, cfg: Qwen3NextConfig,
                     input_ids: jax.Array, suffix_lengths: jax.Array,
                     cache: Qwen3NextCache, prefix_len: int,
                     chunk_size: int = 64, mesh=None
                     ) -> tuple[jax.Array, Qwen3NextCache]:
    """Prefill a right-padded SUFFIX batch on top of a cached prefix state
    (all rows share the same prefix_len — the judge-burst shape: one
    system+rubric prefix, many question suffixes). cache.k/v must be sized
    >= prefix_len + S (+ decode budget). Returns (last-valid logits [B, V],
    cache with length = prefix_len + suffix_lengths)."""
    B, S = input_ids.shape
    P = prefix_len
    h = params["embed"]["weight"][input_ids]
    valid = (jnp.arange(S)[None] < suffix_lengths[:, None]).astype(
        jnp.float32)
    positions = jnp.broadcast_to(P + jnp.arange(S)[None], (B, S))
    rope = _rope_cos_sin(cfg, positions)

    def group_body(h, xs):
        gp, conv_g, rec_g, k_g, v_g = xs

        def lin_body(h, xs2):
            lp, conv_s, rec_s = xs2
            res = h
            hn = rms_norm_zc(lp["in_norm"], h, cfg.rms_norm_eps)
            out, st = _deltanet_prefill(cfg, lp, hn, valid, suffix_lengths,
                                        chunk_size, want_state=True,
                                        init=(conv_s, rec_s))
            h = res + out
            res = h
            hn = rms_norm_zc(lp["post_norm"], h, cfg.rms_norm_eps)
            h = res + _next_mlp(cfg, lp, hn, is_decode=False, mesh=mesh)
            return h, st

        h, lin_states = jax.lax.scan(lin_body, h,
                                     (gp["lin"], conv_g, rec_g))
        res = h
        hn = rms_norm_zc(gp["full"]["in_norm"], h, cfg.rms_norm_eps)
        out, (k_g, v_g) = _full_attn_continue(cfg, gp["full"], hn, k_g,
                                              v_g, P, suffix_lengths, rope,
                                              mesh=mesh)
        h = res + out
        res = h
        hn = rms_norm_zc(gp["full"]["post_norm"], h, cfg.rms_norm_eps)
        h = res + _next_mlp(cfg, gp["full"], hn, is_decode=False, mesh=mesh)
        return h, (lin_states, k_g, v_g)

    h, ((conv, rec), k, v) = jax.lax.scan(
        group_body, h, (params["groups"], cache.conv, cache.rec,
                        cache.k, cache.v))
    h = rms_norm_zc(params["final_norm"], h, cfg.rms_norm_eps)
    last = h[jnp.arange(B), suffix_lengths - 1]
    return _lm_head(params, cfg, last), Qwen3NextCache(
        conv=conv, rec=rec, k=k, v=v, length=P + suffix_lengths)


def broadcast_prefix_cache(cache: Qwen3NextCache, B: int) -> Qwen3NextCache:
    """Tile a B=1 prefix cache across a batch (materialized — decode
    scatters per row)."""
    return Qwen3NextCache(
        conv=jnp.repeat(cache.conv, B, axis=2),
        rec=jnp.repeat(cache.rec, B, axis=2),
        k=jnp.repeat(cache.k, B, axis=1),
        v=jnp.repeat(cache.v, B, axis=1),
        length=jnp.repeat(cache.length, B, axis=0))


@jax.jit
def _quantize_next_cache(cache: Qwen3NextCache) -> QuantNextCache:
    """bf16 hybrid cache -> int8 KV strips + scales. Applying this right
    after a (full-precision) prefill/continue is exactly where
    prefill(cfg.kv_quant="int8") quantizes, so prefix-store bursts match
    the packed int8 path token for token."""
    from .decoder import quantize_kv

    kq, ks = quantize_kv(cache.k)
    vq, vs = quantize_kv(cache.v)
    return QuantNextCache(conv=cache.conv, rec=cache.rec, k=kq, v=vq,
                          k_scale=ks, v_scale=vs, length=cache.length)


@partial(jax.jit, static_argnames=("cfg", "prefix_len", "max_len",
                                   "chunk_size", "mesh"))
def _continue_jit(params, cfg, ids, suffix_lengths, cache, prefix_len,
                  max_len, chunk_size, mesh):
    S = ids.shape[1]
    pad = max_len - cache.k.shape[2]
    if pad > 0:
        pw = ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))
        cache = cache._replace(k=jnp.pad(cache.k, pw),
                               v=jnp.pad(cache.v, pw))
    assert cache.k.shape[2] >= prefix_len + S
    return prefill_continue(params, cfg, ids, suffix_lengths, cache,
                            prefix_len, chunk_size, mesh=mesh)


class NextPrefixStore:
    """Cross-call shared-prefix cache for judge bursts (TAC/VAS bursts
    repeat one system+rubric prefix with per-sample suffixes). The hybrid
    architecture makes an entry cheap: 3/4 of the layers store an O(1)
    state, only 1/4 store prefix KV. Exact — the continued computation is
    bit-identical to a full prefill (pinned by tests)."""

    def __init__(self, max_entries: int = 8, min_prefix: int = 64,
                 bucket: int = 64):
        self.max_entries = max_entries
        self.min_prefix = min_prefix
        self.bucket = bucket
        self._store: dict = {}
        self.hits = 0
        self.misses = 0

    def split(self, token_lists: list) -> int:
        """Longest common prefix across the burst, bucketed down; 0 = no
        usable prefix."""
        if len(token_lists) < 1 or not all(token_lists):
            return 0
        first = token_lists[0]
        lcp = min(len(t) for t in token_lists)
        for t in token_lists[1:]:
            i = 0
            while i < lcp and t[i] == first[i]:
                i += 1
            lcp = i
        # keep at least one suffix token per row (the last-logit gather
        # needs a non-empty suffix)
        lcp = min(lcp, min(len(t) for t in token_lists) - 1)
        P = (lcp // self.bucket) * self.bucket
        return P if P >= self.min_prefix else 0

    def prefix_cache(self, params, cfg, prefix: tuple, mesh=None,
                     chunk_size: int = 64) -> Qwen3NextCache:
        key = (id(params), prefix)
        hit = self._store.pop(key, None)
        if hit is not None:
            self._store[key] = hit       # LRU refresh
            self.hits += 1
            return hit
        self.misses += 1
        P = len(prefix)
        ids = jnp.asarray(np.asarray(prefix, np.int32)[None])
        _, cache = _prefill_jit(params, cfg, ids,
                                jnp.full((1,), P, jnp.int32), P,
                                chunk_size, mesh)
        self._store[key] = cache
        while len(self._store) > self.max_entries:
            self._store.pop(next(iter(self._store)))
        return cache

    def generate(self, params, cfg, token_lists: list, sp, seed: int = 0,
                 mesh=None, chunk_size: int = 64,
                 spec_k: int = 0) -> NextGenResult:
        """Burst generation with shared-prefix reuse; falls back to the
        plain packed path when no usable common prefix exists. spec_k > 0
        composes with speculative decoding (the n-gram history covers the
        FULL prompt — prefix included — so rubric echoes still draft)."""
        from ..engine.chat import pack_prompts

        P = self.split(token_lists)
        if not P:
            packed = pack_prompts(token_lists, pad_id=cfg.pad_token_id)
            if spec_k:
                return generate_spec(params, cfg, packed.input_ids,
                                     packed.lengths, sp, spec_k=spec_k,
                                     seed=seed, mesh=mesh,
                                     chunk_size=chunk_size)
            return generate_packed(params, cfg, packed.input_ids,
                                   packed.lengths, sp, seed=seed,
                                   mesh=mesh, chunk_size=chunk_size)
        prefix = tuple(token_lists[0][:P])
        suffixes = [t[P:] for t in token_lists]
        packed = pack_prompts(suffixes, pad_id=cfg.pad_token_id)
        B, S = packed.input_ids.shape
        T = sp.max_new_tokens
        W = spec_k + 1 if spec_k else 0
        # the prefix/continue chain runs bf16 (prefill_continue extends a
        # float cache); with cfg.kv_quant the finished prompt cache
        # quantizes at the same boundary the packed path does, so int8
        # bursts stay token-exact vs generate_packed(kv_quant)
        pre_cfg = cfg.replace(kv_quant=None) if cfg.kv_quant else cfg
        cache1 = self.prefix_cache(params, pre_cfg, prefix, mesh=mesh,
                                   chunk_size=chunk_size)
        cache = broadcast_prefix_cache(cache1, B)
        logits, cache = _continue_jit(
            params, pre_cfg, jnp.asarray(packed.input_ids),
            jnp.asarray(packed.lengths, jnp.int32), cache, P,
            P + S + T + W, chunk_size, mesh)
        if cfg.kv_quant == "int8":
            cache = _quantize_next_cache(cache)
        if spec_k:
            full_lens = P + np.asarray(packed.lengths, np.int64)
            hist0 = np.zeros((B, P + S + T + W), np.int32)
            hist0[:, :P] = np.asarray(prefix, np.int32)[None]
            hist0[:, P:P + S] = packed.input_ids
            out, gen_len, _ = _spec_loop(
                params, cfg, cache, logits, jnp.asarray(hist0),
                jnp.asarray(full_lens, jnp.int32), sp, spec_k, mesh,
                rng=jax.random.PRNGKey(seed))
            return NextGenResult(sequences=np.asarray(out),
                                 lengths=np.asarray(gen_len, np.int64))
        return _decode_tail(params, cfg, logits, cache, sp, seed, mesh)


# ------------------------------------------------- speculative decoding


def _deltanet_window(cfg: Qwen3NextConfig, p: dict, h: jax.Array,
                     conv_state: jax.Array, state: jax.Array):
    """W-token DeltaNet VERIFY step from a frozen state (no commit).
    h [B, W, H]; conv_state [B, K-1, conv_dim]; state [B, nv, dk, dv].
    Returns (out [B, W, H], saved streams for the later commit). The saved
    streams (post-conv k/v + g/beta + the raw conv window) are all the
    commit needs — re-running the delta-rule state update from them costs
    no weight reads, which is what keeps speculative rounds ~one forward
    despite the recurrent state being un-rollback-able."""
    B, W, _ = h.shape
    K = cfg.linear_conv_kernel_dim
    qkvz = linear(p["qkvz"], h)
    ba = linear(p["ba"], h)
    q, k, v, z, b, a = _split_qkvz_ba(cfg, qkvz, ba)
    mixed = jnp.concatenate([q.reshape(B, W, -1), k.reshape(B, W, -1),
                             v.reshape(B, W, -1)], -1)
    window = jnp.concatenate([conv_state, mixed], 1)   # [B, K-1+W, D]
    w = p["conv"].astype(window.dtype)
    conv_out = jax.nn.silu(
        sum(window[:, j:j + W, :] * w[:, j] for j in range(K)))
    kd = cfg.linear_key_dim
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    q = conv_out[..., :kd].reshape(B, W, nk, cfg.linear_key_head_dim)
    k = conv_out[..., kd:2 * kd].reshape(B, W, nk, cfg.linear_key_head_dim)
    v = conv_out[..., 2 * kd:].reshape(B, W, nv, cfg.linear_value_head_dim)
    g, beta = _deltanet_gb(p, b, a)
    r = nv // nk
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    out, _ = chunk_gated_delta_rule(q, k, v, g, beta, chunk_size=W,
                                    initial_state=state)
    out = rms_norm_gated(p["norm"], out, z, cfg.rms_norm_eps)
    out = linear(p["out"], out.reshape(B, W, -1))
    saved = {"window": window, "k": k, "v": v, "g": g, "beta": beta}
    return out, saved


def _full_attn_window(cfg: Qwen3NextConfig, p: dict, h: jax.Array,
                      kv: tuple, cur: jax.Array, rope: tuple):
    """W-token attention verify step: write the whole window's KV at each
    row's frontier (entries beyond the eventual acceptance stay stale and
    masked — the engines' standard trick), causal-within-window mask.
    kv: bf16 (k, v) or int8 (kq, vq, ks, vs) strips — verify chunks
    quantize at the row frontier exactly like the plain decode write."""
    q, k, v, gate = _gated_attn_qkv(cfg, p, h, rope)
    kv = _kv_write(kv, k, v, cur)
    Smax = kv[0].shape[1]
    W = h.shape[1]
    mask = (jnp.arange(Smax)[None, None, :]
            <= cur[:, None, None] + jnp.arange(W)[None, :, None])
    out = _kv_attn(cfg, q, kv, mask)
    out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
    return linear(p["o"], out), kv


def _extend_forward(params: dict, cfg: Qwen3NextConfig, tokens: jax.Array,
                    cache: Qwen3NextCache, mesh=None):
    """Forward a [B, W] window at each row's frontier WITHOUT committing
    the recurrent state. Returns (logits [B, W, V], saved DeltaNet streams
    stacked [G, 3, ...], (k, v) caches with the window written)."""
    B, W = tokens.shape
    h = params["embed"]["weight"][tokens]
    rope = _rope_cos_sin(
        cfg, cache.length[:, None] + jnp.arange(W)[None, :])
    kv_fields = _cache_kv(cache)

    def group_body(h, xs):
        gp, conv_g, rec_g = xs[:3]
        kv_g = xs[3:]

        def lin_body(h, xs2):
            lp, conv_s, rec_s = xs2
            res = h
            hn = rms_norm_zc(lp["in_norm"], h, cfg.rms_norm_eps)
            out, saved = _deltanet_window(cfg, lp, hn, conv_s, rec_s)
            h = res + out
            res = h
            hn = rms_norm_zc(lp["post_norm"], h, cfg.rms_norm_eps)
            hn, saved = _gmm_decode_barrier(cfg, hn, saved)
            h = res + _next_mlp(cfg, lp, hn, is_decode=True, mesh=mesh)
            return h, saved

        h, lin_saved = jax.lax.scan(lin_body, h,
                                    (gp["lin"], conv_g, rec_g))
        res = h
        hn = rms_norm_zc(gp["full"]["in_norm"], h, cfg.rms_norm_eps)
        out, kv_g = _full_attn_window(cfg, gp["full"], hn, kv_g,
                                      cache.length, rope)
        h = res + out
        res = h
        hn = rms_norm_zc(gp["full"]["post_norm"], h, cfg.rms_norm_eps)
        hn, kv_g = _gmm_decode_barrier(cfg, hn, tuple(kv_g))
        h = res + _next_mlp(cfg, gp["full"], hn, is_decode=True, mesh=mesh)
        return h, (lin_saved,) + tuple(kv_g)

    h, st = jax.lax.scan(
        group_body, h, (params["groups"], cache.conv, cache.rec) + kv_fields)
    h = rms_norm_zc(params["final_norm"], h, cfg.rms_norm_eps)
    logits = _lm_head(params, cfg, h)
    return logits, st[0], st[1:]


def _commit_layer(conv_s, rec_s, window, k, v, g, beta, n_adv, K):
    """Advance ONE DeltaNet layer's state through the first n_adv[b] window
    tokens (pause masking: the rest neither decay nor write). Pure state
    math over the saved streams — no projections, no weight reads."""
    B, W = g.shape[:2]
    valid = (jnp.arange(W)[None, :] < n_adv[:, None]).astype(jnp.float32)
    g = g.astype(jnp.float32) * valid[..., None]
    beta = beta.astype(jnp.float32) * valid[..., None]

    def body(s, xs):
        k_t, v_t, g_t, b_t = xs
        _, s = recurrent_gated_delta_step(k_t, k_t, v_t, g_t, b_t, s)
        return s, ()

    xs = (k.transpose(1, 0, 2, 3), v.transpose(1, 0, 2, 3),
          g.transpose(1, 0, 2), beta.transpose(1, 0, 2))
    rec_s, _ = jax.lax.scan(body, rec_s, xs)
    conv_s = jax.vmap(
        lambda row, n: jax.lax.dynamic_slice(
            row, (n, 0), (K - 1, row.shape[-1])))(window, n_adv)
    return conv_s, rec_s


def _commit(cfg: Qwen3NextConfig, cache, saved: dict,
            kv_new: tuple, n_adv: jax.Array):
    commit = jax.vmap(jax.vmap(
        _commit_layer,
        in_axes=(0, 0, 0, 0, 0, 0, 0, None, None)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))
    conv, rec = commit(cache.conv, cache.rec, saved["window"], saved["k"],
                       saved["v"], saved["g"], saved["beta"], n_adv,
                       cfg.linear_conv_kernel_dim)
    return _rebuild_cache(cache, conv, rec, kv_new, cache.length + n_adv)


@partial(jax.jit, static_argnames=("cfg", "sp", "spec_k", "mesh"))
def _spec_loop(params, cfg, cache, first_logits, hist0, lengths, sp,
               spec_k, mesh, rng=None):
    """n-gram speculative decode for the hybrid judge (prompt-lookup
    drafting as in engine/spec_decode.py). GREEDY (the temp-0 TAC burst
    workload): a draft commits only when it equals the model's own argmax
    — token-exact vs plain greedy. SAMPLED (the VAS judge runs temp 0.7):
    rejection-sampling verification under the request's filtered target
    distribution — exact distribution, residual after a rejected draft.
    Either way the recurrent state advances exactly through the emitted
    prefix (commit replays the saved streams with pause masks)."""
    B, V = first_logits.shape
    T = sp.max_new_tokens
    K = spec_k
    W = K + 1
    S_in = hist0.shape[1] - T - W
    b_idx = jnp.arange(B)
    eos = (jnp.asarray(sp.eos_token_ids, jnp.int32)
           if sp.eos_token_ids else None)

    def is_eos(tok):
        if eos is None:
            return jnp.zeros_like(tok, dtype=bool)
        return jnp.any(tok[..., None] == eos, axis=-1)

    Lh = hist0.shape[1]

    def draft(hist, tok0, gen_len):
        prev_pos = jnp.where(gen_len > 0, S_in + gen_len - 1, lengths - 1)
        prev = hist[b_idx, prev_pos]
        m = (hist[:, :-1] == prev[:, None]) & (hist[:, 1:] == tok0[:, None])
        p = jnp.arange(Lh - 1)[None, :]
        in_prompt = p + 2 + K <= lengths[:, None]
        in_gen = (p >= S_in) & (p + 2 + K <= S_in + gen_len[:, None])
        m = m & (in_prompt | in_gen)
        has = jnp.any(m, axis=1)
        last = (Lh - 2) - jnp.argmax(m[:, ::-1], axis=1)
        src = last[:, None] + 2 + jnp.arange(K)[None, :]
        drafts = hist[b_idx[:, None], src]
        return jnp.where(has[:, None], drafts, tok0[:, None])

    def cond(carry):
        gen_len, done, it = carry[3], carry[4], carry[6]
        return (it < T) & jnp.any(~done & (gen_len < T))

    def body(carry):
        logits, cache, hist, gen_len, done, out, it, rng_k, rej_tok = carry
        if sp.do_sample:
            from ..engine.spec_decode import _filtered

            rng_k, k_tok, k_acc = jax.random.split(rng_k, 3)
            l0 = _filtered(logits, sp)
            # residual after a rejected draft: p with that token's mass
            # removed (mask AFTER filtering — the filters define p)
            l0 = jnp.where(
                (jnp.arange(V)[None, :] == rej_tok[:, None])
                & (rej_tok[:, None] >= 0), -jnp.inf, l0)
            tok0 = jax.random.categorical(k_tok, l0, -1).astype(jnp.int32)
        else:
            tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        drafts = draft(hist, tok0, gen_len)
        chunk = jnp.concatenate([tok0[:, None], drafts], axis=1)  # [B, W]
        logits_w, saved, kv_new = _extend_forward(params, cfg, chunk,
                                                  cache, mesh=mesh)
        if sp.do_sample:
            from ..engine.spec_decode import _filtered

            # accept draft i with prob p_i(d_i) under the FILTERED target
            # (deterministic n-gram proposal — Leviathan/Chen specialized)
            pf = _filtered(logits_w[:, :K], sp)
            ld = (jnp.take_along_axis(pf, drafts[..., None], axis=-1)[..., 0]
                  - jax.scipy.special.logsumexp(pf, axis=-1))
            u = jax.random.uniform(k_acc, (B, K))
            match = (jnp.log(u) < ld).astype(jnp.int32)
        else:
            greedy = jnp.argmax(logits_w, axis=-1).astype(jnp.int32)
            match = (drafts == greedy[:, :K]).astype(jnp.int32)
        a = jnp.cumprod(match, axis=1).sum(axis=1)
        n_commit = 1 + a
        n_emit = jnp.minimum(n_commit, T - gen_len)
        emit_i = jnp.arange(W)[None, :]
        emit_mask = (emit_i < n_emit[:, None]) & ~done[:, None]
        eos_emitted = jnp.any(is_eos(chunk) & emit_mask, axis=1)
        first_eos = jnp.argmax(is_eos(chunk) & emit_mask, axis=1)
        n_emit = jnp.where(eos_emitted, first_eos + 1, n_emit)
        n_emit = jnp.where(done, 0, n_emit)
        emit_mask = emit_i < n_emit[:, None]
        # state/KV frontier advances exactly through the emitted prefix
        cache = _commit(cfg, cache, saved, kv_new, n_emit)
        idxs = gen_len[:, None] + emit_i
        out = out.at[b_idx[:, None], idxs].set(
            jnp.where(emit_mask, chunk, out[b_idx[:, None], idxs]))
        hidx = S_in + idxs
        hist = hist.at[b_idx[:, None], hidx].set(
            jnp.where(emit_mask, chunk, hist[b_idx[:, None], hidx]))
        new_gen = gen_len + n_emit
        new_done = done | eos_emitted | (new_gen >= T)
        sel = jnp.clip(n_emit - 1, 0, K)
        advanced = n_emit > 0
        new_logits = jnp.where(advanced[:, None], logits_w[b_idx, sel],
                               logits)
        if sp.do_sample:
            # a rejection at draft index `a` feeds the next tok0's residual
            # (only when the full commit was emitted — EOS/budget
            # truncation invalidates the frontier)
            rejected = advanced & (a < K) & (n_emit == n_commit)
            new_rej = jnp.where(
                rejected, drafts[b_idx, jnp.minimum(a, K - 1)], -1)
            rej_tok = jnp.where(advanced, new_rej, rej_tok)
        return (new_logits, cache, hist, new_gen, new_done, out, it + 1,
                rng_k, rej_tok)

    out0 = jnp.full((B, T + W), sp.pad_token_id, jnp.int32)
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)
    carry = (first_logits, cache, hist0, jnp.zeros(B, jnp.int32),
             jnp.zeros(B, bool), out0, jnp.zeros((), jnp.int32), rng0,
             jnp.full((B,), -1, jnp.int32))
    (_, _, _, gen_len, _, out, iters, _, _) = jax.lax.while_loop(
        cond, body, carry)
    return out[:, :T], gen_len, iters


def generate_spec(params: dict, cfg: Qwen3NextConfig,
                  input_ids: np.ndarray, lengths: np.ndarray, sp,
                  spec_k: int = 8, seed: int = 0, mesh=None,
                  chunk_size: int = 64) -> NextGenResult:
    """Speculative generation: token-exact vs generate_packed for greedy;
    exact-distribution (rejection-sampling verification) for sampled."""
    B, S = input_ids.shape
    T = sp.max_new_tokens
    W = spec_k + 1
    ids = jnp.asarray(input_ids)
    lens = jnp.asarray(lengths, jnp.int32)
    logits, cache = _prefill_jit(params, cfg, ids, lens, S + T + W,
                                 chunk_size, mesh)
    hist0 = jnp.zeros((B, S + T + W), jnp.int32).at[:, :S].set(
        ids.astype(jnp.int32))
    out, gen_len, _ = _spec_loop(params, cfg, cache, logits, hist0, lens,
                                 sp, spec_k, mesh,
                                 rng=jax.random.PRNGKey(seed))
    seqs = np.asarray(out)
    return NextGenResult(sequences=seqs,
                         lengths=np.asarray(gen_len, np.int64))


# Qwen3-Next module names to quantize on top of models/quant.py's defaults
# (the bare q/k/v/o of the gated-attention role, the DeltaNet projections,
# and the shared expert; experts ride MOE_SUFFIXES). Routing/conv/dt/A_log
# stay float — routing and decay are precision-sensitive and tiny.
NEXT_QUANT_SUFFIXES = (
    ("qkvz", "kernel"), ("out", "kernel"),
    ("q", "kernel"), ("k", "kernel"), ("v", "kernel"), ("o", "kernel"),
    ("shared", "gate", "kernel"), ("shared", "up", "kernel"),
    ("shared", "down", "kernel"),
)


def quantize_qwen3_next_params(params: dict, bits: int = 8,
                               consume: bool = False) -> dict:
    """Weight-only int8/int4 for the judge model — an 80B-A3B at bf16 is
    160 GB; int8 halves it (the reference serves it across 4 GPUs,
    serve_qwen3.sh:13). layers.linear and moe_mlp consume the quantized
    leaves directly."""
    from .quant import quantize_params

    return quantize_params(params, bits=bits, consume=consume,
                           extra_suffixes=NEXT_QUANT_SUFFIXES)


# ------------------------------------------------------------ params / loader


def init_qwen3_next_params(cfg: Qwen3NextConfig, seed: int = 0,
                           method: str = "normal") -> dict:
    """Random (or zeros — benchmark-size models) parameter pytree."""
    rng = np.random.default_rng(seed)
    dt = jnp.dtype(cfg.dtype)

    def mk(*shape, scale=0.02, f32=False):
        if method == "zeros":
            return jnp.zeros(shape, jnp.float32 if f32 else dt)
        a = rng.normal(0.0, scale, shape).astype(np.float32)
        return jnp.asarray(a, jnp.float32 if f32 else dt)

    H, E, I = cfg.hidden_size, cfg.num_experts, cfg.moe_intermediate_size
    nh, kh, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    nv = cfg.linear_num_value_heads
    K = cfg.linear_conv_kernel_dim

    def mlp_tree():
        if E > 0:
            Is = cfg.shared_expert_intermediate_size
            return {
                "router": {"kernel": mk(H, E)},
                "experts": {"gate": {"kernel": mk(E, H, I)},
                            "up": {"kernel": mk(E, H, I)},
                            "down": {"kernel": mk(E, I, H)}},
                "shared": {"gate": {"kernel": mk(H, Is)},
                           "up": {"kernel": mk(H, Is)},
                           "down": {"kernel": mk(Is, H)}},
                "shared_gate": {"kernel": mk(H, 1)},
            }
        return {"mlp": {"gate": {"kernel": mk(H, cfg.intermediate_size)},
                        "up": {"kernel": mk(H, cfg.intermediate_size)},
                        "down": {"kernel": mk(cfg.intermediate_size, H)}}}

    def lin_layer():
        qkvz = 2 * cfg.linear_key_dim + 2 * cfg.linear_value_dim
        d = {
            "in_norm": mk(H, scale=0.0), "post_norm": mk(H, scale=0.0),
            "qkvz": {"kernel": mk(H, qkvz)},
            "ba": {"kernel": mk(H, 2 * nv)},
            "conv": mk(cfg.conv_dim, K, scale=0.2),
            "dt_bias": (jnp.ones((nv,), jnp.float32) if method == "zeros"
                        else mk(nv, scale=1.0, f32=True) + 1.0),
            "A_log": (jnp.zeros((nv,), jnp.float32) if method == "zeros"
                      else jnp.asarray(
                          np.log(rng.uniform(0.5, 8.0, (nv,))), jnp.float32)),
            "norm": mk(cfg.linear_value_head_dim, scale=0.0) + 1.0,
            "out": {"kernel": mk(cfg.linear_value_dim, H)},
        }
        d.update(mlp_tree())
        return d

    def full_layer():
        d = {
            "in_norm": mk(H, scale=0.0), "post_norm": mk(H, scale=0.0),
            "q": {"kernel": mk(H, nh * hd * 2)},
            "k": {"kernel": mk(H, kh * hd)},
            "v": {"kernel": mk(H, kh * hd)},
            "o": {"kernel": mk(nh * hd, H)},
            "q_norm": mk(hd, scale=0.0), "k_norm": mk(hd, scale=0.0),
        }
        d.update(mlp_tree())
        return d

    G, P1 = cfg.num_groups, cfg.full_attention_interval - 1
    lin = [ [lin_layer() for _ in range(P1)] for _ in range(G)]
    full = [full_layer() for _ in range(G)]
    stack2 = lambda rows: jax.tree.map(lambda *g: jnp.stack(g), *[
        jax.tree.map(lambda *s: jnp.stack(s), *row) for row in rows])
    stack1 = lambda items: jax.tree.map(lambda *g: jnp.stack(g), *items)
    params = {
        "embed": {"weight": mk(cfg.vocab_size, H)},
        "groups": {"lin": stack2(lin), "full": stack1(full)},
        "final_norm": mk(H, scale=0.0),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": mk(H, cfg.vocab_size)}
    return params


def _host_np(t) -> np.ndarray:
    """torch tensor or numpy array -> float32 numpy (host)."""
    if hasattr(t, "detach"):
        return t.detach().to("cpu").float().numpy()
    return np.asarray(t, np.float32)


def convert_hf_qwen3_next(state_dict: dict, cfg: Qwen3NextConfig,
                          dtype: str = "float32",
                          consume: bool = False) -> dict:
    """HF Qwen3NextForCausalLM state_dict -> stacked-groups pytree.
    Weight-name spec: modeling_qwen3_next.py modules (linear_attn.*,
    self_attn.*, mlp.{gate,experts,shared_expert,shared_expert_gate}).
    consume=True pops each host tensor as it converts (the 80B path:
    peak host RAM ~ one tree, not two)."""
    dt = jnp.dtype(dtype)

    def raw(name):
        return _host_np(state_dict.pop(name) if consume
                        else state_dict[name])

    def get(name, transpose=False, to_f32=False):
        w = raw(name)
        if transpose:
            w = w.T
        return jnp.asarray(w, jnp.float32 if to_f32 else dt)

    P = cfg.full_attention_interval
    G, P1 = cfg.num_groups, P - 1
    E = cfg.num_experts

    def mlp_tree(i):
        pre = f"model.layers.{i}.mlp"
        if E > 0:
            gate = np.stack([raw(f"{pre}.experts.{e}.gate_proj.weight").T
                             for e in range(E)])
            up = np.stack([raw(f"{pre}.experts.{e}.up_proj.weight").T
                           for e in range(E)])
            down = np.stack([raw(f"{pre}.experts.{e}.down_proj.weight").T
                             for e in range(E)])
            return {
                "router": {"kernel": get(f"{pre}.gate.weight", transpose=True)},
                "experts": {"gate": {"kernel": jnp.asarray(gate, dt)},
                            "up": {"kernel": jnp.asarray(up, dt)},
                            "down": {"kernel": jnp.asarray(down, dt)}},
                "shared": {
                    "gate": {"kernel": get(f"{pre}.shared_expert.gate_proj.weight", True)},
                    "up": {"kernel": get(f"{pre}.shared_expert.up_proj.weight", True)},
                    "down": {"kernel": get(f"{pre}.shared_expert.down_proj.weight", True)}},
                "shared_gate": {"kernel": get(f"{pre}.shared_expert_gate.weight", True)},
            }
        return {"mlp": {
            "gate": {"kernel": get(f"{pre}.gate_proj.weight", True)},
            "up": {"kernel": get(f"{pre}.up_proj.weight", True)},
            "down": {"kernel": get(f"{pre}.down_proj.weight", True)}}}

    def lin_layer(i):
        pre = f"model.layers.{i}"
        d = {
            "in_norm": get(f"{pre}.input_layernorm.weight"),
            "post_norm": get(f"{pre}.post_attention_layernorm.weight"),
            "qkvz": {"kernel": get(f"{pre}.linear_attn.in_proj_qkvz.weight", True)},
            "ba": {"kernel": get(f"{pre}.linear_attn.in_proj_ba.weight", True)},
            "conv": jnp.asarray(
                raw(f"{pre}.linear_attn.conv1d.weight")[:, 0, :], dt),
            "dt_bias": get(f"{pre}.linear_attn.dt_bias", to_f32=True),
            "A_log": get(f"{pre}.linear_attn.A_log", to_f32=True),
            "norm": get(f"{pre}.linear_attn.norm.weight"),
            "out": {"kernel": get(f"{pre}.linear_attn.out_proj.weight", True)},
        }
        d.update(mlp_tree(i))
        return d

    def full_layer(i):
        pre = f"model.layers.{i}"
        d = {
            "in_norm": get(f"{pre}.input_layernorm.weight"),
            "post_norm": get(f"{pre}.post_attention_layernorm.weight"),
            "q": {"kernel": get(f"{pre}.self_attn.q_proj.weight", True)},
            "k": {"kernel": get(f"{pre}.self_attn.k_proj.weight", True)},
            "v": {"kernel": get(f"{pre}.self_attn.v_proj.weight", True)},
            "o": {"kernel": get(f"{pre}.self_attn.o_proj.weight", True)},
            "q_norm": get(f"{pre}.self_attn.q_norm.weight"),
            "k_norm": get(f"{pre}.self_attn.k_norm.weight"),
        }
        d.update(mlp_tree(i))
        return d

    lin = [[lin_layer(g * P + s) for s in range(P1)] for g in range(G)]
    full = [full_layer(g * P + P1) for g in range(G)]
    stack2 = lambda rows: jax.tree.map(lambda *g: jnp.stack(g), *[
        jax.tree.map(lambda *s: jnp.stack(s), *row) for row in rows])
    stack1 = lambda items: jax.tree.map(lambda *g: jnp.stack(g), *items)
    params = {
        "embed": {"weight": get("model.embed_tokens.weight")},
        "groups": {"lin": stack2(lin), "full": stack1(full)},
        "final_norm": get("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": get("lm_head.weight", transpose=True)}
    return params


def load_qwen3_next_checkpoint(path, cfg: Qwen3NextConfig,
                               dtype: str | None = None,
                               quantize: str | None = None,
                               bits: int = 8, mesh=None) -> dict:
    """Load a HF Qwen3-Next checkpoint directory (safetensors shards),
    STREAMING: tensors materialize one at a time from mmap-backed shard
    handles (loader.LazyStateDict) and are consumed as they convert, so
    peak host RSS is ~one converted tree — the actual judge checkpoint is
    an 80B (~160 GB bf16) served at TP=4 (serve_qwen3.sh:13); the previous
    eager loop held a full extra state-dict copy (VERDICT r4 #5).
    quantize="int8" quantizes ON LOAD. mesh: convert on the host device
    and place every leaf with its parallel/sharding rule — sharded load ==
    unsharded load, slices go straight to their shards. MTP ("mtp.*") and
    other extra heads are ignored, matching HF's
    _keys_to_ignore_on_load_unexpected."""
    from pathlib import Path

    from .loader import LazyStateDict, _host_convert_ctx

    path = Path(path)
    shards = sorted(path.glob("*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"no safetensors in {path}")
    state = LazyStateDict(shards, skip_prefixes=("mtp.",))
    with _host_convert_ctx(mesh):
        params = convert_hf_qwen3_next(state, cfg, dtype or cfg.dtype,
                                       consume=True)
        if quantize is not None:
            assert quantize == "int8", quantize
            params = quantize_qwen3_next_params(params, bits=bits,
                                                consume=True)
    if mesh is not None:
        from ..parallel.sharding import shard_params

        params = shard_params(params, mesh)
    return params
