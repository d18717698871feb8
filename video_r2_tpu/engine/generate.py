"""Batched autoregressive generation: prefill + fully-jitted scan decode.

TPU-native replacement for HF `model.generate` as used by the reference's eval
model (eval qwen2_5_vl.py:326-336), GRPO rollouts (grpo_trainer.py:779-786)
and the demo. Design:

- right-padded prompts with per-sample lengths (no left-padding: the KV cache
  is addressed by true position, decode tokens append at `length_b`);
- prefill writes the full prompt KV in one forward, last-valid-token logits
  are gathered per sample;
- the decode loop is ONE `lax.scan` inside jit — no host round-trip per token;
  finished samples keep emitting pad and stop updating;
- M-RoPE decode positions use the cached rope delta
  (monkey_patch_forward.py:423-436 fast path): pos = length + step + delta.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.decoder import KVCache, decoder_forward
from ..models.model import embed_inputs, lm_head
from ..models.mrope import mrope_cos_sin
from .sampling import SamplingParams, sample_token


@dataclass
class GenerationResult:
    sequences: np.ndarray      # [B, max_new_tokens] generated ids (pad-filled)
    lengths: np.ndarray        # [B] number of generated tokens (incl. eos)
    logprobs: np.ndarray | None = None  # [B, max_new_tokens] chosen-token logprobs


@partial(jax.jit, static_argnames=("cfg", "attn_impl", "max_cache_len",
                                   "act_quant", "mesh"))
def prefill(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,        # [B, S] right-padded
    position_ids: jax.Array,     # [3, B, S]
    lengths: jax.Array,          # [B]
    max_cache_len: int,
    vision_embeds: jax.Array | None = None,   # [N, H] precomputed (or None)
    vision_token_id: int | None = None,
    attn_impl: str = "xla",
    act_quant: str | None = None,
    mesh=None,                   # TP inference: KV sharded on heads over "tp"
):
    """Run the prompt, fill the KV cache. Returns (last_logits [B,V], cache)."""
    B, S = input_ids.shape
    h = params["model"]["embed_tokens"]["embedding"][input_ids]
    if vision_embeds is not None:
        from ..models.model import merge_vision_embeddings

        h = merge_vision_embeddings(input_ids, h, vision_embeds,
                                    cfg.video_token_id if vision_token_id is None
                                    else vision_token_id)
    cos, sin = mrope_cos_sin(position_ids, cfg, dtype=h.dtype)
    if attn_impl == "flash":
        bias = None
    else:
        # bias spans the whole cache width: causal over the prompt, -inf beyond
        i = jnp.arange(S)[:, None]
        j = jnp.arange(max_cache_len)[None, :]
        allowed = (j <= i) & (j[None] < lengths[:, None, None])
        bias = jnp.where(allowed[:, None], 0.0, -1e30).astype(jnp.float32)
    cache = KVCache.init(cfg.text, B, max_cache_len, h.dtype)
    if mesh is not None:
        from ..parallel.sharding import kv_cache_sharding

        sh = kv_cache_sharding(mesh, cfg.text.num_key_value_heads)
        cache = KVCache(jax.lax.with_sharding_constraint(cache.k, sh),
                        jax.lax.with_sharding_constraint(cache.v, sh))
    # prefill cache: write rows [0, S)
    hidden, cache = decoder_forward(params["model"], cfg.text, h, cos, sin, bias,
                                    cache=cache, cache_position=0,
                                    attn_impl=attn_impl,
                                    kv_lengths=lengths, causal=True,
                                    cache_fill=True, act_quant=act_quant)
    last = hidden[jnp.arange(B), lengths - 1]
    logits = lm_head(params, cfg, last)
    return logits.astype(jnp.float32), cache


@partial(jax.jit, static_argnames=("cfg", "sp", "attn_impl", "mesh"),
         donate_argnums=(4,))
def decode(
    params: dict,
    cfg: ModelConfig,
    sp: SamplingParams,
    first_logits: jax.Array,     # [B, V] from prefill
    cache: KVCache,
    lengths: jax.Array,          # [B] prompt lengths
    rope_deltas: jax.Array,      # [B] from get_rope_index
    rng: jax.Array,
    attn_impl: str = "xla",
    mesh=None,                   # TP inference: keep KV head-sharded over "tp"
):
    """Scan `max_new_tokens` decode steps. Returns (tokens [B,T], logprobs [B,T],
    gen_lengths [B], cache).

    The input cache is DONATED and returned (as the scan carry) so XLA
    aliases the multi-GB buffer end to end — exactly one cache allocation
    lives across prefill+decode. Callers must not reuse the passed-in cache
    object afterwards."""
    B = first_logits.shape[0]
    max_len = cache.k.shape[2]
    # Fixed-slot decode layout: step t's KV rows land at cache position
    # S_pad + t for EVERY sample (the prompt's padded width, not the true
    # length). A uniform scalar position makes the cache write a
    # dynamic-update-slice (in-place on the scan carry) instead of a
    # per-sample scatter; rope positions still use true lengths, and the
    # attention mask admits prompt rows [0, len_b) plus slots [S_pad, S_pad+t].
    s_pad = max_len - sp.max_new_tokens
    if mesh is not None:
        from ..parallel.sharding import kv_cache_sharding

        sh = kv_cache_sharding(mesh, cfg.text.num_key_value_heads)
        cache = KVCache(jax.lax.with_sharding_constraint(cache.k, sh),
                        jax.lax.with_sharding_constraint(cache.v, sh))
    eos = jnp.asarray(sp.eos_token_ids, dtype=jnp.int32) if sp.eos_token_ids else None

    def is_eos(tok):
        if eos is None:
            return jnp.zeros_like(tok, dtype=bool)
        return jnp.any(tok[:, None] == eos[None, :], axis=-1)

    def step(carry, xs):
        rng_step, t = xs
        logits, cache, cur_len, done = carry
        tok = sample_token(logits, rng_step, sp)
        tok = jnp.where(done, sp.pad_token_id, tok)
        logp = jax.nn.log_softmax(logits, axis=-1)[jnp.arange(B), tok]
        logp = jnp.where(done, 0.0, logp)
        new_done = done | is_eos(tok)

        # forward one token
        emb = params["model"]["embed_tokens"]["embedding"][tok][:, None]
        pos_scalar = cur_len + rope_deltas            # [B]
        pos3 = jnp.broadcast_to(pos_scalar[None, :, None], (3, B, 1))
        cos, sin = mrope_cos_sin(pos3, cfg, dtype=emb.dtype)
        j = jnp.arange(max_len)[None, :]
        allowed = (j < lengths[:, None]) | ((j >= s_pad) & (j <= s_pad + t))
        bias = jnp.where(allowed[:, None, None], 0.0, -1e30).astype(jnp.float32)
        hidden, cache = decoder_forward(
            params["model"], cfg.text, emb, cos, sin, bias,
            cache=cache, cache_position=s_pad + t, attn_impl=attn_impl,
            causal=False)
        next_logits = lm_head(params, cfg, hidden[:, 0]).astype(jnp.float32)
        cur_len = jnp.where(done, cur_len, cur_len + 1)
        return (next_logits, cache, cur_len, new_done), (tok, logp)

    rngs = jax.random.split(rng, sp.max_new_tokens)
    (_, cache, cur_len, _), (toks, logps) = jax.lax.scan(
        step, (first_logits, cache, lengths, jnp.zeros(B, bool)),
        (rngs, jnp.arange(sp.max_new_tokens)))
    toks = toks.T          # [B, T]
    logps = logps.T
    # generated length = tokens up to and including the first eos; finished
    # samples emit pad afterwards (assumes pad is not a legitimate sample,
    # matching HF generate's pad-after-eos contract)
    gen_len = jnp.sum(toks != sp.pad_token_id, axis=-1)
    return toks, logps, gen_len, cache


def generate(
    params: dict,
    cfg: ModelConfig,
    input_ids: np.ndarray,        # [B, S] right-padded
    lengths: np.ndarray,          # [B]
    sp: SamplingParams,
    position_ids: np.ndarray | None = None,  # [3, B, S]; default text-only
    rope_deltas: np.ndarray | None = None,   # [B]
    vision_embeds: jax.Array | None = None,
    vision_token_id: int | None = None,
    seed: int = 0,
    attn_impl: str = "xla",
    act_quant: str | None = None,  # "int8": W8A8 prefill on the integer MXU
    mesh=None,                     # sharded inference (params pre-sharded by
                                   # parallel.shard_params; KV head-sharded on
                                   # "tp" — the 80B-judge deployment shape)
) -> GenerationResult:
    """Host-orchestrated batched generation."""
    B, S = input_ids.shape
    if position_ids is None:
        from ..models.mrope import get_rope_index

        mask = (np.arange(S)[None, :] < np.asarray(lengths)[:, None]).astype(np.int64)
        position_ids, deltas = get_rope_index(input_ids, cfg, attention_mask=mask)
        if rope_deltas is None:
            rope_deltas = deltas[:, 0]
    assert rope_deltas is not None
    # get_rope_index deltas are relative to the FULL padded width S
    # (delta = max_pos + 1 - S). The decode loop indexes by TRUE length
    # (cur_len starts at lengths), so shift: continuation position for step i
    # must be max_pos + 1 + i = cur_len + delta + (S - length).
    rope_deltas = np.asarray(rope_deltas) + (S - np.asarray(lengths))
    max_cache = S + sp.max_new_tokens
    logits, cache = prefill(
        params, cfg, jnp.asarray(input_ids), jnp.asarray(position_ids),
        jnp.asarray(lengths), max_cache,
        vision_embeds=vision_embeds, vision_token_id=vision_token_id,
        attn_impl=attn_impl, act_quant=act_quant, mesh=mesh)
    toks, logps, gen_len, _ = decode(
        params, cfg, sp, logits, cache, jnp.asarray(lengths),
        jnp.asarray(rope_deltas), jax.random.PRNGKey(seed), attn_impl=attn_impl,
        mesh=mesh)
    return GenerationResult(np.asarray(toks), np.asarray(gen_len),
                            np.asarray(logps))
