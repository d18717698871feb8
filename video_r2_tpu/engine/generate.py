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
from ..models.decoder import (DecodeKVCache, KVCache, QuantKVCache,
                              decoder_decode_step, decoder_forward)
from ..models.model import embed_inputs, lm_head
from ..models.mrope import mrope_cos_sin
from .sampling import SamplingParams, sample_token


@partial(jax.jit, donate_argnums=(0,))
def _cache_batch_write(big, chunk, offset):
    """Write a batch-chunk cache into the full-batch cache at batch `offset`
    (axis 1). The big cache is donated, so the update is in place — chunked
    prefill's transient footprint stays at one chunk."""
    return jax.tree_util.tree_map(
        lambda b, c: jax.lax.dynamic_update_slice(
            b, c.astype(b.dtype), (0, offset) + (0,) * (b.ndim - 2)),
        big, chunk)


@dataclass
class GenerationResult:
    sequences: np.ndarray      # [B, max_new_tokens] generated ids (pad-filled)
    lengths: np.ndarray        # [B] number of generated tokens (incl. eos)
    logprobs: np.ndarray | None = None  # [B, max_new_tokens] chosen-token logprobs


@partial(jax.jit, static_argnames=("cfg", "attn_impl", "max_cache_len",
                                   "act_quant", "mesh", "cache_layout",
                                   "kv_quant"))
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
    cache_layout: str = "seq",   # "head": DecodeKVCache for the decode kernel
    kv_quant: str | None = None,  # "int8": quantized KV cache (QuantKVCache)
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
    if attn_impl == "flash" or cache_layout == "head" or kv_quant:
        # head-major and quantized fill attend over the LOCAL prompt-width
        # k/v, so the prefix-causal bias is built inside dot_product_attention
        bias = None
    else:
        # bias spans the whole cache width: causal over the prompt, -inf beyond
        i = jnp.arange(S)[:, None]
        j = jnp.arange(max_cache_len)[None, :]
        allowed = (j <= i) & (j[None] < lengths[:, None, None])
        bias = jnp.where(allowed[:, None], 0.0, -1e30).astype(jnp.float32)
    if kv_quant == "int8":
        assert cache_layout == "seq", "kv_quant uses the seq-major cache"
        cache = QuantKVCache.init(cfg.text, B, max_cache_len)
    else:
        cache_cls = DecodeKVCache if cache_layout == "head" else KVCache
        cache = cache_cls.init(cfg.text, B, max_cache_len, h.dtype)
    if mesh is not None:
        assert cache_layout == "seq", "TP inference uses the seq-major cache"
        from ..parallel.sharding import pin_kv_cache

        cache = pin_kv_cache(cache, mesh, cfg.text.num_key_value_heads)
    # prefill cache: write rows [0, S)
    hidden, cache = decoder_forward(params["model"], cfg.text, h, cos, sin, bias,
                                    cache=cache, cache_position=0,
                                    attn_impl=attn_impl,
                                    kv_lengths=lengths, causal=True,
                                    cache_fill=True, act_quant=act_quant,
                                    mesh=mesh)
    last = hidden[jnp.arange(B), lengths - 1]
    logits = lm_head(params, cfg, last)
    return logits.astype(jnp.float32), cache


@partial(jax.jit, static_argnames=("cfg", "sp", "attn_impl", "mesh", "s_pad",
                                   "act_quant"),
         donate_argnums=(4,))
def decode(
    params: dict,
    cfg: ModelConfig,
    sp: SamplingParams,
    first_logits: jax.Array,     # [B, V] from prefill
    cache: KVCache,              # or DecodeKVCache -> Pallas decode kernel
    lengths: jax.Array,          # [B] prompt lengths
    rope_deltas: jax.Array,      # [B] from get_rope_index
    rng: jax.Array,
    attn_impl: str = "xla",
    mesh=None,                   # TP inference: keep KV head-sharded over "tp"
    s_pad: int | None = None,    # decode-slot start (default: cache width - T)
    act_quant: str | None = None,  # "int8": W8A8 decode matmuls + lm_head —
                                 # at B>=~192 decode is MXU-bound (every bf16
                                 # matmul re-reads 256 rows), the integer MXU
                                 # doubles peak (measured: 0.93 ms/layer bf16
                                 # at B=256 vs ~0.5 roofline)
):
    """Scan `max_new_tokens` decode steps. Returns (tokens [B,T], logprobs [B,T],
    gen_lengths [B], cache).

    The input cache is DONATED and returned (as the scan carry) so XLA
    aliases the multi-GB buffer end to end — exactly one cache allocation
    lives across prefill+decode. Callers must not reuse the passed-in cache
    object afterwards.

    A DecodeKVCache (head-major) routes each step through
    decoder_decode_step — the stacked-cache Pallas kernel that reads KV
    blocks straight from HBM instead of materializing a per-layer slice."""
    B = first_logits.shape[0]
    use_kernel = isinstance(cache, DecodeKVCache)
    max_len = cache.k.shape[3] if use_kernel else cache.k.shape[2]
    # Fixed-slot decode layout: step t's KV rows land at cache position
    # S_pad + t for EVERY sample (the prompt's padded width, not the true
    # length). A uniform scalar position makes the cache write a
    # dynamic-update-slice (in-place on the scan carry) instead of a
    # per-sample scatter; rope positions still use true lengths, and the
    # attention mask admits prompt rows [0, len_b) plus slots [S_pad, S_pad+t].
    if s_pad is None:
        s_pad = max_len - sp.max_new_tokens
    if mesh is not None:
        assert not use_kernel, "TP inference uses the seq-major cache"
        from ..parallel.sharding import pin_kv_cache

        cache = pin_kv_cache(cache, mesh, cfg.text.num_key_value_heads)
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
        # chosen-token logprob via gather + logsumexp — never materializes
        # the full [B, V] log_softmax array (at B=256 that is ~156 MB fp32
        # written+read per step just to gather B scalars)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        logp = logits[jnp.arange(B), tok] - lse
        logp = jnp.where(done, 0.0, logp)
        new_done = done | is_eos(tok)

        # forward one token
        emb = params["model"]["embed_tokens"]["embedding"][tok][:, None]
        pos_scalar = cur_len + rope_deltas            # [B]
        pos3 = jnp.broadcast_to(pos_scalar[None, :, None], (3, B, 1))
        cos, sin = mrope_cos_sin(pos3, cfg, dtype=emb.dtype)
        if use_kernel:
            hidden, cache = decoder_decode_step(
                params["model"], cfg.text, emb, cos, sin, cache,
                lengths, s_pad, t)
        else:
            j = jnp.arange(max_len)[None, :]
            allowed = (j < lengths[:, None]) | ((j >= s_pad) & (j <= s_pad + t))
            bias = jnp.where(allowed[:, None, None], 0.0,
                             -1e30).astype(jnp.float32)
            hidden, cache = decoder_forward(
                params["model"], cfg.text, emb, cos, sin, bias,
                cache=cache, cache_position=s_pad + t, attn_impl=attn_impl,
                causal=False, act_quant=act_quant, mesh=mesh)
        next_logits = lm_head(params, cfg, hidden[:, 0],
                              act_quant).astype(jnp.float32)
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
    decode_impl: str = "auto",     # "kernel": stacked-cache Pallas decode
                                   # (head-major cache, single chip only);
                                   # "xla": seq-major cache + XLA attention.
                                   # auto = kernel when unmeshed.
    kv_quant: str | None = None,   # "int8": quantized KV cache — halves KV
                                   # traffic/footprint (enables B=256 decode
                                   # on one v5e chip)
    decode_act_quant: str | None = "auto",  # W8A8 decode matmuls; "auto" =
                                   # int8 iff act_quant is int8 and B >= 192
                                   # (where decode turns MXU-bound)
    prefill_chunk: int | None = None,  # prefill in batch chunks of this size
                                   # (B=256 prefill OOMs; 2x128 chunks fit),
                                   # then decode the full batch together
    spec_decode: int = 0,          # >0: speculative decoding — verify this
                                   # many n-gram prompt-lookup drafts per
                                   # dispatch (greedy: token-exact vs plain
                                   # decode; sampled: rejection-sampling
                                   # verification, exact distribution). See
                                   # engine/spec_decode.py
) -> GenerationResult:
    """Host-orchestrated batched generation."""
    B, S = input_ids.shape
    # cfg.moe_ragged_decode + mesh: moe_mlp routes decode steps through the
    # ep x tp shard_map'd ragged kernel when the mesh qualifies
    # (ops/moe_ragged.ragged_mesh_ok); otherwise the GSPMD grouped einsum
    # (which reads only local experts per device) runs as before.
    if spec_decode:
        # sampled requests use rejection-sampling verification (exact
        # target distribution, engine/spec_decode.py) — greedy stays
        # token-identical to plain decode. Works under a mesh: verify
        # chunks scatter into the kv-head-sharded cache per shard.
        if kv_quant not in (None, "int8"):
            raise ValueError(f"spec_decode: unsupported kv_quant={kv_quant!r}")
        decode_impl = "xla"
    if decode_impl == "auto":
        # measured on v5e (CLAUDE.md decode history): at decode shapes the
        # XLA path's fused slice+attention already runs near the HBM
        # roofline, while the Pallas stacked-cache kernel's (B, kh) grid of
        # 32 KB block DMAs undershoots bandwidth (37 vs 17 ms/step at
        # B=128/S=384) — kernel stays opt-in for long-context small-batch
        decode_impl = "xla"
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
    if decode_impl == "kernel":
        # head-major cache for the Pallas decode kernel: width padded to the
        # kernel's block size; decode slots start at the prompt pad width S
        from ..ops.decode_attention import BLOCK_S

        assert kv_quant is None, "decode kernel is bf16-cache only"
        max_cache = -(-(S + sp.max_new_tokens) // BLOCK_S) * BLOCK_S
        layout, s_pad = "head", S
    else:
        # spec decode scatters W-token verify chunks at per-row frontiers;
        # the last chunk can reach s_pad + T + K, so pad the width
        max_cache = S + sp.max_new_tokens + (spec_decode + 1 if spec_decode
                                             else 0)
        layout, s_pad = "seq", None

    def run_prefill(ids_c, pos_c, len_c, embeds_c=None):
        return prefill(
            params, cfg, jnp.asarray(ids_c), jnp.asarray(pos_c),
            jnp.asarray(len_c), max_cache,
            vision_embeds=embeds_c, vision_token_id=vision_token_id,
            attn_impl=attn_impl, act_quant=act_quant, mesh=mesh,
            cache_layout=layout, kv_quant=kv_quant)

    if prefill_chunk and B > prefill_chunk:
        # chunked prefill fills a seq-major big cache in place; the decode
        # kernel's head-major DecodeKVCache chunks can't be scattered into it
        assert layout != "head", (
            "prefill_chunk is incompatible with decode_impl='kernel' "
            "(chunked prefill writes a seq-major cache; the kernel needs "
            "head-major) — drop prefill_chunk or use decode_impl='xla'")
        # batch-chunked prefill: full-batch prompt MLP intermediates OOM one
        # chip (B=256 text at S=256; B=16 multimodal at S~1.5k), so fill the
        # full-batch cache chunk by chunk — each chunk cache is written into
        # the (donated, in-place) big cache immediately, keeping the
        # transient footprint to one chunk instead of a full second cache.
        # Vision embeds are concatenated in batch order, so each chunk takes
        # the slice covering its rows' vision-pad tokens.
        assert B % prefill_chunk == 0, (B, prefill_chunk)
        if kv_quant == "int8":
            cache = QuantKVCache.init(cfg.text, B, max_cache)
        else:
            dt = params["model"]["embed_tokens"]["embedding"].dtype
            cache = KVCache.init(cfg.text, B, max_cache, dt)
        emb_off = None
        if vision_embeds is not None:
            vtok = (cfg.video_token_id if vision_token_id is None
                    else vision_token_id)
            counts = (np.asarray(input_ids) == vtok).sum(axis=1)
            emb_off = np.concatenate([[0], np.cumsum(counts)])
        lg_parts = []
        for s in range(0, B, prefill_chunk):
            e = s + prefill_chunk
            emb_c = None
            if emb_off is not None and emb_off[e] > emb_off[s]:
                # a chunk with no vision tokens must pass None — a 0-row
                # gather source fails at trace time
                emb_c = vision_embeds[int(emb_off[s]):int(emb_off[e])]
            lg, c = run_prefill(input_ids[s:e], position_ids[:, s:e],
                                np.asarray(lengths)[s:e], emb_c)
            lg_parts.append(lg)
            cache = _cache_batch_write(cache, c, s)
        logits = jnp.concatenate(lg_parts, axis=0)
    else:
        logits, cache = run_prefill(input_ids, position_ids, lengths,
                                    vision_embeds)
    if decode_act_quant == "auto":
        decode_act_quant = "int8" if (act_quant == "int8" and B >= 192) else None
    if spec_decode:
        from .spec_decode import spec_decode as spec_decode_loop

        toks, logps, gen_len, _ = spec_decode_loop(
            params, cfg, sp, logits, cache, jnp.asarray(lengths),
            jnp.asarray(rope_deltas), jnp.asarray(input_ids), s_pad=S,
            spec_k=spec_decode, act_quant=decode_act_quant,
            rng=jax.random.PRNGKey(seed), mesh=mesh)
        return GenerationResult(np.asarray(toks), np.asarray(gen_len),
                                np.asarray(logps))
    toks, logps, gen_len, _ = decode(
        params, cfg, sp, logits, cache, jnp.asarray(lengths),
        jnp.asarray(rope_deltas), jax.random.PRNGKey(seed), attn_impl=attn_impl,
        mesh=mesh, s_pad=s_pad, act_quant=decode_act_quant)
    return GenerationResult(np.asarray(toks), np.asarray(gen_len),
                            np.asarray(logps))
