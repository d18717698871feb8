"""Speculative decoding: n-gram prompt-lookup drafting + batched verify.

Greedy decode emits ONE token per decoder dispatch; speculative decoding
emits 1 + a per dispatch, where a is the number of draft tokens the model
confirms. This implementation is reference-free ("prompt lookup decoding",
the scheme vLLM ships as `speculative_model="[ngram]"`): drafts come from
matching the last bigram of the running sequence against the prompt +
generated history and proposing the K tokens that followed it — free to
produce, and effective exactly on the reference's workloads (video QA
answers quote subtitles/options; TAC/VAS judge outputs echo the prompt's
format strings; `<think>` reasoning is self-repetitive).

Exactness, both modes:
- GREEDY: a draft is only kept when it equals the argmax the full model
  produces at that position, and the pending token is always the model's
  own argmax — the emitted sequence is identical to plain greedy decode,
  token for token.
- SAMPLED: rejection-sampling verification (Leviathan & Chen's speculative
  sampling, specialized to the deterministic n-gram proposal) — draft d
  accepts with probability p(d) under the request's filtered target
  distribution, and on rejection the next pending token samples from the
  exact residual (p with d's mass masked). The emitted stream is an exact
  sample from the plain sampling loop's distribution (distributional, not
  bitwise, parity — rng consumption differs).

TPU design notes:
- one `lax.while_loop` inside jit; each iteration verifies a [B, K+1] chunk
  in one decoder forward (the MXU sees a K+1-row matmul instead of K+1
  separate 1-row dispatches — decode is weight-HBM-bound, so the chunk is
  nearly the same wall-time as a single-token step);
- rows advance at different rates, so chunk KV writes are per-sample
  scatters at each row's frontier `s_pad + gen_len_b` (the committed region
  is never overwritten — rejected-draft slots hold junk beyond the frontier
  and the attention bias masks them until they are legitimately refilled);
- the history buffer, output buffer, and acceptance bookkeeping are all
  fixed-shape; per-row emit counts ride as masks (no dynamic shapes).

Reference bar: the reference has no speculative decoding (HF `generate`,
eval qwen2_5_vl.py:326-336); this is a beyond-parity serving feature.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.decoder import KVCache, decoder_forward
from ..models.model import lm_head
from ..models.mrope import mrope_cos_sin
from .sampling import SamplingParams


def _filtered(logits: jax.Array, sp: SamplingParams) -> jax.Array:
    """The TARGET sampling distribution's logits: temperature + top-k +
    top-p, exactly as engine/sampling.sample_token applies them."""
    from .sampling import apply_top_k, apply_top_p

    scaled = logits.astype(jnp.float32) / max(sp.temperature, 1e-6)
    return apply_top_p(apply_top_k(scaled, sp.top_k), sp.top_p)


@partial(jax.jit, static_argnames=("cfg", "sp", "s_pad", "spec_k",
                                   "act_quant", "_reject_all", "mesh"),
         donate_argnums=(4,))
def spec_decode(
    params: dict,
    cfg: ModelConfig,
    sp: SamplingParams,
    first_logits: jax.Array,     # [B, V] from prefill
    cache: KVCache,              # seq-major (or QuantKVCache — int8-KV spec:
                                 # verify chunks quantize per token and
                                 # scatter values+scales at row frontiers),
                                 # width >= s_pad + T + K + 1
    lengths: jax.Array,          # [B] prompt lengths
    rope_deltas: jax.Array,      # [B] shifted as in generate()
    input_ids: jax.Array,        # [B, S] right-padded prompt (draft source)
    s_pad: int,                  # decode slots start here (prompt pad width)
    spec_k: int = 4,             # drafts verified per dispatch
    act_quant: str | None = None,
    _reject_all: bool = False,   # profiling: force acceptance ~0 to measure
                                 # the verify-overhead floor
    rng: jax.Array | None = None,  # required when sp.do_sample
    mesh=None,                   # TP inference: KV head-sharded over "tp"
                                 # (verify chunks scatter per shard; the
                                 # continuous engines already speculate
                                 # sharded — this is the batch-path analog)
):
    """Speculative decode — greedy or SAMPLED.

    Greedy (sp.do_sample False): drafts accept iff they equal the model's
    argmax — the emitted stream is token-identical to plain greedy decode.

    Sampled (sp.do_sample True): rejection-sampling verification
    (Leviathan/Chen speculative sampling, specialized to a DETERMINISTIC
    n-gram proposal q = delta_d): draft d at position i accepts with
    probability p_i(d) where p_i is the target distribution (temperature +
    top-k/top-p filtered softmax); on rejection the next pending token is
    sampled from the exact residual norm(max(0, p - q)) — for a delta
    proposal that is p with d's mass removed, implemented by masking d in
    the NEXT round's filtered logits (the filters are part of p, so they
    are computed on the unmasked logits first). The emitted stream is an
    exact sample from the same distribution as the plain sampling loop —
    distributional parity, not bitwise (rng consumption differs);
    tests/test_spec_decode.py pins both.

    Returns (tokens [B,T], logprobs [B,T], gen_lengths [B], iters)."""
    B, V = first_logits.shape
    T = sp.max_new_tokens
    K = spec_k
    W = K + 1
    S_in = input_ids.shape[1]
    max_len = cache.k.shape[2]
    b_idx = jnp.arange(B)
    eos = (jnp.asarray(sp.eos_token_ids, jnp.int32)
           if sp.eos_token_ids else None)

    def is_eos(tok):
        if eos is None:
            return jnp.zeros_like(tok, dtype=bool)
        return jnp.any(tok[..., None] == eos, axis=-1)

    if mesh is not None:
        # pin the cache's kv-head "tp" sharding (as decode() does) so GSPMD
        # keeps the multi-GB buffer put across the while_loop's scatters
        from ..parallel.sharding import pin_kv_cache

        cache = pin_kv_cache(cache, mesh, cfg.text.num_key_value_heads)

    # history = [prompt | generated] with a W-token scratch tail so frontier
    # scatters never collide under index clipping
    Lh = S_in + T + W
    hist0 = jnp.zeros((B, Lh), jnp.int32).at[:, :S_in].set(
        input_ids.astype(jnp.int32))

    def draft(hist, tok0, gen_len):
        """Last-bigram prompt lookup: find the latest position p with
        hist[p] == prev, hist[p+1] == tok0 and K following tokens fully
        inside the valid prompt or generated region; propose those K."""
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
        # no match: propose tok0 repeats (harmless — verify rejects them)
        return jnp.where(has[:, None], drafts, tok0[:, None])

    def cond(carry):
        gen_len, done, it = carry[3], carry[4], carry[7]
        return (it < T) & jnp.any(~done & (gen_len < T))

    def body(carry):
        (logits, cache, hist, gen_len, done, out, outlp, it,
         rng_k, rej_tok) = carry
        if sp.do_sample:
            rng_k, k_tok, k_acc = jax.random.split(rng_k, 3)
            l0 = _filtered(logits, sp)
            # residual after a rejected draft: p with that token's mass
            # removed (mask AFTER filtering — the filters define p)
            l0 = jnp.where(
                (jnp.arange(V)[None, :] == rej_tok[:, None])
                & (rej_tok[:, None] >= 0), -jnp.inf, l0)
            tok0 = jax.random.categorical(k_tok, l0, axis=-1).astype(jnp.int32)
        else:
            tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lse0 = jax.scipy.special.logsumexp(logits, axis=-1)
        lp0 = logits[b_idx, tok0] - lse0
        drafts = draft(hist, tok0, gen_len)
        if _reject_all:
            # -2 matches no real token in EITHER mode (greedy argmax is
            # never negative; the sampled path maps it to -inf below) —
            # V-1 was a real token that could spuriously accept
            drafts = jnp.full_like(drafts, -2)
        chunk = jnp.concatenate([tok0[:, None], drafts], axis=1)  # [B, W]

        # one verify forward over the W-token chunk at each row's frontier
        emb = params["model"]["embed_tokens"]["embedding"][chunk]
        pos = (lengths + gen_len)[:, None] + jnp.arange(W)[None, :] \
            + rope_deltas[:, None]
        pos3 = jnp.broadcast_to(pos[None], (3, B, W))
        cos, sin = mrope_cos_sin(pos3, cfg, dtype=emb.dtype)
        j = jnp.arange(max_len)[None, None, :]
        i = jnp.arange(W)[None, :, None]
        allowed = (j < lengths[:, None, None]) | (
            (j >= s_pad) & (j < s_pad + gen_len[:, None, None] + i + 1))
        bias = jnp.where(allowed[:, None], 0.0, -1e30).astype(jnp.float32)
        hidden, cache = decoder_forward(
            params["model"], cfg.text, emb, cos, sin, bias, cache=cache,
            cache_position=s_pad + gen_len, attn_impl="xla", causal=False,
            act_quant=act_quant, mesh=mesh)
        logits_w = lm_head(params, cfg, hidden, act_quant).astype(jnp.float32)

        lse_w = jax.scipy.special.logsumexp(logits_w, axis=-1)
        if sp.do_sample:
            # rejection sampling: accept draft i with prob p_i(d_i) under
            # the FILTERED target distribution (deterministic proposal)
            pf = _filtered(logits_w[:, :K], sp)                  # [B, K, V]
            dsafe = jnp.clip(drafts, 0, V - 1)
            ld = (jnp.take_along_axis(pf, dsafe[..., None], axis=-1)[..., 0]
                  - jax.scipy.special.logsumexp(pf, axis=-1))
            ld = jnp.where(drafts == dsafe, ld, -jnp.inf)  # _reject_all
            u = jax.random.uniform(k_acc, (B, K))
            match = (jnp.log(u) < ld).astype(jnp.int32)
        else:
            # draft i is accepted iff it equals the model's argmax at its
            # position AND every earlier draft was accepted
            g = jnp.argmax(logits_w, axis=-1).astype(jnp.int32)  # [B, W]
            match = (drafts == g[:, :K]).astype(jnp.int32)
        acc = jnp.cumprod(match, axis=1)
        a = acc.sum(axis=1)                                      # [B]
        n_commit = 1 + a

        # eos inside the committed prefix truncates it; cap at budget
        n_emit = jnp.minimum(n_commit, T - gen_len)
        emit_i = jnp.arange(W)[None, :]
        emit_mask = (emit_i < n_emit[:, None]) & ~done[:, None]
        eos_emitted = jnp.any(is_eos(chunk) & emit_mask, axis=1)
        first_eos = jnp.argmax(is_eos(chunk) & emit_mask, axis=1)
        n_emit = jnp.where(eos_emitted, first_eos + 1, n_emit)
        n_emit = jnp.where(done, 0, n_emit)
        emit_mask = (emit_i < n_emit[:, None])

        # logprobs: tok0 from the carried logits; accepted draft i scores
        # under the verify logits at position i-1
        lp_d = jnp.take_along_axis(logits_w[:, :K], drafts[..., None],
                                   axis=-1)[..., 0] - lse_w[:, :K]
        lp_chunk = jnp.concatenate([lp0[:, None], lp_d], axis=1)

        # scatter committed tokens into out / logprobs / history (indices are
        # strictly increasing per row — no duplicate targets)
        idxs = gen_len[:, None] + emit_i
        cur = out[b_idx[:, None], idxs]
        out = out.at[b_idx[:, None], idxs].set(
            jnp.where(emit_mask, chunk, cur))
        curlp = outlp[b_idx[:, None], idxs]
        outlp = outlp.at[b_idx[:, None], idxs].set(
            jnp.where(emit_mask, lp_chunk, curlp))
        hidx = S_in + idxs
        curh = hist[b_idx[:, None], hidx]
        hist = hist.at[b_idx[:, None], hidx].set(
            jnp.where(emit_mask, chunk, curh))

        new_gen = gen_len + n_emit
        new_done = done | eos_emitted | (new_gen >= T)
        # next pending distribution = verify logits after the last emitted
        # token; rows that emitted nothing keep their stale logits (done)
        sel = jnp.clip(n_emit - 1, 0, K)
        advanced = n_emit > 0
        new_logits = jnp.where(advanced[:, None], logits_w[b_idx, sel],
                               logits)
        if sp.do_sample:
            # a rejection at draft index `a` (only when the full commit was
            # emitted — an EOS/budget truncation invalidates the frontier)
            rejected = advanced & (a < K) & (n_emit == n_commit)
            new_rej = jnp.where(
                rejected, drafts[b_idx, jnp.minimum(a, K - 1)], -1)
            rej_tok = jnp.where(advanced, new_rej, rej_tok)
        return (new_logits, cache, hist, new_gen, new_done, out, outlp,
                it + 1, rng_k, rej_tok)

    out0 = jnp.full((B, T + W), sp.pad_token_id, jnp.int32)
    outlp0 = jnp.zeros((B, T + W), jnp.float32)
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)
    carry = (first_logits, cache, hist0, jnp.zeros(B, jnp.int32),
             jnp.zeros(B, bool), out0, outlp0, jnp.zeros((), jnp.int32),
             rng0, jnp.full((B,), -1, jnp.int32))
    (_, _, _, gen_len, _, out, outlp, iters, _, _) = jax.lax.while_loop(
        cond, body, carry)
    return out[:, :T], outlp[:, :T], gen_len, iters
