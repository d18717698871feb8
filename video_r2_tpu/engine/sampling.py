"""Token sampling: greedy / temperature / top-k / top-p.

Parity surface: the reference's GenerationConfig construction
(grpo_trainer.py:559-570 — do_sample, temperature, top_p, top_k) and HF's
sampling order (temperature scale -> top-k filter -> top-p filter -> sample).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass(frozen=True)
class SamplingParams:
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0            # 0 = disabled
    max_new_tokens: int = 128
    eos_token_ids: tuple[int, ...] = ()
    pad_token_id: int = 0


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k highest logits per row, mask the rest."""
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering: keep the smallest set of tokens with cumulative
    probability >= p (HF semantics: tokens are dropped when the cumulative
    probability *before* them is already >= p)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (inclusive) - own prob < p
    keep_sorted = (cum - probs) < p
    # threshold = smallest kept logit
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(logits < thresh, NEG_INF, logits)


def sample_token(
    logits: jax.Array,        # [B, V]
    rng: jax.Array,
    sp: SamplingParams,
) -> jax.Array:
    """Next token ids [B]."""
    if not sp.do_sample:
        return jnp.argmax(logits, axis=-1)
    scaled = logits.astype(jnp.float32) / max(sp.temperature, 1e-6)
    scaled = apply_top_k(scaled, sp.top_k)
    scaled = apply_top_p(scaled, sp.top_p)
    return jax.random.categorical(rng, scaled, axis=-1)


def sample_token_per_slot(
    logits: jax.Array,        # [N, V]
    rng: jax.Array,
    temperature: jax.Array,   # [N] float (ignored where do_sample is False)
    top_p: jax.Array,         # [N] float (1.0 = off)
    top_k: jax.Array,         # [N] int (0 = off)
    do_sample: jax.Array,     # [N] bool
) -> jax.Array:
    """Per-slot sampling for continuous batching: each slot carries its own
    request's temperature/top_p/top_k (HF order: temp scale -> top-k -> top-p),
    so mixed greedy/sampled requests share one decode step. One [N, V] sort
    serves both filters (top-p cumulates over the k-filtered ranks)."""
    greedy = jnp.argmax(logits, axis=-1)
    filtered = filter_logits_per_slot(logits, temperature, top_p, top_k)
    sampled = jax.random.categorical(rng, filtered, axis=-1)
    return jnp.where(do_sample, sampled, greedy)


def filter_logits_per_slot(
    logits: jax.Array,        # [N, V] (or [N, K, V] — per-slot params
                              # broadcast over the middle axes)
    temperature: jax.Array,   # [N]
    top_p: jax.Array,         # [N]
    top_k: jax.Array,         # [N]
) -> jax.Array:
    """The per-slot TARGET distribution's logits (temperature + top-k +
    top-p) without sampling — speculative verification scores drafts under
    exactly this distribution."""
    V = logits.shape[-1]
    lead = (slice(None),) + (None,) * (logits.ndim - 1)
    scaled = logits.astype(jnp.float32) / jnp.clip(temperature, 1e-6)[lead]
    sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
    ranks = jnp.arange(V)
    k = jnp.where(top_k <= 0, V, jnp.clip(top_k, 1, V))
    in_k = ranks < k[lead]
    sorted_f = jnp.where(in_k, sorted_logits, NEG_INF)
    probs = jax.nn.softmax(sorted_f, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = ((cum - probs) < top_p[lead]) & in_k
    thresh = jnp.min(jnp.where(keep, sorted_f, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(scaled < thresh, NEG_INF, scaled)
