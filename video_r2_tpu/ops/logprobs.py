"""Chunked per-token log-probabilities (selective log-softmax).

GRPO needs log p(token) for every completion token under policy / old / ref
models (grpo_trainer.py:722-741). At 152k vocab, materializing [B, L, V]
logits is the memory wall the reference solves with Liger's chunked GRPO loss
(N2). Here: lax.scan over token chunks, logits per chunk on the MXU,
logsumexp + gather reduce, custom VJP recomputes the chunk softmax backward —
O(chunk x V) live memory, differentiable w.r.t. hidden AND lm_head weight.

Temperature division is applied to logits before log-softmax (RLHF detail the
reference inherits from TRL).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def chunked_token_logprobs(
    hidden: jax.Array,    # [N, H]
    weight: jax.Array,    # [H, V]
    tokens: jax.Array,    # [N] int
    temperature: float = 1.0,
    chunk_size: int = 1024,
) -> jax.Array:
    """log softmax(h @ W / temperature)[token] per row -> [N] fp32."""
    out, _ = _fwd(hidden, weight, tokens, temperature, chunk_size)
    return out


def _pad(x, chunk, fill=0):
    pad = (-x.shape[0]) % chunk
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), constant_values=fill)
    return x


def _fwd(hidden, weight, tokens, temperature, chunk_size):
    n_orig = hidden.shape[0]
    h = _pad(hidden, chunk_size)
    t = _pad(tokens, chunk_size)
    nc = h.shape[0] // chunk_size
    hc = h.reshape(nc, chunk_size, -1)
    tc = t.reshape(nc, chunk_size)

    def body(_, inp):
        hch, tch = inp
        logits = jnp.dot(hch.astype(jnp.float32), weight.astype(jnp.float32),
                         preferred_element_type=jnp.float32) / temperature
        lse = jax.nn.logsumexp(logits, axis=-1)
        ll = jnp.take_along_axis(logits, tch[:, None], axis=-1)[:, 0]
        return None, ll - lse

    _, lp = jax.lax.scan(body, None, (hc, tc))
    lp = lp.reshape(-1)[:n_orig]
    return lp, (hidden, weight, tokens, n_orig)


def _fwd_fwd(hidden, weight, tokens, temperature, chunk_size):
    return _fwd(hidden, weight, tokens, temperature, chunk_size)


def _fwd_bwd(temperature, chunk_size, res, g):
    hidden, weight, tokens, n_orig = res
    h = _pad(hidden, chunk_size)
    t = _pad(tokens, chunk_size)
    gp = _pad(g, chunk_size)
    nc = h.shape[0] // chunk_size
    hc = h.reshape(nc, chunk_size, -1)
    tc = t.reshape(nc, chunk_size)
    gc = gp.reshape(nc, chunk_size)

    def body(dw_acc, inp):
        hch, tch, gch = inp
        h32 = hch.astype(jnp.float32)
        logits = jnp.dot(h32, weight.astype(jnp.float32),
                         preferred_element_type=jnp.float32) / temperature
        probs = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(tch, logits.shape[-1], dtype=jnp.float32)
        dlogits = (onehot - probs) * gch[:, None] / temperature
        dh = jnp.dot(dlogits, weight.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)
        dw_acc = dw_acc + jnp.dot(h32.T, dlogits,
                                  preferred_element_type=jnp.float32)
        return dw_acc, dh

    dw, dh = jax.lax.scan(body, jnp.zeros_like(weight, jnp.float32),
                          (hc, tc, gc))
    dh = dh.reshape(-1, hidden.shape[-1])[:n_orig].astype(hidden.dtype)
    return dh, dw.astype(weight.dtype), None


chunked_token_logprobs.defvjp(_fwd_fwd, _fwd_bwd)
