"""Chunked fused linear + cross-entropy (Liger FLCE parity, reference N2).

The reference avoids materializing [B*S, 152k] logits with Liger's Triton
fused-linear-cross-entropy (monkey_patch_forward.py:456-465). The TPU-native
equivalent: scan over token chunks; each chunk computes its logits on the MXU,
reduces to (logsumexp, label logit), and the custom VJP recomputes the chunk's
softmax on the backward pass — peak memory O(chunk x V) instead of O(S x V).

Loss semantics match torch CE with ignore_index=-100 and mean reduction over
non-ignored tokens (constants.py IGNORE_INDEX).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_linear_cross_entropy(
    hidden: jax.Array,    # [N, H] (flattened tokens)
    weight: jax.Array,    # [H, V]
    labels: jax.Array,    # [N] int, IGNORE_INDEX to skip
    chunk_size: int = 1024,
) -> jax.Array:
    """Mean CE over non-ignored tokens; never materializes [N, V]."""
    loss, _ = _forward(hidden, weight, labels, chunk_size)
    return loss


def _pad_to_chunks(x, chunk, fill=0):
    n = x.shape[0]
    pad = (-n) % chunk
    if pad:
        pads = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pads, constant_values=fill)
    return x, n + pad


def _forward(hidden, weight, labels, chunk_size):
    n_orig = hidden.shape[0]
    hidden, n = _pad_to_chunks(hidden, chunk_size)
    labels, _ = _pad_to_chunks(labels, chunk_size, fill=IGNORE_INDEX)
    n_chunks = n // chunk_size
    hc = hidden.reshape(n_chunks, chunk_size, -1)
    lc = labels.reshape(n_chunks, chunk_size)

    def body(carry, inp):
        total, count = carry
        h, lab = inp
        logits = jnp.dot(h.astype(jnp.float32), weight.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        valid = lab != IGNORE_INDEX
        safe = jnp.where(valid, lab, 0)
        ll = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
        losses = jnp.where(valid, lse - ll, 0.0)
        return (total + losses.sum(), count + valid.sum()), None

    (total, count), _ = jax.lax.scan(body, (jnp.float32(0.0), jnp.int32(0)),
                                     (hc, lc))
    loss = total / jnp.maximum(count, 1).astype(jnp.float32)
    return loss, (hidden, weight, labels, n_orig, count)


def _forward_fwd(hidden, weight, labels, chunk_size):
    loss, res = _forward(hidden, weight, labels, chunk_size)
    return loss, res


def _forward_bwd(chunk_size, res, g):
    hidden, weight, labels, n_orig, count = res
    n = hidden.shape[0]
    n_chunks = n // chunk_size
    hc = hidden.reshape(n_chunks, chunk_size, -1)
    lc = labels.reshape(n_chunks, chunk_size)
    inv = g / jnp.maximum(count, 1).astype(jnp.float32)

    def body(dw_acc, inp):
        h, lab = inp
        h32 = h.astype(jnp.float32)
        logits = jnp.dot(h32, weight.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        valid = lab != IGNORE_INDEX
        safe = jnp.where(valid, lab, 0)
        onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=jnp.float32)
        dlogits = (probs - onehot) * valid[:, None].astype(jnp.float32) * inv
        dh = jnp.dot(dlogits, weight.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)
        dw_acc = dw_acc + jnp.dot(h32.T, dlogits,
                                  preferred_element_type=jnp.float32)
        return dw_acc, dh

    dw, dh = jax.lax.scan(body, jnp.zeros_like(weight, jnp.float32), (hc, lc))
    dh = dh.reshape(n, -1)[:n_orig].astype(hidden.dtype)
    return dh, dw.astype(weight.dtype), None


fused_linear_cross_entropy.defvjp(_forward_fwd, _forward_bwd)


def cross_entropy_reference(hidden, weight, labels):
    """Unfused oracle for tests."""
    logits = jnp.dot(hidden.astype(jnp.float32), weight.astype(jnp.float32))
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    return -(jnp.where(valid, ll, 0.0).sum() / jnp.maximum(valid.sum(), 1))
