"""Pipeline parallelism: GPipe microbatch schedule over the stacked decoder.

The reference has no pipeline parallelism (SURVEY §2.5 — its 7B policy fits
one GPU's ZeRO-3 shard), but a TPU-native framework scaling past one slice
wants it: PP moves only activation-sized tensors over the link between stages
(one [mb, S, H] buffer per tick), so it is the axis that tolerates the slow
DCN between pods, with fsdp/tp/sp staying on intra-slice ICI.

Design (TPU-first, not a torch-pipe translation):
- The decoder's layers are ALREADY stacked on a leading axis and scanned
  (models/decoder.py). PP shards that axis over a "pp" mesh axis — each
  device holds a contiguous block of L/P layers; no per-stage module
  surgery, the parameter pytree is unchanged.
- The schedule runs inside a partially-manual `jax.shard_map` (manual over
  "pp" only): dp/fsdp/tp stay GSPMD-auto inside the body, so FSDP
  all-gathers and TP collectives compose with the pipeline for free.
- GPipe over T = M + P - 1 ticks via `lax.scan`: at tick t, stage p runs
  microbatch (t - p) through its local layer block (itself a `lax.scan`,
  remat'd per layer), then `ppermute`s the activations one hop to stage
  p+1. Warmup/drain bubbles compute on zeros and are masked out of the
  output buffer. Bubble fraction = (P-1)/(M+P-1).
- Differentiable end-to-end: ppermute transposes to the reverse ppermute,
  the tick scan transposes to the reverse schedule (activations re-flow
  backward through the stages), so `jax.grad` of a pipelined loss IS 1F1B-
  style pipelined backprop without hand-written backward plumbing.
- Embedding / lm_head / final norm run outside the pipeline, replicated
  over "pp" (each stage redundantly computes them — they are <5% of 7B
  FLOPs; a dedicated embed/head stage is not worth the extra bubble).

Parity anchor: composes with the FSDP/TP rules of parallel/sharding.py
(reference ZeRO-3, train/scripts/zero3.json); PP itself is a beyond-parity
scaling feature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_decoder_forward(
    model_params: dict,               # params["model"]: {"layers", "norm"}
    cfg,                              # TextConfig
    hidden: jax.Array,                # [B, S, H] input embeddings
    cos: jax.Array,                   # [B, S, head_dim]
    sin: jax.Array,
    mesh: Mesh,
    *,
    num_microbatches: int | None = None,
    attn_impl: str = "xla",           # "xla" | "flash"
    attention_mask: jax.Array | None = None,   # [B, S]
    kv_lengths: jax.Array | None = None,       # [B] (flash prefix lengths)
    segment_ids: jax.Array | None = None,      # [B, S] (flash packed/gap mask)
    remat: bool = True,
    axis: str = "pp",
) -> jax.Array:
    """Run the stacked decoder as a GPipe pipeline over mesh axis `axis`.

    Equivalent math to decoder_forward(..., causal=True) without a cache;
    returns the final hidden states [B, S, H] (post final norm), replicated
    over the pp axis. Batch B must be divisible by num_microbatches.
    """
    from ..models.decoder import _layer, causal_mask_bias
    from ..models.layers import rms_norm

    if attn_impl not in ("xla", "flash"):
        raise ValueError(
            f"pipeline supports attn_impl 'xla'|'flash', got {attn_impl!r} "
            "(sp shards the sequence axis with its own shard_map and cannot "
            "nest inside the pp schedule)")
    n_stages = int(mesh.shape[axis])
    layers = model_params["layers"]
    n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by pp={n_stages}")
    B, S, H = hidden.shape
    M = num_microbatches or min(B, 2 * n_stages)
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    mb = B // M

    has_segments = segment_ids is not None
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    if kv_lengths is None:
        kv_lengths = attention_mask.sum(-1).astype(jnp.int32)
    if segment_ids is None:
        segment_ids = jnp.zeros((B, S), jnp.int32)

    hid_mb = hidden.reshape(M, mb, S, H)
    cos_mb = cos.reshape(M, mb, *cos.shape[1:])
    sin_mb = sin.reshape(M, mb, *sin.shape[1:])
    mask_mb = attention_mask.reshape(M, mb, S)
    kvl_mb = kv_lengths.astype(jnp.int32).reshape(M, mb)
    seg_mb = segment_ids.astype(jnp.int32).reshape(M, mb, S)

    def body(layers_local, hid, cosm, sinm, maskm, kvlm, segm):
        p_idx = jax.lax.axis_index(axis)

        def stage_fwd(x, m):
            cos_m = jax.lax.dynamic_index_in_dim(cosm, m, 0, keepdims=False)
            sin_m = jax.lax.dynamic_index_in_dim(sinm, m, 0, keepdims=False)
            if attn_impl == "flash":
                bias = None
                kvl = jax.lax.dynamic_index_in_dim(kvlm, m, 0, keepdims=False)
                seg = (jax.lax.dynamic_index_in_dim(segm, m, 0, keepdims=False)
                       if has_segments else None)
            else:
                mask_m = jax.lax.dynamic_index_in_dim(maskm, m, 0,
                                                      keepdims=False)
                bias = causal_mask_bias(S, mask_m)
                kvl, seg = None, None

            def layer_body(x, lp):
                x, _ = _layer(lp, x, cos_m, sin_m, bias, cfg,
                              attn_impl=attn_impl, kv_lengths=kvl,
                              causal=True, segment_ids=seg)
                return x, None

            if remat:
                layer_body = jax.checkpoint(layer_body)
            x, _ = jax.lax.scan(layer_body, x, layers_local)
            return x

        n_ticks = M + n_stages - 1
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            x_cur, out = carry
            m = jnp.clip(t - p_idx, 0, M - 1)
            inp = jax.lax.dynamic_index_in_dim(hid, jnp.clip(t, 0, M - 1), 0,
                                               keepdims=False)
            x_in = jnp.where(p_idx == 0, inp, x_cur)
            y = stage_fwd(x_in, m)
            # hand activations to the next stage; stage 0 receives zeros
            # (never read — it always takes fresh input)
            x_next = jax.lax.ppermute(y, axis, perm) if perm else y
            # last stage banks microbatch t-(P-1) once it exists
            o = t - (n_stages - 1)
            oc = jnp.clip(o, 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(out, oc, 0, keepdims=False)
            val = jnp.where((p_idx == n_stages - 1) & (o >= 0), y, prev)
            out = jax.lax.dynamic_update_index_in_dim(out, val, oc, 0)
            return (x_next, out), None

        x0 = jnp.zeros((mb, S, H), hid.dtype)
        out0 = jnp.zeros((M, mb, S, H), hid.dtype)
        (_, out), _ = jax.lax.scan(tick, (x0, out0), jnp.arange(n_ticks))
        # only the last stage holds real outputs; broadcast over pp
        out = jax.lax.psum(
            jnp.where(p_idx == n_stages - 1, out, jnp.zeros_like(out)), axis)
        return out

    lay_spec = jax.tree_util.tree_map(lambda _: P(axis), layers)
    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(lay_spec, P(), P(), P(), P(), P(), P()),
                      out_specs=P(), axis_names={axis}, check_vma=False)
    out = f(layers, hid_mb, cos_mb, sin_mb, mask_mb, kvl_mb, seg_mb)
    hidden = out.reshape(B, S, H)
    return rms_norm(model_params["norm"]["scale"], hidden, cfg.rms_norm_eps)
