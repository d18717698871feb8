"""Attention tap: last-layer generated->video attention mass.

Oracle check vs HF output_attentions on the tiny golden model."""

import numpy as np
import pytest

from tests.hf_ref import build_hf_tiny, video_token_sequence
from video_r2_tpu.models import convert_hf_state_dict, get_rope_index, plan_vision_layout
from video_r2_tpu.models.attention_tap import attention_to_video_scores


def test_attention_tap_matches_hf(rng):
    import torch

    model, cfg = build_hf_tiny()
    model.set_attn_implementation("eager")
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")

    grid = (2, 4, 4)
    patches = rng.normal(size=(32, cfg.vision.patch_input_dim)).astype(np.float32)
    ids = video_token_sequence(cfg, grid, prefix=[5, 6], suffix=[7, 8, 9, 10])
    spg = np.array([1.0])
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids),
            pixel_values_videos=torch.from_numpy(patches),
            video_grid_thw=torch.tensor([list(grid)]),
            second_per_grid_ts=torch.tensor(spg),
            output_attentions=True,
        )
    last_attn = out.attentions[-1].numpy()  # [B, nh, S, S]
    video_mask = (ids == cfg.video_token_id)
    # "generated" queries: pretend last 4 tokens are the completion
    qmask = np.zeros_like(ids)
    qmask[:, -4:] = 1
    ref_mass = last_attn[:, :, :, :] * video_mask[:, None, None, :]
    ref_per_q = ref_mass.sum(-1).mean(1)  # [B, S] mean over heads
    ref = (ref_per_q * qmask).sum(-1) / qmask.sum(-1)

    pos, _ = get_rope_index(ids, cfg, video_grid_thw=np.array([grid]),
                            second_per_grid_ts=spg)
    layout = plan_vision_layout([grid], cfg.vision)
    ours = attention_to_video_scores(
        params, cfg, ids, pos, np.ones_like(ids), qmask,
        video_patches=patches, video_layout=layout)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
    assert 0.0 <= float(ours[0]) <= 1.0

    # windowed + tiny key chunks (exercise chunk boundaries and tail padding)
    # must give the same answer: queries outside the window have qmask 0
    windowed = attention_to_video_scores(
        params, cfg, ids, pos, np.ones_like(ids), qmask,
        video_patches=patches, video_layout=layout,
        completion_window=4, key_chunk=3)
    np.testing.assert_allclose(np.asarray(windowed), ref, rtol=1e-4, atol=1e-5)


def test_attention_tap_bounded_memory_at_eval_scale():
    """The tap must lower at the 128-frame eval shape (S~33k) WITHOUT any
    S x S intermediate: the round-1 implementation materialized last-layer
    probs (~120 GB at this shape). Trace at S=32768 and assert no jaxpr
    value exceeds a linear-in-S bound (VERDICT r1 item 4)."""
    import jax
    import jax.numpy as jnp

    from video_r2_tpu.models import init_params, tiny_test_config

    cfg = tiny_test_config()
    S, W, CK = 32768, 1024, 2048
    H = cfg.text.hidden_size

    def tap(params, ids, pos, amask, qmask, embeds):
        return attention_to_video_scores(
            params, cfg, ids, pos, amask, qmask,
            video_embeds=embeds, completion_window=W, key_chunk=CK,
            attn_impl="flash")

    params = jax.eval_shape(lambda: init_params(cfg, method="zeros",
                                                dtype="float32"))
    args = (params,
            jax.ShapeDtypeStruct((1, S), jnp.int32),
            jax.ShapeDtypeStruct((3, 1, S), jnp.int32),
            jax.ShapeDtypeStruct((1, S), jnp.int32),
            jax.ShapeDtypeStruct((1, S), jnp.int32),
            jax.ShapeDtypeStruct((8, H), jnp.float32))
    jaxpr = jax.make_jaxpr(tap)(*args)

    # bound = the intended per-chunk score buffer O(heads x W x key_chunk);
    # anything S x S-shaped (1.07e9 elements at S=32768) is 100x over it
    limit = cfg.text.num_attention_heads * W * CK
    too_big = []

    def walk(jx):
        for eqn in jx.eqns:
            for v in eqn.outvars:
                if hasattr(v, "aval") and hasattr(v.aval, "size"):
                    if v.aval.size > limit:
                        too_big.append((eqn.primitive.name, v.aval.shape))
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                if isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)

    walk(jaxpr.jaxpr)
    assert not too_big, f"oversized intermediates: {too_big[:5]}"
