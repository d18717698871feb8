"""Segment-granular ViT remat (cfg.remat_segment, VERDICT r3 #9).

The depth-32 tower backward exceeds the axon remote compiler's limits at
128-frame shapes (PARITY.md environment ceiling); remat_segment=N nests
the layer scan (outer over segments, jax.checkpoint per segment) to
restructure the compile without changing numerics. These tests pin grad
parity across remat modes on CPU; the chip validation is an on-chip
backlog item.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from video_r2_tpu.models import plan_vision_layout, tiny_test_config
from video_r2_tpu.models.loader import init_params
from video_r2_tpu.models.vision import vit_forward


def _grads(params, cfg, patches, layout, remat, vcfg=None):
    vcfg = vcfg or cfg.vision

    def loss(p):
        out = vit_forward(p, vcfg, patches, layout, attn_impl="xla",
                          remat=remat)
        return (out.astype(jnp.float32) ** 2).sum()

    val, g = jax.value_and_grad(loss)(params)
    return val, g


def test_remat_segment_grad_parity(rng):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")["visual"]
    grid = (2, 8, 8)
    layout = plan_vision_layout([grid], cfg.vision)
    patches = jnp.asarray(
        rng.normal(0, 1, (int(np.prod(grid)), cfg.vision.patch_input_dim)),
        jnp.float32)

    v_plain, g_plain = _grads(params, cfg, patches, layout, remat=False)
    v_layer, g_layer = _grads(params, cfg, patches, layout, remat=True)
    seg_cfg = dataclasses.replace(cfg.vision, remat_segment=2)
    v_seg, g_seg = _grads(params, cfg, patches, layout, remat=True,
                          vcfg=seg_cfg)

    assert np.allclose(float(v_plain), float(v_layer), rtol=1e-6)
    assert np.allclose(float(v_plain), float(v_seg), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_layer),
                    jax.tree_util.tree_leaves(g_seg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_seg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-5)


def test_remat_segment_nondivisor_falls_back(rng):
    """A segment size that doesn't divide depth silently uses the per-layer
    path (same outputs) rather than crashing."""
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")["visual"]
    grid = (2, 4, 4)
    layout = plan_vision_layout([grid], cfg.vision)
    patches = jnp.asarray(
        rng.normal(0, 1, (int(np.prod(grid)), cfg.vision.patch_input_dim)),
        jnp.float32)
    ref = vit_forward(params, cfg.vision, patches, layout, attn_impl="xla",
                      remat=True)
    odd = dataclasses.replace(cfg.vision, remat_segment=3)   # 4 % 3 != 0
    out = vit_forward(params, odd, patches, layout, attn_impl="xla",
                      remat=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
