"""Mesh/sharding + SFT train-step tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_r2_tpu.models import init_params, tiny_test_config
from video_r2_tpu.parallel import MeshConfig, make_mesh, param_shardings, shard_params
from video_r2_tpu.train import (
    OptimConfig,
    SFTConfig,
    init_train_state,
    make_optimizer,
    make_sft_step,
    sft_loss,
)
from video_r2_tpu.ops.fused_ce import IGNORE_INDEX


def _batch(cfg, rng, B=4, S=16):
    ids = rng.integers(2, 400, size=(B, S))
    labels = ids.copy()
    labels[:, :5] = IGNORE_INDEX  # prompt masking
    pos = np.broadcast_to(np.arange(S)[None, None], (3, B, S)).copy()
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(pos),
        "attention_mask": jnp.ones((B, S), jnp.int32),
    }


def test_mesh_and_param_shardings():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(MeshConfig(dp=1, fsdp=4, tp=2))
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    sh = param_shardings(params, mesh)
    # q kernel [L, H, H]: H=48 divisible by fsdp=4 and tp=2
    q_spec = sh["model"]["layers"]["attn"]["q"]["kernel"].spec
    assert q_spec == jax.sharding.PartitionSpec(None, "fsdp", "tp")
    # norm scales replicated
    assert sh["model"]["norm"]["scale"].spec == jax.sharding.PartitionSpec()
    sharded = shard_params(params, mesh)
    np.testing.assert_allclose(
        np.asarray(sharded["model"]["layers"]["attn"]["q"]["kernel"]),
        np.asarray(params["model"]["layers"]["attn"]["q"]["kernel"]))


def test_sft_step_single_device(rng):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10), params)
    step = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt)
    state = init_train_state(params, opt)
    batch = _batch(cfg, rng)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses  # overfits a fixed batch
    assert int(state.step) == 5


def test_sft_step_sharded_matches_single(rng):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10), params)
    batch = _batch(cfg, rng, B=8)

    state1 = init_train_state(params, opt)
    step1 = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt, donate=False)
    _, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    state2 = init_train_state(params, opt, mesh=mesh)
    step2 = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt, mesh=mesh,
                          donate=False)
    sbatch = step2.shard_batch(batch)
    _, m2 = step2(state2, sbatch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def _mm_batch(cfg, rng, B=4, grid=(2, 4, 4)):
    """B identical-shape videos: ids = prefix + vision_start + pads +
    vision_end + suffix per row; patches concatenated across the batch."""
    from video_r2_tpu.models import get_rope_index, plan_vision_layout

    t, h, w = grid
    n_tok = t * (h // 2) * (w // 2)
    n_patch = t * h * w
    row = ([5, 6, 7] + [cfg.vision_start_token_id] + [cfg.video_token_id] * n_tok
           + [cfg.vision_end_token_id] + [8, 9])
    ids = np.asarray([row] * B, np.int32)
    S = ids.shape[1]
    labels = ids.copy().astype(np.int32)
    labels[:, :-2] = IGNORE_INDEX
    pos, _ = get_rope_index(ids, cfg, video_grid_thw=np.asarray([grid] * B),
                            second_per_grid_ts=np.asarray([1.0] * B))
    layout = plan_vision_layout([grid] * B, cfg.vision)
    patches = rng.normal(size=(n_patch * B, cfg.vision.patch_input_dim)
                         ).astype(np.float32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(np.asarray(pos)),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "video_patches": jnp.asarray(patches),
    }
    return batch, layout


def test_vit_forward_sharded_matches_single(rng):
    """The vision tower executes under the mesh: sharded visual params
    produce the same embeddings as single-device (the reference always runs
    the ViT under ZeRO-3 — train_sft.py:124-129 + zero3.json)."""
    from video_r2_tpu.models import plan_vision_layout
    from video_r2_tpu.models.vision import vit_forward

    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    grid = (2, 12, 20)  # ragged windows exercise the padded layout
    layout = plan_vision_layout([grid], cfg.vision)
    patches = rng.normal(size=(np.prod(grid), cfg.vision.patch_input_dim)
                         ).astype(np.float32)

    ref = np.asarray(vit_forward(params["visual"], cfg.vision,
                                 jnp.asarray(patches), layout,
                                 attn_impl="xla"))

    mesh = make_mesh(MeshConfig(dp=1, fsdp=4, tp=2))
    sharded = shard_params(params, mesh)
    out = np.asarray(jax.jit(
        lambda v, p: vit_forward(v, cfg.vision, p, layout, attn_impl="xla"))(
            sharded["visual"], jnp.asarray(patches)))
    # f32 reduction-order noise from sharded partial sums (~5e-5 abs)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=1e-4)


def test_sft_multimodal_sharded_matches_single(rng):
    """Sharded multimodal SFT step (video patches through embed_inputs)
    matches single-device loss — the vision half of the multi-chip story."""
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10), params)
    batch, layout = _mm_batch(cfg, rng, B=4)

    state1 = init_train_state(params, opt)
    step1 = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt,
                          video_layout=layout, donate=False)
    s1, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    state2 = init_train_state(params, opt, mesh=mesh)
    step2 = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt, mesh=mesh,
                          video_layout=layout, donate=False)
    sbatch = step2.shard_batch(batch)
    s2, m2 = step2(state2, sbatch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # the ViT params were updated (not frozen, gradients flowed through it)
    assert not np.array_equal(
        np.asarray(s2.params["visual"]["blocks"]["attn"]["qkv"]["kernel"]),
        np.asarray(params["visual"]["blocks"]["attn"]["qkv"]["kernel"]))
    # and updated identically to the single-device step
    np.testing.assert_allclose(
        np.asarray(s2.params["visual"]["blocks"]["attn"]["qkv"]["kernel"]),
        np.asarray(s1.params["visual"]["blocks"]["attn"]["qkv"]["kernel"]),
        rtol=1e-3, atol=1e-5)


def test_sft_step_flash_matches_xla(rng):
    """SFT trains through the flash kernel's custom VJP (reference N1:
    FlashAttention-2 is the training attention, train_sft.py:127) — loss and
    updated params match the XLA path."""
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10), params)
    batch = _batch(cfg, rng, B=2, S=16)

    outs = {}
    for impl in ("xla", "flash"):
        step = make_sft_step(cfg, SFTConfig(ce_chunk_size=32, attn_impl=impl),
                             opt, donate=False)
        state, m = step(init_train_state(params, opt), batch)
        outs[impl] = (float(m["loss"]),
                      np.asarray(state.params["model"]["layers"]["mlp"]
                                 ["gate"]["kernel"]))
    np.testing.assert_allclose(outs["flash"][0], outs["xla"][0], rtol=2e-5)
    np.testing.assert_allclose(outs["flash"][1], outs["xla"][1],
                               rtol=1e-3, atol=1e-5)


def test_freeze_flags(rng):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(
        OptimConfig(learning_rate=1e-2, total_steps=10,
                    freeze_vision=True, freeze_merger=True), params)
    step = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt, donate=False)
    state = init_train_state(params, opt)
    new_state, _ = step(state, _batch(cfg, rng))
    # vision params unchanged, decoder params changed
    np.testing.assert_array_equal(
        np.asarray(new_state.params["visual"]["merger"]["fc1"]["kernel"]),
        np.asarray(params["visual"]["merger"]["fc1"]["kernel"]))
    assert not np.array_equal(
        np.asarray(new_state.params["model"]["layers"]["mlp"]["gate"]["kernel"]),
        np.asarray(params["model"]["layers"]["mlp"]["gate"]["kernel"]))


def test_param_group_classification():
    from video_r2_tpu.train.optim import classify_param

    class L:  # fake leaf
        def __init__(self, ndim):
            self.ndim = ndim

    assert classify_param("model/layers/mlp/gate/kernel", L(3)) == "base_decay"
    assert classify_param("model/norm/scale", L(1)) == "base_nodecay"
    assert classify_param("visual/blocks/attn/qkv/kernel", L(3)) == "vision_decay"
    assert classify_param("visual/merger/fc1/kernel", L(2)) == "merger_decay"
    assert classify_param("visual/merger/fc1/bias", L(1)) == "merger_nodecay"


def test_sft_loss_matches_hf(rng):
    """Training-loss parity: our masked shifted CE vs HF's internal loss."""
    import torch

    from tests.hf_ref import build_hf_tiny
    from video_r2_tpu.models import convert_hf_state_dict, get_rope_index

    model, cfg = build_hf_tiny()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    B, S = 2, 14
    ids = rng.integers(2, 400, size=(B, S))
    labels = ids.copy()
    labels[:, :6] = -100
    with torch.no_grad():
        ref = float(model(input_ids=torch.from_numpy(ids),
                          labels=torch.from_numpy(labels)).loss)
    pos, _ = get_rope_index(ids, cfg)
    loss = sft_loss(params, cfg, {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(pos),
        "attention_mask": jnp.ones((B, S), jnp.int32),
    }, SFTConfig(ce_chunk_size=8))
    np.testing.assert_allclose(float(loss), ref, rtol=2e-5)


def test_7b_fsdp_sharding_lowers():
    """The REAL 7B train step must lower (sharding-propagate) over an
    8-device fsdp x tp mesh — catches divisibility/spec bugs at true shapes
    without materializing 7B params (abstract lowering only)."""
    import jax

    from video_r2_tpu.models import qwen25vl_7b
    from video_r2_tpu.models.loader import init_params
    from video_r2_tpu.parallel import MeshConfig, make_mesh, param_shardings
    from video_r2_tpu.train import OptimConfig, make_optimizer
    from video_r2_tpu.train.sft import TrainState, make_sft_step

    cfg = qwen25vl_7b()
    mesh = make_mesh(MeshConfig(dp=1, fsdp=4, tp=2))
    shapes = jax.eval_shape(lambda: init_params(cfg, method="zeros",
                                                dtype="bfloat16"))
    shardings = param_shardings(shapes, mesh)
    # every big kernel must actually shard on both axes
    q_spec = shardings["model"]["layers"]["attn"]["q"]["kernel"].spec
    assert q_spec == jax.sharding.PartitionSpec(None, "fsdp", "tp")
    emb_spec = shardings["model"]["embed_tokens"]["embedding"].spec
    assert emb_spec == jax.sharding.PartitionSpec("tp", "fsdp")

    opt = make_optimizer(OptimConfig(total_steps=10), shapes)
    step = make_sft_step(cfg, SFTConfig(ce_chunk_size=512), opt, mesh=mesh,
                         donate=False)

    def with_sharding(shape_tree, sharding_tree):
        return jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            shape_tree, sharding_tree)

    sharded_params = with_sharding(shapes, shardings)
    opt_shapes = jax.eval_shape(opt.init, sharded_params)
    from video_r2_tpu.parallel import batch_sharding

    B, S = 8, 256
    batch_shapes = {
        k: jax.ShapeDtypeStruct(shp, jnp.int32,
                                sharding=batch_sharding(mesh, len(shp)))
        for k, shp in [("input_ids", (B, S)), ("labels", (B, S)),
                       ("attention_mask", (B, S))]
    }
    batch_shapes["position_ids"] = jax.ShapeDtypeStruct(
        (3, B, S), jnp.int32,
        sharding=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, ("dp", "fsdp"))))
    state_shapes = TrainState(sharded_params, opt_shapes,
                              jax.ShapeDtypeStruct((), jnp.int32))
    lowered = step.lower(state_shapes, batch_shapes)  # raises on spec errors
    text = lowered.as_text()
    assert "num_partitions = 8" in text
    assert "sharding" in text


def test_72b_fsdp_tp_sharding_lowers():
    """The 72B preset (the reference's judge-scale tier: an 80B-class model
    served TP>1, serve_qwen3.sh:13) must shard cleanly and lower a sharded
    GENERATE prefill over an 8-device fsdp x tp mesh — abstract only, no
    params materialized."""
    import jax

    from video_r2_tpu.engine.generate import prefill
    from video_r2_tpu.models.config import qwen25vl_72b
    from video_r2_tpu.models.loader import init_params
    from video_r2_tpu.parallel import MeshConfig, make_mesh, param_shardings

    cfg = qwen25vl_72b()
    mesh = make_mesh(MeshConfig(dp=1, fsdp=2, tp=4))
    shapes = jax.eval_shape(lambda: init_params(cfg, method="zeros",
                                                dtype="bfloat16"))
    shardings = param_shardings(shapes, mesh)
    q_spec = shardings["model"]["layers"]["attn"]["q"]["kernel"].spec
    assert q_spec == jax.sharding.PartitionSpec(None, "fsdp", "tp")

    def with_sharding(shape_tree, sharding_tree):
        return jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            shape_tree, sharding_tree)

    sharded_params = with_sharding(shapes, shardings)
    B, S = 2, 512
    ids = jax.ShapeDtypeStruct((B, S), jnp.int32)
    pos = jax.ShapeDtypeStruct((3, B, S), jnp.int32)
    lens = jax.ShapeDtypeStruct((B,), jnp.int32)
    lowered = jax.jit(
        lambda p, i, po, l: prefill(p, cfg, i, po, l, S + 64, mesh=mesh),
    ).lower(sharded_params, ids, pos, lens)  # raises on spec errors
    text = lowered.as_text()
    assert "num_partitions = 8" in text


def test_grpo_shard_batch_divisibility_error():
    """Uneven rollout batches raise a clear error instead of an opaque
    device_put sharding failure (grpo_trainer.py:523-552 parity)."""
    import pytest as _pytest

    from video_r2_tpu.models import tiny_test_config
    from video_r2_tpu.parallel import MeshConfig, make_mesh
    from video_r2_tpu.train import make_grpo_step
    from video_r2_tpu.train.grpo import GRPOConfig
    from video_r2_tpu.train.optim import OptimConfig, make_optimizer

    cfg = tiny_test_config()
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    from video_r2_tpu.models import init_params
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(total_steps=4), params)
    step = make_grpo_step(cfg, GRPOConfig(num_generations=3), opt,
                          donate=False, mesh=mesh)
    bad = {"prompt_completion_ids": np.zeros((6, 8), np.int32)}  # 6 % 4 != 0
    with _pytest.raises(ValueError, match="divisible by dp\\*fsdp"):
        step.shard_batch(bad)
    ok = {"prompt_completion_ids": np.zeros((8, 8), np.int32)}
    step.shard_batch(ok)  # divisible: no error
