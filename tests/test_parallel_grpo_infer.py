"""Sharded GRPO training step + tensor-parallel inference on the 8-device
virtual CPU mesh (VERDICT r1 items 2 and 3: the reference's GRPO is 8-way
ZeRO-3 — train_grpo.sh:41-42 — and its judge serves at TP=4 —
serve_qwen3.sh:13)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_r2_tpu.engine import SamplingParams
from video_r2_tpu.engine.generate import generate
from video_r2_tpu.models import init_params, tiny_test_config
from video_r2_tpu.parallel import MeshConfig, make_mesh, shard_params
from video_r2_tpu.train import OptimConfig, make_optimizer
from video_r2_tpu.train.grpo import GRPOConfig, GRPOTrainState, make_grpo_step


def _grpo_batch(cfg, rng, B=8, P=12, C=6):
    ids = rng.integers(2, 400, size=(B, P + C))
    pos = np.broadcast_to(np.arange(P + C)[None, None], (3, B, P + C)).copy()
    return {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.asarray(pos),
        "attention_mask": jnp.ones((B, P + C), jnp.int32),
        "completion_mask": jnp.ones((B, C), jnp.int32),
        "advantages": jnp.asarray(rng.normal(size=(B,)), jnp.float32),
        "ref_per_token_logps": jnp.asarray(
            rng.normal(size=(B, C)) - 5.0, jnp.float32),
    }


def test_grpo_step_sharded_matches_single(rng):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    gcfg = GRPOConfig(num_generations=4, beta=0.04, logp_chunk_size=32)
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10), params)
    batch = _grpo_batch(cfg, rng)

    step1 = make_grpo_step(cfg, gcfg, opt, donate=False)
    state1 = GRPOTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    _, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    sparams = shard_params(params, mesh)
    step2 = make_grpo_step(cfg, gcfg, opt, donate=False, mesh=mesh)
    state2 = GRPOTrainState(sparams, opt.init(sparams),
                            jnp.zeros((), jnp.int32))
    sbatch = step2.shard_batch(batch)
    _, m2 = step2(state2, sbatch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["kl"]), float(m2["kl"]), rtol=1e-5)


def test_grpo_multimodal_sharded_matches_single(rng):
    """Multimodal GRPO loss (video patches through the ViT inside the
    sharded jit) — sharded == single-device, with the default
    vit_attn_impl='auto' exercising the mesh downgrade plumbing
    (GRPOConfig.vit_attn_impl, the SFT-parity fix)."""
    from video_r2_tpu.models import get_rope_index, plan_vision_layout

    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    gcfg = GRPOConfig(num_generations=2, beta=0.04, logp_chunk_size=32)
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10),
                         params)
    B, C = 4, 4
    grid = (2, 4, 4)
    n_tok = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    row = ([5, 6] + [cfg.vision_start_token_id]
           + [cfg.video_token_id] * n_tok + [cfg.vision_end_token_id]
           + list(rng.integers(2, 400, size=C)))
    ids = np.asarray([row] * B, np.int32)
    pos, _ = get_rope_index(ids, cfg, video_grid_thw=np.asarray([grid] * B),
                            second_per_grid_ts=np.asarray([1.0] * B))
    layout = plan_vision_layout([grid] * B, cfg.vision)
    patches = rng.normal(size=(int(np.prod(grid)) * B,
                               cfg.vision.patch_input_dim)).astype(np.float32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.asarray(np.asarray(pos)),
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "completion_mask": jnp.ones((B, C), jnp.int32),
        "advantages": jnp.asarray(rng.normal(size=(B,)), jnp.float32),
        "ref_per_token_logps": jnp.asarray(
            rng.normal(size=(B, C)) - 5.0, jnp.float32),
        "video_patches": jnp.asarray(patches),
    }
    step1 = make_grpo_step(cfg, gcfg, opt, video_layout=layout, donate=False)
    _, m1 = step1(GRPOTrainState(params, opt.init(params),
                                 jnp.zeros((), jnp.int32)), batch)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    sparams = shard_params(params, mesh)
    step2 = make_grpo_step(cfg, gcfg, opt, video_layout=layout,
                           donate=False, mesh=mesh)
    _, m2 = step2(GRPOTrainState(sparams, opt.init(sparams),
                                 jnp.zeros((), jnp.int32)),
                  step2.shard_batch(batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)


def test_grpo_7b_sharded_lowers():
    """The real 7B GRPO loss step lowers over fsdp x tp at true shapes
    (abstract only — catches spec/divisibility bugs without 7B params)."""
    from video_r2_tpu.models import qwen25vl_7b
    from video_r2_tpu.parallel import batch_sharding, param_shardings
    from video_r2_tpu.train.sft import TrainState

    cfg = qwen25vl_7b()
    mesh = make_mesh(MeshConfig(dp=1, fsdp=4, tp=2))
    shapes = jax.eval_shape(lambda: init_params(cfg, method="zeros",
                                                dtype="bfloat16"))
    shardings = param_shardings(shapes, mesh)
    sharded = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings)
    gcfg = GRPOConfig(logp_chunk_size=1024)
    opt = make_optimizer(OptimConfig(total_steps=10), shapes)
    step = make_grpo_step(cfg, gcfg, opt, donate=False, mesh=mesh)
    opt_shapes = jax.eval_shape(opt.init, sharded)
    B, P, C = 8, 1024, 256
    S = P + C
    batch = {
        "input_ids": jax.ShapeDtypeStruct((B, S), jnp.int32,
                                          sharding=batch_sharding(mesh, 2)),
        "position_ids": jax.ShapeDtypeStruct(
            (3, B, S), jnp.int32,
            sharding=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, ("dp", "fsdp")))),
        "attention_mask": jax.ShapeDtypeStruct(
            (B, S), jnp.int32, sharding=batch_sharding(mesh, 2)),
        "completion_mask": jax.ShapeDtypeStruct(
            (B, C), jnp.int32, sharding=batch_sharding(mesh, 2)),
        "advantages": jax.ShapeDtypeStruct(
            (B,), jnp.float32, sharding=batch_sharding(mesh, 1)),
        "ref_per_token_logps": jax.ShapeDtypeStruct(
            (B, C), jnp.float32, sharding=batch_sharding(mesh, 2)),
    }
    state = GRPOTrainState(sharded, opt_shapes,
                           jax.ShapeDtypeStruct((), jnp.int32))
    lowered = step.lower(state, batch)
    text = lowered.as_text()
    assert "num_partitions = 8" in text


def test_tp_generate_matches_single_device(rng):
    """generate() under a tp=2 mesh is token-for-token identical to
    single-device greedy decode (VERDICT r1 'done' bar for TP inference)."""
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    ids = rng.integers(2, 400, size=(2, 9))
    lengths = np.asarray([9, 6])
    sp = SamplingParams(max_new_tokens=7, pad_token_id=cfg.pad_token_id,
                        eos_token_ids=())
    ref = generate(params, cfg, ids, lengths, sp)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=2),
                     devices=jax.devices()[:2])
    sparams = shard_params(params, mesh)
    out = generate(sparams, cfg, ids, lengths, sp, mesh=mesh)
    np.testing.assert_array_equal(out.sequences, ref.sequences)
    np.testing.assert_allclose(out.logprobs, ref.logprobs, atol=1e-4)


def test_tp_generate_kv_cache_sharded():
    """The prefill KV cache actually lands head-sharded over "tp" (the
    memory property the 80B judge deployment depends on)."""
    from video_r2_tpu.engine.generate import prefill
    from video_r2_tpu.models.mrope import get_rope_index

    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=2),
                     devices=jax.devices()[:2])
    sparams = shard_params(params, mesh)
    ids = np.arange(2, 10)[None, :].astype(np.int32)
    pos, _ = get_rope_index(ids, cfg)
    _, cache = prefill(sparams, cfg, jnp.asarray(ids), jnp.asarray(pos),
                       jnp.asarray([8]), 16, mesh=mesh)
    spec = cache.k.sharding.spec
    kvh = cfg.text.num_key_value_heads
    if kvh % 2 == 0:
        assert spec[3] == "tp", spec
