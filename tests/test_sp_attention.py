"""Sequence-parallel (context-parallel) attention: op-level parity vs the
XLA oracle on the 8-device virtual CPU mesh, and a full SP SFT train step
matching single-device. The reference has no distributed-context story
(FlashAttention-2 is single-GPU, SURVEY §2.4 N1) — this is TPU-native
scaling for long-video sequences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from video_r2_tpu.ops.attention import dot_product_attention
from video_r2_tpu.ops.sp_attention import sp_flash_attention


def _mesh_sp(n_sp, extra_axis=False):
    devs = jax.devices()
    if extra_axis:
        arr = np.asarray(devs).reshape(1, len(devs) // n_sp, n_sp)
        return Mesh(arr, ("dp", "fsdp", "sp"))
    arr = np.asarray(devs[:n_sp]).reshape(1, 1, n_sp)
    return Mesh(arr, ("dp", "fsdp", "sp"))


def _qkv(rng, B=2, S=256, nh=4, kh=2, hd=32, dtype=np.float32):
    q = rng.normal(size=(B, S, nh, hd)).astype(dtype)
    k = rng.normal(size=(B, S, kh, hd)).astype(dtype)
    v = rng.normal(size=(B, S, kh, hd)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("n_sp", [4, 8])
def test_sp_forward_matches_oracle(rng, n_sp):
    mesh = _mesh_sp(n_sp)
    q, k, v = _qkv(rng)
    lens = jnp.array([256, 190], jnp.int32)
    out = jax.jit(lambda q, k, v: sp_flash_attention(
        q, k, v, mesh, kv_lengths=lens, block_q=32, block_k=32))(q, k, v)
    ref = dot_product_attention(q, k, v, kv_lengths=lens, causal=True,
                                impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_sp_forward_short_lengths(rng):
    """kv length inside the FIRST shard: later shards' local regions are
    fully masked (lse sentinel path) and the prefix region is clipped."""
    mesh = _mesh_sp(4)
    q, k, v = _qkv(rng, B=3, S=256)
    lens = jnp.array([50, 64, 1], jnp.int32)
    out = jax.jit(lambda q, k, v: sp_flash_attention(
        q, k, v, mesh, kv_lengths=lens, block_q=32, block_k=32))(q, k, v)
    ref = dot_product_attention(q, k, v, kv_lengths=lens, causal=True,
                                impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_sp_grads_match_oracle(rng):
    mesh = _mesh_sp(4)
    q, k, v = _qkv(rng)
    lens = jnp.array([256, 200], jnp.int32)
    S = q.shape[1]
    w = jnp.asarray(rng.normal(size=(S, 1, 1)), jnp.float32)[None]

    def loss_sp(q, k, v):
        o = sp_flash_attention(q, k, v, mesh, kv_lengths=lens,
                               block_q=32, block_k=32)
        return (o * w).sum()

    def loss_x(q, k, v):
        o = dot_product_attention(q, k, v, kv_lengths=lens, causal=True,
                                  impl="xla")
        return (o * w).sum()

    gs = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gx):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-5)


def test_sp_bf16(rng):
    mesh = _mesh_sp(4)
    q, k, v = _qkv(rng, dtype=np.float32)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: sp_flash_attention(
        q, k, v, mesh, block_q=32, block_k=32))(q, k, v)
    ref = dot_product_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                                v.astype(jnp.float32), causal=True,
                                kv_lengths=jnp.array([256, 256], jnp.int32),
                                impl="xla")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2)


def test_sp_batch_axes_preserved(rng):
    """Batch sharded over fsdp while S is sharded over sp: the shard_map
    boundary must keep both (no gathers of the batch dim)."""
    mesh = _mesh_sp(4, extra_axis=True)  # fsdp=2, sp=4
    q, k, v = _qkv(rng, B=4, S=128)
    lens = jnp.array([128, 100, 64, 128], jnp.int32)
    out = jax.jit(lambda q, k, v: sp_flash_attention(
        q, k, v, mesh, kv_lengths=lens, batch_axes=("dp", "fsdp"),
        block_q=32, block_k=32))(q, k, v)
    ref = dot_product_attention(q, k, v, kv_lengths=lens, causal=True,
                                impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("n_sp", [4, 8])
def test_sp_ring_forward_matches_oracle(rng, n_sp):
    mesh = _mesh_sp(n_sp)
    q, k, v = _qkv(rng)
    lens = jnp.array([256, 190], jnp.int32)
    out = jax.jit(lambda q, k, v: sp_flash_attention(
        q, k, v, mesh, kv_lengths=lens, sp_impl="ring",
        block_q=32, block_k=32))(q, k, v)
    ref = dot_product_attention(q, k, v, kv_lengths=lens, causal=True,
                                impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_sp_ring_grads_match_oracle(rng):
    """Ring backward: (k, v, dk, dv) rotate together; accumulated f32
    partials must come home to the owning shard exactly."""
    mesh = _mesh_sp(4)
    q, k, v = _qkv(rng)
    lens = jnp.array([256, 130], jnp.int32)
    S = q.shape[1]
    w = jnp.asarray(rng.normal(size=(S, 1, 1)), jnp.float32)[None]

    def loss_ring(q, k, v):
        o = sp_flash_attention(q, k, v, mesh, kv_lengths=lens,
                               sp_impl="ring", block_q=32, block_k=32)
        return (o * w).sum()

    def loss_x(q, k, v):
        o = dot_product_attention(q, k, v, kv_lengths=lens, causal=True,
                                  impl="xla")
        return (o * w).sum()

    gs = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gx):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-5)


def test_sp_ring_matches_gather(rng):
    """The two SP implementations are numerically interchangeable."""
    mesh = _mesh_sp(4)
    q, k, v = _qkv(rng, B=3, S=128)
    lens = jnp.array([128, 70, 33], jnp.int32)
    o_g = jax.jit(lambda q, k, v: sp_flash_attention(
        q, k, v, mesh, kv_lengths=lens, sp_impl="gather",
        block_q=32, block_k=32))(q, k, v)
    o_r = jax.jit(lambda q, k, v: sp_flash_attention(
        q, k, v, mesh, kv_lengths=lens, sp_impl="ring",
        block_q=32, block_k=32))(q, k, v)
    np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_r), atol=1e-6)


@pytest.mark.parametrize("sp_impl", ["gather", "ring"])
def test_sp_segments_match_oracle(rng, sp_impl):
    """GRPO's [prompt_pad | completion] gap mask as segment ids, sharded
    with the sequence (valid=1, pad=-1). Oracle: XLA with the same bias."""
    from video_r2_tpu.models.decoder import causal_mask_bias

    mesh = _mesh_sp(4)
    B, S = 2, 128
    q, k, v = _qkv(rng, B=B, S=S)
    # mid-sequence gap: rows valid [0,30)+[60,S) and [0,50)+[80,S)
    amask = np.ones((B, S), np.int32)
    amask[0, 30:60] = 0
    amask[1, 50:80] = 0
    seg = jnp.where(jnp.asarray(amask) == 1, 1, -1).astype(jnp.int32)
    lens = jnp.full((B,), S, jnp.int32)

    def loss_sp(q, k, v):
        o = sp_flash_attention(q, k, v, mesh, kv_lengths=lens,
                               segment_ids=seg, sp_impl=sp_impl,
                               block_q=32, block_k=32)
        return o

    out = jax.jit(loss_sp)(q, k, v)
    bias = causal_mask_bias(S, jnp.asarray(amask))
    ref = dot_product_attention(q, k, v, bias=bias, impl="xla")
    valid = np.asarray(amask, bool)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(out) * valid,
                               np.asarray(ref) * valid, atol=2e-5, rtol=1e-4)

    # grads: weight only valid rows (pad rows get zero upstream in GRPO)
    w = jnp.asarray(valid, jnp.float32)
    gs = jax.jit(jax.grad(lambda q, k, v: (loss_sp(q, k, v) * w).sum(),
                          argnums=(0, 1, 2)))(q, k, v)
    gx = jax.grad(lambda q, k, v: (dot_product_attention(
        q, k, v, bias=bias, impl="xla") * w).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gx):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-5)


def test_sp_grpo_step_matches_single(rng):
    """Sharded GRPO train step with the SP loss forward (segment-id gap
    mask over sharded sequences) == single-device XLA loss."""
    from video_r2_tpu.models import init_params, tiny_test_config
    from video_r2_tpu.parallel import MeshConfig, make_mesh
    from video_r2_tpu.train import OptimConfig, make_optimizer
    from video_r2_tpu.train.grpo import (GRPOConfig, GRPOTrainState,
                                         make_grpo_step)
    from video_r2_tpu.parallel.sharding import shard_params

    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-4, total_steps=10),
                         params)
    gcfg = GRPOConfig(num_generations=4, beta=0.04, logp_chunk_size=32)
    B, P, C = 4, 26, 6  # P+C=32 divides sp=2 shards of 16
    ids = rng.integers(2, 400, size=(B, P + C))
    amask = np.ones((B, P + C), np.int32)
    amask[0, :7] = 0  # left-padded prompt: the mid-sequence gap
    amask[2, :3] = 0
    batch = {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.asarray(np.broadcast_to(
            np.arange(P + C)[None, None], (3, B, P + C)).copy()),
        "attention_mask": jnp.asarray(amask),
        "completion_mask": jnp.ones((B, C), jnp.int32),
        "advantages": jnp.asarray(rng.normal(size=(B,)), jnp.float32),
        "ref_per_token_logps": jnp.asarray(
            rng.normal(size=(B, C)) - 5.0, jnp.float32),
    }

    step1 = make_grpo_step(cfg, gcfg, opt, attn_impl="xla", donate=False)
    state1 = GRPOTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    _, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=2, sp=2, tp=2))
    sparams = shard_params(params, mesh)
    step2 = make_grpo_step(cfg, gcfg, opt, attn_impl="sp", mesh=mesh,
                           donate=False)
    state2 = GRPOTrainState(sparams, opt.init(sparams),
                            jnp.zeros((), jnp.int32))
    _, m2 = step2(state2, step2.shard_batch(batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m1["kl"]), float(m2["kl"]), rtol=1e-4)


def test_sp_rejects_bad_shapes(rng):
    mesh = _mesh_sp(4)
    q, k, v = _qkv(rng, S=90)  # 90 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        sp_flash_attention(q, k, v, mesh)


def test_sp_sft_step_matches_single(rng):
    """Full SP SFT train step (dp=1, fsdp=2, sp=2, tp=2) == single device."""
    from video_r2_tpu.models import init_params, tiny_test_config
    from video_r2_tpu.parallel import MeshConfig, make_mesh
    from video_r2_tpu.train import (OptimConfig, SFTConfig, init_train_state,
                                    make_optimizer, make_sft_step)
    from video_r2_tpu.ops.fused_ce import IGNORE_INDEX

    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10),
                         params)
    B, S = 4, 64
    ids = rng.integers(2, 400, size=(B, S))
    labels = ids.copy()
    labels[:, :5] = IGNORE_INDEX
    pos = np.broadcast_to(np.arange(S)[None, None], (3, B, S)).copy()
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(pos),
        "attention_mask": jnp.ones((B, S), jnp.int32),
    }

    state1 = init_train_state(params, opt)
    step1 = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt, donate=False)
    _, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=2, sp=2, tp=2))
    state2 = init_train_state(params, opt, mesh=mesh)
    step2 = make_sft_step(cfg, SFTConfig(ce_chunk_size=32, attn_impl="sp"),
                          opt, mesh=mesh, donate=False)
    sbatch = step2.shard_batch(batch)
    _, m2 = step2(state2, sbatch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
