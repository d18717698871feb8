"""Pipeline parallelism (parallel/pipeline.py) on the 8-device CPU mesh.

The GPipe microbatch schedule must be numerically a no-op: pipelined
forward/loss/updates match the plain single-device scan, alone and composed
with dp / fsdp / tp and the flash kernel (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_r2_tpu.models import init_params, tiny_test_config
from video_r2_tpu.models.decoder import causal_mask_bias, decoder_forward
from video_r2_tpu.models.model import embed_inputs
from video_r2_tpu.models.mrope import mrope_cos_sin
from video_r2_tpu.ops.fused_ce import IGNORE_INDEX
from video_r2_tpu.parallel import (
    MeshConfig,
    make_mesh,
    pipeline_decoder_forward,
    shard_params,
)
from video_r2_tpu.train import (
    OptimConfig,
    SFTConfig,
    init_train_state,
    make_optimizer,
    make_sft_step,
)


def _cfg(layers=4):
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, num_hidden_layers=layers))


def _batch(cfg, rng, B=8, S=16, ragged=False):
    ids = rng.integers(2, 400, size=(B, S))
    labels = ids.copy()
    labels[:, :5] = IGNORE_INDEX
    mask = np.ones((B, S), np.int32)
    if ragged:  # right-padded rows of differing lengths
        for b in range(B):
            n = S - (b % 4)
            mask[b, n:] = 0
            labels[b, n:] = IGNORE_INDEX
    pos = np.broadcast_to(np.arange(S)[None, None], (3, B, S)).copy()
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(pos),
        "attention_mask": jnp.asarray(mask),
    }


def _ref_hidden(params, cfg, batch, attn_impl="xla"):
    h = embed_inputs(params, cfg, batch["input_ids"])
    cos, sin = mrope_cos_sin(batch["position_ids"], cfg, dtype=h.dtype)
    mask = batch["attention_mask"]
    if attn_impl == "flash":
        bias, kvl = None, mask.sum(-1).astype(jnp.int32)
    else:
        bias, kvl = causal_mask_bias(batch["input_ids"].shape[1], mask), None
    out, _ = decoder_forward(params["model"], cfg.text, h, cos, sin, bias,
                             attn_impl=attn_impl, kv_lengths=kvl, causal=True)
    return h, cos, sin, out


@pytest.mark.parametrize("impl", ["xla", "flash"])
@pytest.mark.parametrize("microbatches", [2, 4, 8])
def test_pipeline_forward_matches_scan(rng, impl, microbatches):
    cfg = _cfg()
    params = init_params(cfg, dtype="float32")
    batch = _batch(cfg, rng, ragged=True)
    h, cos, sin, ref = _ref_hidden(params, cfg, batch, impl)

    mesh = make_mesh(MeshConfig(dp=2, pp=4))
    sp = shard_params(params, mesh)
    q = sp["model"]["layers"]["attn"]["q"]["kernel"]
    assert q.sharding.spec[0] == "pp"  # stage axis actually sharded

    out = jax.jit(lambda p: pipeline_decoder_forward(
        p["model"], cfg.text, h, cos, sin, mesh, attn_impl=impl,
        attention_mask=batch["attention_mask"],
        num_microbatches=microbatches))(sp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_rejects_bad_shapes(rng):
    cfg = _cfg(layers=3)  # 3 layers don't split into 4 stages
    params = init_params(cfg, dtype="float32")
    batch = _batch(cfg, rng)
    h, cos, sin, _ = _ref_hidden(params, cfg, batch)
    mesh = make_mesh(MeshConfig(dp=2, pp=4))
    with pytest.raises(ValueError, match="not divisible by pp"):
        pipeline_decoder_forward(params["model"], cfg.text, h, cos, sin,
                                 mesh, attention_mask=batch["attention_mask"])
    cfg4 = _cfg()
    params4 = init_params(cfg4, dtype="float32")
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_decoder_forward(params4["model"], cfg4.text, h, cos, sin,
                                 mesh, num_microbatches=3,
                                 attention_mask=batch["attention_mask"])


def _step_parity(rng, mesh_cfg, scfg_kwargs=None, B=8):
    cfg = _cfg()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10),
                         params)
    batch = _batch(cfg, rng, B=B, ragged=True)

    state1 = init_train_state(params, opt)
    step1 = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt, donate=False)
    _, m1 = step1(state1, batch)

    mesh = make_mesh(mesh_cfg)
    scfg = SFTConfig(ce_chunk_size=32, **(scfg_kwargs or {}))
    state2 = init_train_state(params, opt, mesh=mesh)
    step2 = make_sft_step(cfg, scfg, opt, mesh=mesh, donate=False)
    state2, m2 = step2(state2, step2.shard_batch(batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=2e-4)
    return state2


def test_pp_sft_step_matches_single(rng):
    _step_parity(rng, MeshConfig(pp=4, dp=2))


def test_pp_sft_step_matches_single_with_fsdp_tp(rng):
    _step_parity(rng, MeshConfig(pp=2, fsdp=2, tp=2))


def test_pp_sft_step_flash_microbatches(rng):
    _step_parity(rng, MeshConfig(pp=4, dp=2),
                 {"attn_impl": "flash", "pp_microbatches": 4})


def test_pp_sft_overfits(rng):
    """Multiple pipelined steps actually train (loss decreases)."""
    cfg = _cfg()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10),
                         params)
    mesh = make_mesh(MeshConfig(pp=4, dp=2))
    state = init_train_state(params, opt, mesh=mesh)
    step = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt, mesh=mesh)
    batch = _batch(cfg, rng)
    sbatch = step.shard_batch(batch)
    losses = []
    for _ in range(5):
        state, metrics = step(state, sbatch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("impl", ["xla", "flash"])
def test_pp_grpo_step_matches_single(rng, impl):
    """Pipelined GRPO loss forward: the [prompt_pad | completion] gap rides
    per microbatch (segment ids under flash, mask bias under xla) and the
    sharded step's loss/kl match single-device."""
    from video_r2_tpu.train.grpo import (
        GRPOConfig,
        GRPOTrainState,
        make_grpo_step,
    )

    cfg = _cfg()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10),
                         params)
    gcfg = GRPOConfig(num_generations=4, beta=0.04, logp_chunk_size=32,
                      pp_microbatches=4)
    B, P, C = 8, 10, 6
    ids = rng.integers(2, 400, size=(B, P + C))
    mask = np.ones((B, P + C), np.int32)
    mask[:, 2:4] = 0  # mid-sequence prompt-pad gap
    batch = {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.asarray(np.broadcast_to(
            np.arange(P + C)[None, None], (3, B, P + C)).copy()),
        "attention_mask": jnp.asarray(mask),
        "completion_mask": jnp.ones((B, C), jnp.int32),
        "advantages": jnp.asarray(rng.normal(size=(B,)), jnp.float32),
        "ref_per_token_logps": jnp.asarray(rng.normal(size=(B, C)) - 5.0,
                                           jnp.float32),
    }

    step1 = make_grpo_step(cfg, gcfg, opt, donate=False)
    state1 = GRPOTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    _, m1 = step1(state1, batch)

    mesh = make_mesh(MeshConfig(pp=4, dp=2))
    sp = shard_params(params, mesh)
    step2 = make_grpo_step(cfg, gcfg, opt, mesh=mesh, donate=False,
                           attn_impl=impl)
    state2 = GRPOTrainState(sp, opt.init(sp), jnp.zeros((), jnp.int32))
    _, m2 = step2(state2, step2.shard_batch(batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m1["kl"]), float(m2["kl"]), rtol=2e-4)


def test_pp_sp_combination_rejected():
    cfg = _cfg()
    params = init_params(cfg, dtype="float32")
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=10),
                         params)
    mesh = make_mesh(MeshConfig(pp=2, sp=2, dp=2))
    with pytest.raises(ValueError, match="pp and sp"):
        make_sft_step(cfg, SFTConfig(attn_impl="sp"), opt, mesh=mesh)
