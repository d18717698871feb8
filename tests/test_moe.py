"""MoE decoder family (the judge-model shape — Qwen3-MoE, models/moe.py).

Parity anchors:
- grouped einsum dispatch == dense per-expert oracle (HF expert-loop
  semantics) at full capacity;
- full-model golden vs HF Qwen3MoeForCausalLM (also pins qk-norm, bias-free
  attention, and head_dim decoupled from hidden/heads);
- expert-parallel sharding ("ep" axis) == single device.
"""

import jax
import numpy as np
import pytest

from video_r2_tpu.models.config import ModelConfig, TextConfig
from video_r2_tpu.models.loader import convert_hf_state_dict, init_params
from video_r2_tpu.models.moe import (
    load_balancing_loss,
    moe_mlp,
    moe_mlp_dense_oracle,
)


def tiny_moe_text() -> TextConfig:
    return TextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim_override=16, qk_norm=True, attention_bias=False,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=16,
        norm_topk_prob=True, mrope_section=(4, 2, 2), rope_theta=10000.0,
    )


def tiny_moe_config() -> ModelConfig:
    return ModelConfig(text=tiny_moe_text(), has_vision=False,
                       bos_token_id=0, eos_token_id=1, pad_token_id=0,
                       dtype="float32")


def _moe_params(rng, H=32, E=8, I=16, dtype=np.float32):
    return {
        "router": {"kernel": rng.normal(0, 0.5, (H, E)).astype(dtype)},
        "experts": {
            "gate": {"kernel": rng.normal(0, 0.1, (E, H, I)).astype(dtype)},
            "up": {"kernel": rng.normal(0, 0.1, (E, H, I)).astype(dtype)},
            "down": {"kernel": rng.normal(0, 0.1, (E, I, H)).astype(dtype)},
        },
    }


@pytest.mark.parametrize("group_size", [64, 48, 1024])
def test_grouped_vs_dense_oracle(rng, group_size):
    # B*S = 2*50 = 100: not a multiple of 64 or 48 -> exercises the padded
    # tail group; 1024 > T -> single group
    p = _moe_params(rng)
    x = rng.normal(0, 1, (2, 50, 32)).astype(np.float32)
    ours = np.asarray(moe_mlp(p, x, 2, True, capacity_factor=0.0,
                              group_size=group_size))
    ref = np.asarray(moe_mlp_dense_oracle(p, x, 2, True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_no_renorm_matches_oracle(rng):
    p = _moe_params(rng)
    x = rng.normal(0, 1, (1, 33, 32)).astype(np.float32)
    ours = np.asarray(moe_mlp(p, x, 3, False, group_size=16))
    ref = np.asarray(moe_mlp_dense_oracle(p, x, 3, False))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_capacity_drops_tokens(rng):
    """A tight capacity factor drops over-capacity tokens (GShard semantics):
    output differs from full capacity, but dropped tokens contribute exactly
    zero (never garbage)."""
    p = _moe_params(rng)
    x = rng.normal(0, 1, (1, 64, 32)).astype(np.float32)
    full = np.asarray(moe_mlp(p, x, 2, True, capacity_factor=0.0,
                              group_size=64))
    tight = np.asarray(moe_mlp(p, x, 2, True, capacity_factor=0.25,
                               group_size=64))
    assert not np.allclose(full, tight)
    assert np.isfinite(tight).all()
    # generous capacity == full capacity (nothing drops)
    loose = np.asarray(moe_mlp(p, x, 2, True, capacity_factor=8.0,
                               group_size=64))
    np.testing.assert_allclose(full, loose, rtol=1e-6, atol=1e-6)


def test_load_balancing_loss_range(rng):
    p = _moe_params(rng)
    x = rng.normal(0, 1, (2, 32, 32)).astype(np.float32)
    aux = float(load_balancing_loss(p["router"]["kernel"], x, 2))
    # perfectly balanced -> 1.0; worst case -> E/k. Random router lands between.
    assert 0.9 < aux < 8.0


# ---------------------------------------------------------------- HF golden


def _build_hf_tiny_moe():
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    hf_cfg = Qwen3MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=8, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[], rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
        rms_norm_eps=1e-6, max_position_embeddings=512,
    )
    torch.manual_seed(0)
    model = Qwen3MoeForCausalLM(hf_cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def hf_moe():
    model = _build_hf_tiny_moe()
    cfg = tiny_moe_config()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    return model, cfg, params


def test_hf_state_dict_text_only(hf_moe):
    _, _, params = hf_moe
    assert "visual" not in params
    assert "router" in params["model"]["layers"]["mlp"]
    assert "bias" not in params["model"]["layers"]["attn"]["q"]
    assert params["model"]["layers"]["attn"]["q_norm"]["scale"].shape == (2, 16)
    # head_dim decoupled: q kernel is [L, H, nh*hd] = [2, 32, 64]
    assert params["model"]["layers"]["attn"]["q"]["kernel"].shape == (2, 32, 64)


def test_moe_golden_forward(hf_moe, rng):
    """Full-model logits vs HF Qwen3MoeForCausalLM (cites the reference's
    judge deployment serve_qwen3.sh:11-17 — the family our engine must host
    natively)."""
    import torch

    from video_r2_tpu.models.model import forward

    model, cfg, params = hf_moe
    B, S = 2, 17
    ids = rng.integers(2, 127, (B, S))
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids)).logits.numpy()
    pos = np.broadcast_to(np.arange(S)[None, None, :], (3, B, S))
    ours = np.asarray(forward(params, cfg, ids, pos)[0])
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_moe_generate_golden(hf_moe, rng):
    """Greedy decode (prefill + per-token decode path through _mlp/_qk_norm)
    matches HF greedy generation token-for-token."""
    import torch

    from video_r2_tpu.engine.generate import SamplingParams, generate

    model, cfg, params = hf_moe
    B, S, T = 2, 9, 8
    ids = rng.integers(2, 127, (B, S))
    lengths = np.array([S, S - 3])
    padded = ids.copy()
    padded[1, S - 3:] = 0
    with torch.no_grad():
        ref_rows = []
        for b in range(B):
            row = torch.from_numpy(padded[b:b + 1, :lengths[b]])
            out = model.generate(row, max_new_tokens=T, do_sample=False,
                                 eos_token_id=None, pad_token_id=0)
            ref_rows.append(out[0, lengths[b]:].numpy())
    res = generate(params, cfg, padded, lengths,
                   SamplingParams(max_new_tokens=T, do_sample=False))
    for b in range(B):
        np.testing.assert_array_equal(res.sequences[b, :T], ref_rows[b])


def test_capacity_factor_serving_knob(hf_moe, rng):
    """cfg.moe_capacity_factor plumbs into the decode/forward path: a
    generous factor reproduces full-capacity logits; a tight one still
    produces finite logits (drops, not garbage)."""
    import dataclasses

    from video_r2_tpu.models.model import forward

    _, cfg, params = hf_moe
    B, S = 2, 16
    ids = rng.integers(2, 127, (B, S))
    pos = np.broadcast_to(np.arange(S)[None, None, :], (3, B, S))
    full = np.asarray(forward(params, cfg, ids, pos)[0])
    loose = cfg.replace(text=dataclasses.replace(
        cfg.text, moe_capacity_factor=8.0, moe_group_size=64))
    out = np.asarray(forward(params, loose, ids, pos)[0])
    np.testing.assert_allclose(out, full, rtol=1e-5, atol=1e-5)
    tight = cfg.replace(text=dataclasses.replace(
        cfg.text, moe_capacity_factor=0.5, moe_group_size=64))
    out_t = np.asarray(forward(params, tight, ids, pos)[0])
    assert np.isfinite(out_t).all()


def test_moe_int8_experts(hf_moe, rng):
    """Weight-only int8 experts ({kernel_q, scale} consumed inside the
    grouped einsum, scale factored onto the output) stay close to fp32 and
    keep the greedy argmax on a well-separated distribution."""
    from video_r2_tpu.models.model import forward
    from video_r2_tpu.models.quant import quantize_params

    _, cfg, params = hf_moe
    qparams = quantize_params(params)
    ek = qparams["model"]["layers"]["mlp"]["experts"]["gate"]
    assert "kernel_q" in ek and ek["kernel_q"].shape == (2, 8, 32, 16)
    assert ek["scale"].shape == (2, 8, 16)
    # int4 request must still produce int8 experts (the grouped einsum has
    # no packed-nibble path)
    q4 = quantize_params(params, bits=4, group_size=8)
    assert "kernel_q" in q4["model"]["layers"]["mlp"]["experts"]["gate"]

    B, S = 2, 12
    ids = rng.integers(2, 127, (B, S))
    pos = np.broadcast_to(np.arange(S)[None, None, :], (3, B, S))
    ref = np.asarray(forward(params, cfg, ids, pos)[0])
    ours = np.asarray(forward(qparams, cfg, ids, pos)[0])
    # int8 weight quantization error bound, not bitwise parity
    assert np.abs(ours - ref).max() < 0.15
    assert (ours.argmax(-1) == ref.argmax(-1)).mean() > 0.9


def test_moe_judge_serving_paths(hf_moe):
    """The judge role end-to-end on a MoE model: ChatEngine batch mode
    (generate path) AND the paged continuous engine (whose decode scan body
    routes _mlp/_qk_norm) both produce identical greedy completions."""
    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine

    _, cfg, params = hf_moe
    msgs = [[{"role": "user", "content": "A"}], [{"role": "user", "content": "BC"}]]
    batch_engine = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=4)
    batch_out = batch_engine.chat_batch(msgs)
    cont_engine = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=4,
                             continuous=True, engine_kind="paged",
                             num_slots=4, max_len=64, page_size=16)
    try:
        cont_out = cont_engine.chat_batch(msgs)
    finally:
        cont_engine.shutdown()
    assert batch_out == cont_out
    assert all(isinstance(t, str) for t in batch_out)


def test_moe_hf_export_round_trip(hf_moe):
    """params -> HF state dict -> params round-trips bit-exactly for the
    text-only MoE tree (router, per-expert projections, q/k norms, no
    biases, no visual.*) — the judge checkpoint lifecycle."""
    import jax

    from video_r2_tpu.train.checkpoint import params_to_hf_state_dict

    _, cfg, params = hf_moe
    sd = params_to_hf_state_dict(params, cfg)
    assert not any(k.startswith("visual.") for k in sd)
    assert "model.layers.0.mlp.experts.7.down_proj.weight" in sd
    assert "model.layers.1.self_attn.k_norm.weight" in sd
    assert "model.layers.0.self_attn.q_proj.bias" not in sd
    back = convert_hf_state_dict(sd, cfg, dtype="float32")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, back)


# ------------------------------------------------------------- EP sharding


def test_ep_tp_sharded_generate_token_exact(hf_moe, rng):
    """Sharded MoE generation (ep=2 x tp=2 x fsdp=2 — the judge deployment
    shape: the reference runs its MoE judge on vLLM at TP=4,
    serve_qwen3.sh:13) decodes token-for-token like a single device."""
    from video_r2_tpu.engine.generate import SamplingParams, generate
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh
    from video_r2_tpu.parallel.sharding import shard_params

    _, cfg, params = hf_moe
    B, S, T = 2, 9, 6
    ids = rng.integers(2, 127, (B, S))
    lengths = np.array([S, S - 2])
    ids[1, S - 2:] = 0
    sp = SamplingParams(max_new_tokens=T, do_sample=False)
    ref = generate(params, cfg, ids, lengths, sp)
    mesh = make_mesh(MeshConfig(ep=2, tp=2, fsdp=2))
    res = generate(shard_params(params, mesh), cfg, ids, lengths, sp,
                   mesh=mesh)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_ep_sharded_parity(hf_moe, rng):
    """Params sharded over an ep=4 x tp=2 mesh produce the same logits as a
    single device (GSPMD inserts the token all_to_alls from the expert-axis
    sharding annotations alone)."""
    import jax

    from video_r2_tpu.models.model import forward
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh
    from video_r2_tpu.parallel.sharding import param_shardings

    _, cfg, params = hf_moe
    B, S = 2, 16
    ids = rng.integers(2, 127, (B, S))
    pos = np.broadcast_to(np.arange(S)[None, None, :], (3, B, S)).copy()
    single = np.asarray(forward(params, cfg, ids, pos)[0])

    mesh = make_mesh(MeshConfig(ep=4, tp=2))
    shardings = param_shardings(params, mesh)
    # E=8 over ep=4: 2 experts/device
    espec = shardings["model"]["layers"]["mlp"]["experts"]["gate"]["kernel"].spec
    assert espec[1] == "ep"
    sharded_params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    out = np.asarray(forward(sharded_params, cfg, ids, pos)[0])
    np.testing.assert_allclose(out, single, rtol=2e-4, atol=2e-4)


def test_moe_w8a8_experts(hf_moe, rng):
    """act_quant="int8" actually quantizes MoE expert activations (int8 x
    int8 -> int32 dot, scales factored out) instead of silently no-opping:
    the result differs from weight-only int8 but stays within int8 error of
    fp32."""
    from video_r2_tpu.models.model import forward
    from video_r2_tpu.models.moe import moe_mlp
    from video_r2_tpu.models.quant import quantize_params

    _, cfg, params = hf_moe
    qparams = quantize_params(params)
    B, S = 2, 12
    ids = rng.integers(2, 127, (B, S))
    pos = np.broadcast_to(np.arange(S)[None, None, :], (3, B, S))
    ref = np.asarray(forward(params, cfg, ids, pos)[0])
    w8a8 = np.asarray(forward(qparams, cfg, ids, pos, attn_impl="xla",
                              )[0])  # weight-only baseline
    # direct block check: W8A8 != weight-only (the branch runs) and close
    qlayer = {k: (v[0] if hasattr(v, "shape") else
                  jax.tree_util.tree_map(lambda a: a[0], v))
              for k, v in qparams["model"]["layers"]["mlp"].items()}
    x = rng.normal(0, 1, (1, 16, 32)).astype(np.float32)
    wo = np.asarray(moe_mlp(qlayer, x, 2))
    aq = np.asarray(moe_mlp(qlayer, x, 2, act_quant="int8"))
    assert not np.array_equal(wo, aq)
    assert np.abs(aq - wo).max() < 0.1 * max(np.abs(wo).max(), 1.0)
    assert np.isfinite(w8a8).all() and np.abs(w8a8 - ref).max() < 0.2


def test_quantized_leaves_shard_like_kernels(hf_moe, rng):
    """int8 leaves ({kernel_q, scale}) inherit the kernel's sharding rule —
    the int8 MoE judge's experts must shard over "ep" (replicated experts
    defeat EP's memory scaling on exactly the 30B-class model the feature
    exists for); dense attn/mlp int8 leaves shard like their bf16 kernels,
    and sharded int8 generation stays token-exact."""
    import jax

    from video_r2_tpu.engine.generate import SamplingParams, generate
    from video_r2_tpu.models.quant import quantize_params
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh
    from video_r2_tpu.parallel.sharding import param_shardings, shard_params

    _, cfg, params = hf_moe
    qp = quantize_params(params)
    mesh = make_mesh(MeshConfig(ep=2, tp=2, fsdp=2))
    sh = param_shardings(qp, mesh)
    lay = sh["model"]["layers"]
    assert lay["mlp"]["experts"]["gate"]["kernel_q"].spec == jax.sharding.PartitionSpec(
        None, "ep", "fsdp", "tp")
    assert lay["mlp"]["experts"]["gate"]["scale"].spec == jax.sharding.PartitionSpec(
        None, "ep", "tp")
    assert lay["mlp"]["experts"]["down"]["scale"].spec == jax.sharding.PartitionSpec(
        None, "ep", "fsdp")
    assert lay["attn"]["q"]["kernel_q"].spec == jax.sharding.PartitionSpec(
        None, "fsdp", "tp")
    # norm scales keep replicating (the "scale" translation must not touch
    # paths whose parent has no kernel rule)
    assert lay["input_layernorm"]["scale"].spec == jax.sharding.PartitionSpec()

    B, S, T = 2, 9, 5
    ids = rng.integers(2, 127, (B, S))
    lengths = np.array([S, S - 2])
    ids[1, S - 2:] = 0
    sp = SamplingParams(max_new_tokens=T, do_sample=False)
    ref = generate(qp, cfg, ids, lengths, sp)
    res = generate(shard_params(qp, mesh), cfg, ids, lengths, sp, mesh=mesh)
    np.testing.assert_array_equal(res.sequences, ref.sequences)


def test_capacity_drop_stats_accounting(rng):
    """capacity_drop_stats runs the EXACT moe_mlp keep computation (shared
    _keep_mask): cf=0 never drops; a hand-built all-tokens-to-the-same-two-
    experts router drops exactly (T-C)/T of each expert's slots."""
    import jax.numpy as jnp

    from video_r2_tpu.models.moe import capacity_drop_stats

    H, E, T, k = 4, 4, 8, 2
    # router forcing every token's top-2 to experts (0, 1)
    w = np.zeros((H, E), np.float32)
    w[:, 0] = 2.0
    w[:, 1] = 1.0
    p = {"router": {"kernel": jnp.asarray(w)}}
    x = jnp.asarray(np.abs(rng.normal(1, 0.1, (1, T, H))), jnp.float32)

    st0 = capacity_drop_stats(p, x, k, True, capacity_factor=0.0,
                              group_size=8)
    assert st0["slot_drop_rate"] == 0.0
    assert st0["weight_drop_rate"] == 0.0
    assert st0["expert_max_fill"] == T          # all 8 tokens hit expert 0

    # cf=1: C = ceil(8*2*1/4) = 4 -> each of the two experts keeps 4 of 8
    st1 = capacity_drop_stats(p, x, k, True, capacity_factor=1.0,
                              group_size=8)
    assert st1["capacity"] == 4
    assert abs(st1["slot_drop_rate"] - 0.5) < 1e-6
    assert 0.0 < st1["weight_drop_rate"] < 1.0

    # generous factor on a uniform router: negligible drops
    wu = rng.normal(0, 0.5, (H, E)).astype(np.float32)
    pu = {"router": {"kernel": jnp.asarray(wu)}}
    stu = capacity_drop_stats(pu, x, k, True, capacity_factor=2.0,
                              group_size=8)
    assert stu["slot_drop_rate"] <= 0.25
