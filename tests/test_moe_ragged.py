"""Ragged (active-experts-only) MoE decode: ops/moe_ragged.py.

Megablox-style grouped matmul that reads only the step's routed experts'
weights (VERDICT r3 Missing #2: vLLM's fused MoE does this; the grouped
einsum streams every expert per decode step). Parity is pinned against the
grouped-einsum path (capacity_factor=0, exact) and the dense HF-semantics
oracle, for f32 and int8 expert weights, plus token-exact end-to-end greedy
generation with cfg.moe_ragged_decode=True.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_moe import _build_hf_tiny_moe, tiny_moe_config
from video_r2_tpu.models import convert_hf_state_dict
from video_r2_tpu.models.moe import moe_mlp, moe_mlp_dense_oracle
from video_r2_tpu.ops.moe_ragged import (
    active_expert_table,
    moe_mlp_ragged,
    ragged_expert_ffn,
)


@pytest.fixture(scope="module")
def moe_params():
    """Random tiny MoE block params (E=8, H=32, I=16) + router."""
    E, H, I = 8, 32, 16
    r = np.random.default_rng(7)

    def w(*shape):
        return jnp.asarray(r.normal(0, 0.1, shape), jnp.float32)

    return {
        "router": {"kernel": w(H, E)},
        "experts": {"gate": {"kernel": w(E, H, I)},
                    "up": {"kernel": w(E, H, I)},
                    "down": {"kernel": w(E, I, H)}},
    }


def test_active_expert_table(rng):
    topi = jnp.asarray([[3, 1], [3, 5], [1, 5]])        # distinct: {1, 3, 5}
    ids, a_idx = active_expert_table(topi, num_experts=8)
    assert ids.shape == (6,)                            # A = min(E, T*k)
    np.testing.assert_array_equal(np.asarray(ids), [1, 3, 5, 5, 5, 5])
    # every slot maps back to its expert's row
    flat = np.asarray(topi).reshape(-1)
    rows = np.asarray(ids)[np.asarray(a_idx).reshape(-1)]
    np.testing.assert_array_equal(rows, flat)


@pytest.mark.parametrize("T", [1, 3, 8])
def test_ragged_matches_grouped_and_oracle(moe_params, T, rng):
    H, k = 32, 2
    x = jnp.asarray(rng.normal(0, 1, (1, T, H)), jnp.float32)
    grouped = moe_mlp(moe_params, x, k, True, capacity_factor=0.0)
    dense = moe_mlp_dense_oracle(moe_params, x, k, True)
    ragged = moe_mlp_ragged(moe_params, x.reshape(T, H), k, True,
                            interpret=True).reshape(1, T, H)
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(grouped),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_ragged_block_i_non_divisible(moe_params, rng):
    """block_i that doesn't divide I picks the largest divisor instead of
    asserting — the A3B judge preset (moe_intermediate_size=768,
    models/config.py qwen3_moe_30b_a3b) hits exactly this against the 512
    default and used to crash on its first ragged decode step."""
    from video_r2_tpu.models.moe import route
    from video_r2_tpu.ops.moe_ragged import active_expert_table

    T, H, k, E = 2, 32, 2, 8
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    topv, topi = route(moe_params["router"]["kernel"], x, k, True)
    ids, a_idx = active_expert_table(topi, E)
    A = ids.shape[0]
    x_slots = jnp.zeros((A, 8, H), jnp.float32).at[0, 0].set(x[0])
    full = ragged_expert_ffn(x_slots, ids, moe_params["experts"]["gate"],
                             moe_params["experts"]["up"],
                             moe_params["experts"]["down"],
                             block_i=16, interpret=True)   # I=16, divides
    tiled = ragged_expert_ffn(x_slots, ids, moe_params["experts"]["gate"],
                              moe_params["experts"]["up"],
                              moe_params["experts"]["down"],
                              block_i=12, interpret=True)  # 12 ∤ 16 -> bi=8
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_ragged_int8_experts(moe_params, rng):
    """int8 weight-only expert leaves ({kernel_q, scale}) dequantize inside
    the kernel tile-by-tile — parity vs the grouped einsum's factored-scale
    int8 path."""
    from video_r2_tpu.models.quant import quantize_params

    qp = quantize_params(moe_params)
    assert "kernel_q" in qp["experts"]["gate"], "experts must quantize"
    T, H, k = 4, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (1, T, H)), jnp.float32)
    grouped = moe_mlp(qp, x, k, True, capacity_factor=0.0)
    ragged = moe_mlp_ragged(qp, x.reshape(T, H), k, True,
                            interpret=True).reshape(1, T, H)
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(grouped),
                               rtol=2e-5, atol=2e-5)


def test_ragged_w8a8(moe_params, rng):
    """act_quant="int8" through the ragged decode kernel: differs from
    weight-only, stays within int8 error of the einsum W8A8 path, and
    moe_mlp(ragged_decode=True, act_quant="int8") no longer falls back to
    the einsum when the weights are int8."""
    from video_r2_tpu.models.quant import quantize_params

    qp = quantize_params(moe_params)
    T, H, k = 4, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    wo = np.asarray(moe_mlp_ragged(qp, x, k, True, interpret=True))
    aq = np.asarray(moe_mlp_ragged(qp, x, k, True, interpret=True,
                                   act_quant="int8"))
    assert not np.array_equal(wo, aq)
    ein = np.asarray(moe_mlp(qp, x[None], k, True, capacity_factor=0.0,
                             act_quant="int8")[0])
    assert np.abs(aq - ein).max() < 0.1 * max(np.abs(ein).max(), 1.0)
    via = np.asarray(moe_mlp(qp, x[None], k, True, act_quant="int8",
                             ragged_decode=True)[0])
    np.testing.assert_allclose(via, aq, rtol=1e-6, atol=1e-6)
    # dtype contract: the W8A8 kernel's f32 accumulator must not leak into
    # the decoder's bf16 residual (a lax.scan carry — dtype mismatch there
    # is a trace-time TypeError)
    xb = x.astype(jnp.bfloat16)
    out_b = moe_mlp_ragged(qp, xb, k, True, interpret=True,
                           act_quant="int8")
    assert out_b.dtype == jnp.bfloat16


def test_ragged_ffn_reads_only_active(moe_params, rng):
    """Poison the INACTIVE experts' weights with NaN: the ragged output must
    stay finite (those rows are never touched), while the all-experts
    grouped einsum would propagate NaN through 0*NaN combines."""
    T, H, k = 2, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    from video_r2_tpu.models.moe import route

    topv, topi = route(moe_params["router"]["kernel"], x, k, True)
    active = set(np.asarray(topi).reshape(-1).tolist())
    inactive = [e for e in range(8) if e not in active]
    assert inactive, "need at least one untouched expert for this test"
    poisoned = jax.tree_util.tree_map(lambda v: v, moe_params)
    for name in ("gate", "up", "down"):
        w = np.asarray(poisoned["experts"][name]["kernel"]).copy()
        w[inactive] = np.nan
        poisoned["experts"][name]["kernel"] = jnp.asarray(w)
    out = moe_mlp_ragged(poisoned, x, k, True, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    clean = moe_mlp_ragged(moe_params, x, k, True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(clean),
                               rtol=1e-6, atol=1e-6)


def test_generate_ragged_decode_token_exact(rng):
    """cfg.moe_ragged_decode=True: greedy generation is token-identical to
    the grouped-einsum path (prefill stays grouped; decode steps go ragged)
    — the end-to-end flag a single-chip MoE judge serves with."""
    from video_r2_tpu.engine.generate import SamplingParams, generate

    model = _build_hf_tiny_moe()
    cfg = tiny_moe_config()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    B, S, T = 2, 9, 8
    ids = rng.integers(2, 127, (B, S))
    lengths = np.array([S, S - 3])
    ids[1, S - 3:] = 0
    sp = SamplingParams(max_new_tokens=T, do_sample=False)
    ref = generate(params, cfg, ids, lengths, sp)
    rcfg = cfg.replace(text=dataclasses.replace(cfg.text,
                                                moe_ragged_decode=True))
    res = generate(params, rcfg, ids, lengths, sp)
    np.testing.assert_array_equal(np.asarray(res.sequences),
                                  np.asarray(ref.sequences))


def test_ragged_sharded_matches_oracle(moe_params, rng):
    """ep x tp sharded ragged decode (moe_mlp_ragged_sharded): parity vs the
    dense oracle and the single-device ragged path, and PROOF the per-shard
    kernel reads only locally-routed experts — NaN-poisoning every expert no
    token routes to leaves the sharded ragged output finite (the ep-meshed
    einsum would stream those rows and 0*NaN-poison the combine)."""
    from video_r2_tpu.models.moe import route
    from video_r2_tpu.ops.moe_ragged import (moe_mlp_ragged_sharded,
                                             ragged_mesh_ok)
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(ep=2, tp=2))
    assert ragged_mesh_ok(mesh, moe_params)
    T, H, k = 3, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    dense = moe_mlp_dense_oracle(moe_params, x[None], k, True)[0]
    single = moe_mlp_ragged(moe_params, x, k, True, interpret=True)
    sharded = moe_mlp_ragged_sharded(moe_params, x, k, True, mesh,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)

    _, topi = route(moe_params["router"]["kernel"], x, k, True)
    active = set(np.asarray(topi).reshape(-1).tolist())
    inactive = [e for e in range(8) if e not in active]
    assert inactive
    poisoned = jax.tree_util.tree_map(lambda v: v, moe_params)
    for name in ("gate", "up", "down"):
        w = np.asarray(poisoned["experts"][name]["kernel"]).copy()
        w[inactive] = np.nan
        poisoned["experts"][name]["kernel"] = jnp.asarray(w)
    out = moe_mlp_ragged_sharded(poisoned, x, k, True, mesh, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               rtol=1e-5, atol=1e-5)


def test_ragged_sharded_int8_and_empty_shard(moe_params, rng):
    """int8 expert leaves under the ep x tp shard_map (per-tile dequant on
    LOCAL scale slices), and the empty-shard edge: a router biased so every
    token routes to experts 0-1 leaves ep-shard 1 (experts 4-7) with ZERO
    local slots — its active table clamps in-range (one wasted weight DMA,
    zero combine) and the psum still reproduces the oracle."""
    from video_r2_tpu.models.quant import quantize_params
    from video_r2_tpu.ops.moe_ragged import moe_mlp_ragged_sharded
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(ep=2, tp=2))
    T, H, k = 4, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)

    qp = quantize_params(moe_params)
    q_single = moe_mlp_ragged(qp, x, k, True, interpret=True)
    q_shard = moe_mlp_ragged_sharded(qp, x, k, True, mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(q_shard), np.asarray(q_single),
                               rtol=2e-5, atol=2e-5)

    biased = jax.tree_util.tree_map(lambda v: v, moe_params)
    rk = np.asarray(biased["router"]["kernel"]).copy()
    rk[:, 2:] -= 50.0            # experts 2-7 never win top-2
    biased["router"]["kernel"] = jnp.asarray(rk)
    dense = moe_mlp_dense_oracle(biased, x[None], k, True)[0]
    sharded = moe_mlp_ragged_sharded(biased, x, k, True, mesh,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_ragged_sharded_generate_token_exact(rng):
    """cfg.moe_ragged_decode=True under an ep x tp mesh: generate() decode
    steps run the shard_map'd ragged kernel and stay token-identical to the
    unmeshed einsum path — the sharded-judge serving config."""
    from video_r2_tpu.engine.generate import SamplingParams, generate
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    model = _build_hf_tiny_moe()
    cfg = tiny_moe_config()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    rcfg = cfg.replace(text=dataclasses.replace(cfg.text,
                                                moe_ragged_decode=True))
    B, S, T = 2, 9, 6
    ids = rng.integers(2, 127, (B, S))
    lengths = np.array([S, S - 2])
    sp = SamplingParams(max_new_tokens=T, do_sample=False)
    ref = generate(params, cfg, ids, lengths, sp)
    mesh = make_mesh(MeshConfig(ep=2, tp=2))
    res = generate(params, rcfg, ids, lengths, sp, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(res.sequences),
                                  np.asarray(ref.sequences))

def test_ragged_sharded_short_forward_scoring(rng):
    """model.forward with a SHORT sequence (T <= RAGGED_MAX_TOKENS), a
    sharded MoE, and moe_ragged_decode=True — the eval loglikelihood
    scoring shape. Regression pin: forward() didn't thread mesh, so this
    traced the single-device ragged Pallas kernel over ep x tp-sharded
    expert weights (the exact 'silent single-device kernel on sharded
    weights' case the engine paths guard against)."""
    from video_r2_tpu.models.model import forward
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh
    from video_r2_tpu.parallel.sharding import shard_params

    model = _build_hf_tiny_moe()
    cfg = tiny_moe_config()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    rcfg = cfg.replace(text=dataclasses.replace(cfg.text,
                                                moe_ragged_decode=True))
    ids = rng.integers(2, 127, (1, 12))
    pos = np.broadcast_to(np.arange(12)[None, None], (3, 1, 12)).copy()
    single = np.asarray(forward(params, cfg, ids, pos)[0])
    mesh = make_mesh(MeshConfig(ep=2, tp=2))
    sharded = np.asarray(forward(shard_params(params, mesh), rcfg, ids, pos,
                                 mesh=mesh)[0])
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-4)


def test_ragged_sharded_paged_engine_token_exact(rng):
    """The paged continuous engine (the judge-serving engine) under
    ep=2 x tp=2 with moe_ragged_decode=True: token-exact vs the unmeshed
    einsum engine."""
    from video_r2_tpu.engine.continuous import PagedContinuousEngine
    from video_r2_tpu.engine.sampling import SamplingParams as SP
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    model = _build_hf_tiny_moe()
    cfg = tiny_moe_config()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    rcfg = cfg.replace(text=dataclasses.replace(cfg.text,
                                                moe_ragged_decode=True))
    ids = rng.integers(2, 127, (2, 9))
    mesh = make_mesh(MeshConfig(ep=2, tp=2))
    kw = dict(num_slots=2, max_len=64,
              sp=SP(pad_token_id=cfg.pad_token_id, eos_token_ids=()),
              prompt_buckets=(16,), page_size=16)
    eng = PagedContinuousEngine(params, rcfg, mesh=mesh, **kw)
    rids = [eng.submit(list(p), max_new_tokens=4)
            for p in (ids[0].tolist(), ids[1, :7].tolist())]
    out = {}
    while eng.num_active:
        for rid, toks in eng.step():
            out[rid] = toks
    single = PagedContinuousEngine(params, cfg, **kw)
    rids_s = [single.submit(list(p), max_new_tokens=4)
              for p in (ids[0].tolist(), ids[1, :7].tolist())]
    out_s = {}
    while single.num_active:
        for rid, toks in single.step():
            out_s[rid] = toks
    assert [out[r] for r in rids] == [out_s[r] for r in rids_s]
