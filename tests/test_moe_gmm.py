"""Sorted grouped-matmul MoE prefill (ops/moe_gmm.py).

Exactness pins: GMM == dense HF-semantics oracle == the einsum's exact
mode (capacity_factor=0), for f32 and int8 experts, across skewed
routers, empty experts, and multi-block expert runs; ep x tp sharded ==
single-device; end-to-end generate with the judge preset flags. The
NaN-poison test proves only routed experts' weights are read — the
whole point vs the einsum's all-experts slot tensor.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_moe import _build_hf_tiny_moe, tiny_moe_config
from tests.test_moe_ragged import moe_params  # noqa: F401 (fixture)
from video_r2_tpu.models import convert_hf_state_dict
from video_r2_tpu.models.moe import moe_mlp, moe_mlp_dense_oracle
from video_r2_tpu.ops.moe_gmm import (
    moe_mlp_gmm,
    moe_mlp_gmm_sharded,
    sorted_expert_layout,
)


def test_sorted_expert_layout():
    topi = jnp.asarray([[3, 1], [3, 3], [1, 5]])   # expert 3 twice via row 1
    dst, blk_expert, blk_valid, R_pad = sorted_expert_layout(
        topi, 8, block_rows=2)
    assert R_pad % 2 == 0 and R_pad >= 6
    f = np.asarray(topi).reshape(-1)
    d = np.asarray(dst)
    # rows of the same expert are contiguous and block-aligned per expert
    for e in np.unique(f):
        rows = np.sort(d[f == e])
        assert rows[0] % 2 == 0                     # block-aligned start
        assert (np.diff(rows) == 1).all()           # contiguous run
        # every block the run touches maps to this expert and is valid
        for b in {r // 2 for r in rows}:
            assert int(np.asarray(blk_expert)[b]) == e
            assert int(np.asarray(blk_valid)[b]) == 1
    assert len(set(d.tolist())) == d.size           # distinct rows
    # occupied: expert 1 (2 rows: 1 block), 3 (3 rows: 2 blocks), 5 (1 row:
    # 1 block) = 4 valid blocks; the rest of the static bound is slack
    assert int(np.asarray(blk_valid).sum()) == 4


def test_sorted_expert_layout_sentinels():
    """Sentinel ids (== E, the ep path's non-local marker) occupy NO rows:
    they all map to the trash row R_pad-1, and the occupied block count
    reflects only the real slots."""
    topi = jnp.asarray([[8, 1], [8, 8], [1, 8]])    # 4 sentinels, 2 real
    dst, blk_expert, blk_valid, R_pad = sorted_expert_layout(
        topi, 8, block_rows=2)
    f = np.asarray(topi).reshape(-1)
    d = np.asarray(dst)
    assert (d[f == 8] == R_pad - 1).all()
    assert int(np.asarray(blk_valid).sum()) == 1    # one block for expert 1
    rows = np.sort(d[f == 1])
    assert rows.tolist() == [0, 1]


@pytest.mark.parametrize("T,bm", [(1, 8), (5, 8), (40, 8), (16, 4)])
def test_gmm_matches_oracle(moe_params, rng, T, bm):
    H, k = 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    dense = moe_mlp_dense_oracle(moe_params, x[None], k, True)[0]
    gmm = moe_mlp_gmm(moe_params, x, k, True, block_rows=bm, interpret=True)
    np.testing.assert_allclose(np.asarray(gmm), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_gmm_skewed_router_single_expert(moe_params, rng):
    """All tokens routed to experts {0, 1}: one expert's run spans many
    blocks (the multi-block-per-expert path) and most experts are empty
    (zero blocks — no compute, unlike the einsum)."""
    T, H, k = 12, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    biased = jax.tree_util.tree_map(lambda v: v, moe_params)
    rk = np.asarray(biased["router"]["kernel"]).copy()
    rk[:, 2:] -= 50.0
    biased["router"]["kernel"] = jnp.asarray(rk)
    dense = moe_mlp_dense_oracle(biased, x[None], k, True)[0]
    gmm = moe_mlp_gmm(biased, x, k, True, block_rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(gmm), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_gmm_int8_experts(moe_params, rng):
    from video_r2_tpu.models.quant import quantize_params

    qp = quantize_params(moe_params)
    T, H, k = 9, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    ein = moe_mlp(qp, x[None], k, True, capacity_factor=0.0)[0]
    gmm = moe_mlp_gmm(qp, x, k, True, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(gmm), np.asarray(ein),
                               rtol=2e-5, atol=2e-5)


def test_gmm_w8a8(moe_params, rng):
    """act_quant="int8" through the GMM kernel (_ffn_kernel_qq: integer-MXU
    dots, row scales factored out): differs from weight-only (the branch
    runs), stays within int8 error of the einsum W8A8 path (per-TILE h
    requantization vs its full-row quant), and moe_mlp routes there
    instead of silently falling back to the einsum."""
    from video_r2_tpu.models.quant import quantize_params
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    qp = quantize_params(moe_params)
    T, H, k = 10, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    wo = np.asarray(moe_mlp_gmm(qp, x, k, True, block_rows=8,
                                interpret=True))
    aq = np.asarray(moe_mlp_gmm(qp, x, k, True, block_rows=8,
                                interpret=True, act_quant="int8"))
    assert not np.array_equal(wo, aq)
    ein = np.asarray(moe_mlp(qp, x[None], k, True, capacity_factor=0.0,
                             act_quant="int8")[0])
    assert np.abs(aq - ein).max() < 0.1 * max(np.abs(ein).max(), 1.0)
    # moe_mlp with the flags takes the kernel path (poison-free proof:
    # identical to the direct kernel call, not to the einsum)
    via = np.asarray(moe_mlp(qp, x[None], k, True, act_quant="int8",
                             gmm_prefill=True)[0])
    direct = np.asarray(moe_mlp_gmm(qp, x, k, True, interpret=True,
                                    act_quant="int8"))
    np.testing.assert_allclose(via, direct, rtol=1e-6, atol=1e-6)
    # sharded W8A8
    mesh = make_mesh(MeshConfig(ep=2, tp=2))
    shard = np.asarray(moe_mlp_gmm_sharded(qp, x, k, True, mesh,
                                           interpret=True,
                                           act_quant="int8"))
    single = np.asarray(moe_mlp_gmm(qp, x, k, True,
                                    block_rows=None, interpret=True,
                                    act_quant="int8"))
    # tp splits the intermediate axis, so per-tile h quant boundaries
    # differ from single-device — int8-error agreement, not bitwise
    assert np.abs(shard - single).max() < 0.1 * max(np.abs(single).max(), 1.0)


def test_gmm_reads_only_routed_experts(moe_params, rng):
    """NaN-poison every expert no token routes to: GMM output stays finite
    (those weight rows are never DMA'd) while the exact-mode einsum
    computes every expert's slots and 0*NaN-poisons the combine."""
    from video_r2_tpu.models.moe import route

    T, H, k = 4, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    _, topi = route(moe_params["router"]["kernel"], x, k, True)
    active = set(np.asarray(topi).reshape(-1).tolist())
    inactive = [e for e in range(8) if e not in active]
    assert inactive
    poisoned = jax.tree_util.tree_map(lambda v: v, moe_params)
    for name in ("gate", "up", "down"):
        w = np.asarray(poisoned["experts"][name]["kernel"]).copy()
        w[inactive] = np.nan
        poisoned["experts"][name]["kernel"] = jnp.asarray(w)
    out = moe_mlp_gmm(poisoned, x, k, True, block_rows=8, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    clean = moe_mlp_gmm(moe_params, x, k, True, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(clean),
                               rtol=1e-6, atol=1e-6)


def test_gmm_sharded_matches_single(moe_params, rng):
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(ep=2, tp=2))
    T, H, k = 20, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    single = moe_mlp_gmm(moe_params, x, k, True, interpret=True)
    sharded = moe_mlp_gmm_sharded(moe_params, x, k, True, mesh,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-5)

    from video_r2_tpu.models.quant import quantize_params

    qp = quantize_params(moe_params)
    q_single = moe_mlp_gmm(qp, x, k, True, interpret=True)
    q_shard = moe_mlp_gmm_sharded(qp, x, k, True, mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(q_shard), np.asarray(q_single),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bm", [8, 4])
def test_gmm_diff_grads_match_einsum(moe_params, rng, bm):
    """The custom-VJP GMM path (float weights) produces the SAME gradients
    as the exact-mode einsum for router kernel, expert weights, and the
    input — the recompute backward kernels (dx over (a,i); per-expert dW
    over (i,a) with run-boundary flushes) are numerically the einsum's
    autodiff. bm=4 makes the busiest experts span multiple row blocks
    (the accumulate-then-flush path); experts absent from the routing
    must get EXACTLY zero grads (the aliased-zeros init)."""
    from video_r2_tpu.models.moe import route
    from video_r2_tpu.ops.moe_gmm import moe_mlp_gmm_diff

    T, H, k = 10, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (T, H)), jnp.float32)

    def loss_gmm(p, x):
        return jnp.sum(moe_mlp_gmm_diff(p, x, k, True, block_rows=bm,
                                        interpret=True) * cot)

    def loss_ein(p, x):
        return jnp.sum(moe_mlp(p, x[None], k, True,
                               capacity_factor=0.0)[0] * cot)

    gp, gx = jax.jit(jax.grad(loss_gmm, argnums=(0, 1)))(moe_params, x)
    rp, rx = jax.jit(jax.grad(loss_ein, argnums=(0, 1)))(moe_params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-4)
    for path in (("router", "kernel"), ("experts", "gate", "kernel"),
                 ("experts", "up", "kernel"), ("experts", "down", "kernel")):
        a, b = gp, rp
        for key in path:
            a, b = a[key], b[key]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg="/".join(path))
    _, topi = route(moe_params["router"]["kernel"], x, k, True)
    counts = np.bincount(np.asarray(topi).reshape(-1), minlength=8)
    if bm == 4:
        assert counts.max() > bm, "need a multi-block expert run"
    inactive = [e for e in range(8) if counts[e] == 0]
    if inactive:
        gg = np.asarray(gp["experts"]["gate"]["kernel"])
        assert np.abs(gg[inactive]).max() == 0.0


def test_gmm_diff_through_moe_mlp(moe_params, rng):
    """moe_mlp(gmm_prefill=True) with FLOAT weights routes through the
    custom-VJP wrapper: jax.grad works and matches the einsum's grads
    (a direct single-device training loop over the flag needs no
    downgrade)."""
    T, H, k = 12, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (1, T, H)), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (1, T, H)), jnp.float32)

    def loss(p, gmm):
        return jnp.sum(moe_mlp(p, x, k, True, capacity_factor=0.0,
                               gmm_prefill=gmm) * cot)

    g1 = jax.grad(lambda p: loss(p, True))(moe_params)
    g2 = jax.grad(lambda p: loss(p, False))(moe_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=2e-4, atol=2e-4),
        g1, g2)


def test_gmm_generate_token_exact(rng):
    """cfg.moe_gmm_prefill=True: prefill goes GMM, decode goes ragged —
    greedy generation token-identical to the einsum-only config (the full
    judge preset flag set at tiny scale)."""
    from video_r2_tpu.engine.generate import SamplingParams, generate

    model = _build_hf_tiny_moe()
    cfg = tiny_moe_config()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    B, S, T = 2, 40, 6   # S past RAGGED_MAX_TOKENS so prefill is GMM-sized
    ids = rng.integers(2, 127, (B, S))
    lengths = np.array([S, S - 5])
    ids[1, S - 5:] = 0
    sp = SamplingParams(max_new_tokens=T, do_sample=False)
    ref = generate(params, cfg, ids, lengths, sp)
    jcfg = cfg.replace(text=dataclasses.replace(
        cfg.text, moe_ragged_decode=True, moe_gmm_prefill=True))
    res = generate(params, jcfg, ids, lengths, sp)
    np.testing.assert_array_equal(np.asarray(res.sequences),
                                  np.asarray(ref.sequences))


def test_gmm_training_downgrade(rng):
    """make_sft_step with a moe_gmm_prefill=True config trains through the
    einsum (the GMM kernel has no VJP) — the step runs and produces a
    finite loss instead of a missing-VJP error."""
    from video_r2_tpu.ops.fused_ce import IGNORE_INDEX
    from video_r2_tpu.train import (OptimConfig, SFTConfig, init_train_state,
                                    make_optimizer, make_sft_step)

    model = _build_hf_tiny_moe()
    cfg = tiny_moe_config()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    jcfg = cfg.replace(text=dataclasses.replace(cfg.text,
                                                moe_gmm_prefill=True))
    opt = make_optimizer(OptimConfig(learning_rate=1e-4, total_steps=4),
                         params)
    step = make_sft_step(jcfg, SFTConfig(ce_chunk_size=32), opt, donate=False)
    B, S = 2, 40
    ids = rng.integers(2, 127, (B, S))
    labels = ids.copy()
    labels[:, :4] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(S)[None, None], (3, B, S)).copy()),
        "attention_mask": jnp.ones((B, S), jnp.int32),
    }
    _, metrics = step(init_train_state(params, opt), batch)
    assert np.isfinite(float(metrics["loss"]))
