"""Int8 weight-only quantization: round-trip error bounds, quantized forward
closeness, and generation on the quantized model."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_r2_tpu.models import forward, get_rope_index, init_params, tiny_test_config
from video_r2_tpu.models.quant import (
    dequantize_kernel,
    quantize_kernel,
    quantize_params,
    quantized_param_bytes,
)


def test_quantize_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    q = quantize_kernel(w)
    assert q["kernel_q"].dtype == jnp.int8
    back = dequantize_kernel(q, dtype=jnp.float32)
    err = np.abs(np.asarray(back - w))
    # per-channel scale -> error bounded by scale/2 per channel
    bound = np.asarray(q["scale"]) / 2 + 1e-6
    assert (err <= bound[None, :] + 1e-5).all()


def test_quantize_params_structure_and_size(rng):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    qp = quantize_params(params)
    lay = qp["model"]["layers"]["attn"]["q"]
    assert "kernel_q" in lay and "bias" in lay and "kernel" not in lay
    assert lay["kernel_q"].dtype == jnp.int8
    # norms untouched
    assert "scale" in qp["model"]["norm"]
    orig = quantized_param_bytes(params)
    quant = quantized_param_bytes(qp)
    assert quant < orig * 0.45  # fp32 -> mostly int8


def test_quantized_forward_close():
    # local deterministic rng: the shared session fixture's state depends on
    # test ordering and top-1 agreement on a random model is draw-sensitive
    rng = np.random.default_rng(1234)
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    qp = quantize_params(params)
    ids = rng.integers(2, 400, size=(1, 12))
    pos, _ = get_rope_index(ids, cfg)
    ref, _ = forward(params, cfg, ids, pos)
    out, _ = forward(qp, cfg, ids, pos)
    ref, out = np.asarray(ref), np.asarray(out)
    # int8 error compounds through a random (unstructured) model; bound the
    # relative drift and require strong top-1 agreement
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.2
    assert np.abs(out - ref).mean() / denom < 0.02
    agree = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert agree >= 0.85


def test_quantized_generation_runs(rng):
    from video_r2_tpu.engine import SamplingParams, generate

    cfg = tiny_test_config()
    qp = quantize_params(init_params(cfg, dtype="float32"))
    ids = rng.integers(2, 400, size=(2, 6))
    res = generate(qp, cfg, ids, np.array([6, 6]),
                   SamplingParams(max_new_tokens=4, pad_token_id=cfg.pad_token_id))
    assert res.sequences.shape == (2, 4)


def test_int8_matmul_kernel_matches_xla(rng):
    import jax.numpy as jnp

    from video_r2_tpu.ops.int8_matmul import int8_matmul

    M, K, N = 32, 300, 500  # ragged: exercises padding
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    wq = jnp.asarray(rng.integers(-127, 128, size=(K, N)), dtype=jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, size=N).astype(np.float32))
    ref = (x @ wq.astype(jnp.float32)) * scale
    out = int8_matmul(x, wq, scale, block_k=128, block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_int8_matmul_stacked_matches_xla(rng):
    """Scalar-prefetch stacked kernel: each layer index selects the right
    weight slab out of the [L, K, N] buffer."""
    import jax.numpy as jnp

    from video_r2_tpu.ops.int8_matmul import int8_matmul_stacked

    L, M, K, N = 3, 16, 256, 384
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    wq = jnp.asarray(rng.integers(-127, 128, size=(L, K, N)), dtype=jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, size=(L, N)).astype(np.float32))
    for layer in range(L):
        ref = (x @ wq[layer].astype(jnp.float32)) * scale[layer]
        out = int8_matmul_stacked(x, wq, scale, layer, block_k=128,
                                  block_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_int4_pack_roundtrip(rng):
    import jax.numpy as jnp

    from video_r2_tpu.ops.int4_matmul import (pack_int4_halves,
                                              unpack_int4_halves)

    q = rng.integers(-7, 8, size=(3, 256, 64)).astype(np.int8)
    packed = pack_int4_halves(jnp.asarray(q))
    assert packed.shape == (3, 128, 64) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_int4_halves(packed)), q)


def test_int4_quantize_dequantize_error_bound(rng):
    import jax.numpy as jnp

    from video_r2_tpu.models.quant import (dequantize_kernel_int4,
                                           quantize_kernel_int4)

    w = rng.normal(size=(512, 96)).astype(np.float32)
    leaf = quantize_kernel_int4(jnp.asarray(w), group_size=128)
    deq = np.asarray(dequantize_kernel_int4(leaf, jnp.float32,
                                            group_size=128))
    # symmetric 4-bit with per-group amax scale: |err| <= scale/2 per weight
    scales = np.abs(w.reshape(4, 128, 96)).max(axis=1, keepdims=True) / 7.0
    bound = np.broadcast_to(scales / 2 + 1e-7, (4, 128, 96)).reshape(512, 96)
    assert (np.abs(deq - w) <= bound).all()


def test_int4_matmul_stacked_matches_dequant(rng):
    import jax.numpy as jnp

    from video_r2_tpu.models.quant import quantize_kernel_int4
    from video_r2_tpu.ops.int4_matmul import dequant_int4, int4_matmul_stacked

    L, M, K, N, g = 2, 16, 512, 384, 128
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(L, K, N)).astype(np.float32))
    leaf = quantize_kernel_int4(w, group_size=g)
    for layer in range(L):
        ref = x @ dequant_int4(leaf["kernel_q4"][layer],
                               leaf["scale4"][layer], g, jnp.float32)
        out = int4_matmul_stacked(x, leaf["kernel_q4"], leaf["scale4"],
                                  layer, group_size=g, block_kp=128,
                                  block_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_w8a8_prefill_close_to_weight_only(rng):
    """Dynamic per-token activation int8 (integer-MXU prefill path) tracks
    the weight-only int8 forward closely."""
    from video_r2_tpu.engine import SamplingParams
    from video_r2_tpu.engine.generate import prefill

    cfg = tiny_test_config()
    qp = quantize_params(init_params(cfg, dtype="float32"))
    ids = rng.integers(2, 400, size=(2, 8)).astype(np.int32)
    lengths = jnp.asarray(np.array([8, 8], np.int32))
    pos, _ = get_rope_index(ids, cfg)
    ref, _ = prefill(qp, cfg, jnp.asarray(ids), jnp.asarray(pos), lengths, 12)
    out, _ = prefill(qp, cfg, jnp.asarray(ids), jnp.asarray(pos), lengths, 12,
                     act_quant="int8")
    ref, out = np.asarray(ref), np.asarray(out)
    assert (ref.argmax(-1) == out.argmax(-1)).mean() >= 0.5
    # logit drift bounded relative to the logit scale
    assert np.abs(out - ref).max() <= 0.15 * np.abs(ref).max() + 0.05


def test_int4_forward_exact_vs_materialized_dequant(rng):
    """The fused int4 path computes EXACTLY the dequantized-weights model
    (no dispatch/packing drift); generation runs end to end.

    (Token agreement with the fp model is not asserted: random tiny-model
    logits are near-uniform, so inherent 4-bit noise flips argmax — with
    trained weights group-128 int4 tracks fp closely, which the error-bound
    test above pins down per weight.)"""
    from video_r2_tpu.engine import SamplingParams, generate
    from video_r2_tpu.models.quant import dequantize_kernel_int4

    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    qp = quantize_params(params, bits=4, group_size=8)

    def deq(node):
        if isinstance(node, dict):
            if "kernel_q4" in node:
                out = {k: v for k, v in node.items()
                       if k not in ("kernel_q4", "scale4")}
                K = 2 * node["kernel_q4"].shape[-2]
                g = K // node["scale4"].shape[-2]
                out["kernel"] = dequantize_kernel_int4(node, jnp.float32,
                                                       group_size=g)
                return out
            if "kernel_q" in node:
                out = {k: v for k, v in node.items()
                       if k not in ("kernel_q", "scale")}
                out["kernel"] = (node["kernel_q"].astype(jnp.float32)
                                 * node["scale"][..., None, :])
                return out
            return {k: deq(v) for k, v in node.items()}
        return node

    ids = rng.integers(2, 400, size=(2, 6))
    pos, _ = get_rope_index(ids, cfg)
    lq, _ = forward(qp, cfg, jnp.asarray(ids), jnp.asarray(pos))
    ld, _ = forward(deq(qp), cfg, jnp.asarray(ids), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(lq), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)

    sp = SamplingParams(max_new_tokens=6, pad_token_id=cfg.pad_token_id)
    out = generate(qp, cfg, ids, np.array([6, 6]), sp)
    assert out.sequences.shape == (2, 6)


def test_qlora_training_over_int8_base(rng):
    """QLoRA: LoRA adapters train over a frozen int8 base, loss decreases."""
    import jax.numpy as jnp

    from video_r2_tpu.ops.fused_ce import IGNORE_INDEX
    from video_r2_tpu.train import OptimConfig, SFTConfig, make_optimizer
    from video_r2_tpu.train.lora import (
        LoRAConfig,
        LoRATrainState,
        attach_lora,
        init_lora,
        init_lora_for_quantized,
        make_lora_sft_step,
    )

    cfg = tiny_test_config()
    base = quantize_params(init_params(cfg, dtype="float32"))
    lcfg = LoRAConfig(r=4, alpha=8)
    lora = init_lora_for_quantized(base, lcfg)
    assert lora, "no adapters found over quantized base"

    # attach is identity at init (B = 0)
    from video_r2_tpu.models import forward, get_rope_index

    ids = rng.integers(2, 400, size=(1, 10))
    pos, _ = get_rope_index(ids, cfg)
    ref, _ = forward(base, cfg, ids, pos)
    att, _ = forward(attach_lora(base, lora, lcfg), cfg, ids, pos)
    # adding the (x@A)@0 term changes XLA fusion boundaries -> tiny noise
    np.testing.assert_allclose(np.asarray(att), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    opt = make_optimizer(OptimConfig(learning_rate=5e-3, total_steps=10), lora)
    step = make_lora_sft_step(base, cfg, SFTConfig(ce_chunk_size=32), lcfg,
                              opt, donate=False)
    state = LoRATrainState(lora, opt.init(lora), jnp.zeros((), jnp.int32))
    B, S = 2, 12
    bids = rng.integers(2, 400, size=(B, S))
    labels = bids.copy()
    labels[:, :4] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(bids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(S)[None, None], (3, B, S)).copy()),
        "attention_mask": jnp.ones((B, S), jnp.int32),
    }
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_attach_matches_merge_for_dense(rng):
    from video_r2_tpu.models import forward, get_rope_index
    from video_r2_tpu.train.lora import (
        LoRAConfig,
        attach_lora,
        init_lora,
        merge_lora,
    )
    import jax

    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    lcfg = LoRAConfig(r=4, alpha=8)
    lora = init_lora(params, lcfg, seed=3)
    # give B nonzero values so the delta is active
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    ids = rng.integers(2, 400, size=(1, 8))
    pos, _ = get_rope_index(ids, cfg)
    merged, _ = forward(merge_lora(params, lora, lcfg), cfg, ids, pos)
    attached, _ = forward(attach_lora(params, lora, lcfg), cfg, ids, pos)
    np.testing.assert_allclose(np.asarray(attached), np.asarray(merged),
                               rtol=2e-5, atol=2e-6)


def test_vit_forward_w8a8(rng):
    """W8A8 inside the ViT (act_quant='int8' through stacked quantized
    leaves) runs and stays close to the weight-only int8 tower."""
    import jax.numpy as jnp

    from video_r2_tpu.models import init_params, tiny_test_config
    from video_r2_tpu.models.quant import quantize_params
    from video_r2_tpu.models.vision import plan_vision_layout, vit_forward

    cfg = tiny_test_config()
    v = cfg.vision
    params = quantize_params(init_params(cfg, dtype="float32"))["visual"]
    layout = plan_vision_layout([(2, 6, 10)], v)
    patches = jnp.asarray(rng.normal(
        size=(layout.seq_len_real, v.patch_input_dim)).astype(np.float32))
    ref = np.asarray(vit_forward(params, v, patches, layout))
    out = np.asarray(vit_forward(params, v, patches, layout,
                                 act_quant="int8"))
    assert np.isfinite(out).all()
    # tiny random towers exaggerate per-layer quant noise; this is a
    # mechanism smoke check (the feature is opt-in for that reason)
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(out - ref).mean() / denom < 0.3, (
        np.abs(out - ref).mean() / denom)
