"""Qwen3-Next hybrid judge model (models/qwen3_next.py).

Parity anchors (the reference's judge is Qwen3-Next-80B-A3B served on vLLM,
reference train/serve_llm/serve_qwen3.sh:11-17):
- full-model logits golden vs HF Qwen3NextForCausalLM (torch fallback
  gated-deltanet paths) — pins the chunked delta rule, Neumann triangular
  inverse, gated attention with partial RoPE, zero-centered norms, and the
  shared-expert MoE;
- greedy generate token-exact vs HF generate (prefill + recurrent decode +
  conv-state handoff), with uneven right-padded prompt lengths;
- chunk-size invariance (the chunked rule is exact for any chunking);
- right-padding "pause" semantics == per-row unpadded forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_r2_tpu.models.qwen3_next import (
    Qwen3NextConfig,
    _tri_inverse,
    chunk_gated_delta_rule,
    convert_hf_qwen3_next,
    forward,
    generate,
    recurrent_gated_delta_step,
)


def tiny_next_config(**kw) -> Qwen3NextConfig:
    return Qwen3NextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=8, full_attention_interval=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.25, rope_theta=10000.0,
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=4,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=16,
        shared_expert_intermediate_size=16, norm_topk_prob=True,
        # tiny tests stay on the einsum MoE path; the ragged/GMM kernels
        # have their own parity suites (test_moe_ragged / test_moe_gmm)
        moe_ragged_decode=False, moe_gmm_prefill=False,
        tie_word_embeddings=False, eos_token_id=1, pad_token_id=0,
        dtype="float32",
    ).replace(**kw)


def _build_hf_tiny_next():
    import torch
    from transformers import Qwen3NextConfig as HFConfig
    from transformers import Qwen3NextForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=8, full_attention_interval=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.25, rope_theta=10000.0,
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=4,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=16,
        shared_expert_intermediate_size=16, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=False, rms_norm_eps=1e-6,
        max_position_embeddings=512, attention_bias=False,
    )
    torch.manual_seed(0)
    model = Qwen3NextForCausalLM(hf_cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def hf_next():
    model = _build_hf_tiny_next()
    cfg = tiny_next_config()
    params = convert_hf_qwen3_next(model.state_dict(), cfg, dtype="float32")
    return model, cfg, params


# ------------------------------------------------------------------ kernels


def test_tri_inverse_exact(rng):
    c = 16
    m = jnp.asarray(np.tril(rng.normal(0, 0.5, (3, c, c)), -1),
                    jnp.float32)
    t = _tri_inverse(m)
    prod = t @ (jnp.eye(c) - m)
    np.testing.assert_allclose(np.asarray(prod),
                               np.broadcast_to(np.eye(c), (3, c, c)),
                               atol=1e-4)


def test_chunk_rule_matches_recurrent(rng):
    """The chunked delta rule equals the token-by-token recurrence — both
    outputs and final state — for any chunk size."""
    B, S, H, dk, dv = 2, 21, 3, 8, 8
    q = jnp.asarray(rng.normal(0, 1, (B, S, H, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, S, H, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, S, H, dv)), jnp.float32)
    g = jnp.asarray(-np.abs(rng.normal(0, 0.5, (B, S, H))), jnp.float32)
    beta = jnp.asarray(rng.uniform(0, 1, (B, S, H)), jnp.float32)

    state = jnp.zeros((B, H, dk, dv), jnp.float32)
    outs = []
    for t in range(S):
        o, state = recurrent_gated_delta_step(
            q[:, t], k[:, t], v[:, t], g[:, t], beta[:, t], state)
        outs.append(o)
    ref_out = jnp.stack(outs, 1)

    for chunk in (4, 8, 64):
        out, final = chunk_gated_delta_rule(q, k, v, g, beta,
                                            chunk_size=chunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(final), np.asarray(state),
                                   rtol=2e-4, atol=2e-4)


# ------------------------------------------------------------------- golden


def test_next_golden_forward(hf_next, rng):
    """Full-model logits vs HF Qwen3NextForCausalLM."""
    import torch

    model, cfg, params = hf_next
    B, S = 2, 17
    ids = rng.integers(2, 127, (B, S))
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_next_chunk_size_invariance(hf_next, rng):
    """chunk_size is a performance knob, not a semantics knob."""
    _, cfg, params = hf_next
    ids = jnp.asarray(rng.integers(2, 127, (2, 21)))
    a = np.asarray(forward(params, cfg, ids, chunk_size=64))
    b = np.asarray(forward(params, cfg, ids, chunk_size=8))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_next_right_padding_pause(hf_next, rng):
    """Right-padded batch forward == per-row unpadded forward at valid
    positions (g=0/beta=0 pause masking in the delta rule)."""
    _, cfg, params = hf_next
    S = 19
    lengths = np.array([19, 11], np.int32)
    ids = rng.integers(2, 127, (2, S))
    ids[1, 11:] = 0
    padded = np.asarray(forward(params, cfg, jnp.asarray(ids),
                                lengths=jnp.asarray(lengths), chunk_size=8))
    for b, n in enumerate(lengths):
        solo = np.asarray(forward(params, cfg,
                                  jnp.asarray(ids[b:b + 1, :n])))
        np.testing.assert_allclose(padded[b, :n], solo[0],
                                   rtol=3e-4, atol=3e-4)


def test_next_generate_golden(hf_next, rng):
    """Greedy decode (prefill cache -> recurrent delta rule + conv state +
    KV decode) matches HF generate token-for-token, uneven lengths."""
    import torch

    model, cfg, params = hf_next
    B, S, T = 2, 13, 8
    ids = rng.integers(2, 127, (B, S))
    lengths = np.array([S, S - 5], np.int32)
    padded = ids.copy()
    padded[1, S - 5:] = 0
    with torch.no_grad():
        ref_rows = []
        for b in range(B):
            row = torch.from_numpy(padded[b:b + 1, :lengths[b]])
            out = model.generate(row, max_new_tokens=T, do_sample=False,
                                 eos_token_id=None, pad_token_id=0)
            ref_rows.append(out[0, lengths[b]:].numpy())
    res = generate(params, cfg, padded, lengths, max_new_tokens=T)
    for b in range(B):
        np.testing.assert_array_equal(res[b], ref_rows[b])


def test_next_sharded_generate_token_exact(hf_next, rng):
    """ep x tp sharded greedy generate == single device, token for token
    (the judge deployment: TP=4 paged vLLM in the reference; here GSPMD
    shards from parallel/sharding rules alone)."""
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh
    from video_r2_tpu.parallel.sharding import shard_params

    _, cfg, params = hf_next
    B, S, T = 2, 11, 6
    ids = rng.integers(2, 127, (B, S))
    lengths = np.array([S, S - 4], np.int32)
    ids[1, S - 4:] = 0
    single = generate(params, cfg, ids, lengths, max_new_tokens=T)
    mesh = make_mesh(MeshConfig(ep=2, tp=2, fsdp=2))
    sharded_params = shard_params(params, mesh)
    sharded = generate(sharded_params, cfg, ids, lengths, max_new_tokens=T,
                       mesh=mesh)
    np.testing.assert_array_equal(sharded, single)


def test_next_int8_quantized(hf_next, rng):
    """Weight-only int8 judge: logits stay close to float and greedy
    generate runs end to end (capacity feature — an 80B judge does not fit
    unquantized)."""
    from video_r2_tpu.models.qwen3_next import quantize_qwen3_next_params

    _, cfg, params = hf_next
    qparams = quantize_qwen3_next_params(params)
    assert qparams["groups"]["lin"]["qkvz"]["kernel_q"].dtype == np.int8
    assert qparams["groups"]["full"]["q"]["kernel_q"].dtype == np.int8
    assert qparams["groups"]["lin"]["experts"]["gate"]["kernel_q"].dtype == np.int8
    assert "kernel" in qparams["groups"]["lin"]["ba"]  # routing-adjacent: float
    ids = rng.integers(2, 127, (2, 13))
    ref = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    q = np.asarray(forward(qparams, cfg, jnp.asarray(ids)))
    # int8 weight error at tiny dims: loose but meaningful bound
    assert np.mean(np.abs(q - ref)) < 0.05 * (np.mean(np.abs(ref)) + 1.0)
    out = generate(qparams, cfg, ids, np.array([13, 13], np.int32),
                   max_new_tokens=4)
    assert out.shape == (2, 4)


def test_next_chat_engine_judge(hf_next):
    """ChatEngine hosts a Qwen3-Next config (batch mode) and EngineJudge
    batches through it — the reference's judge deployment shape."""
    import pytest as _pytest

    from video_r2_tpu.engine.chat import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine
    from video_r2_tpu.rewards.judge import EngineJudge

    _, cfg, params = hf_next
    cfg = cfg.replace(vocab_size=128, eos_token_id=1, pad_token_id=0)
    eng = ChatEngine(params, cfg, ByteTokenizer(specials={
        "<|im_start|>": 2, "<|im_end|>": 1, "<|endoftext|>": 0}),
        max_new_tokens=6)
    judge = EngineJudge(eng, max_tokens=6)
    outs = judge.chat_many([("sys", "judge this"), ("sys", "and this")])
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
    with _pytest.raises(ValueError, match="paged"):
        ChatEngine(params, cfg, ByteTokenizer(), continuous=True,
                   engine_kind="paged")
    # kv_quant in BATCH mode is supported since r5 (int8 KV strips for the
    # full-attention layers); the slot engine's contiguous cache stays
    # bf16-only, exactly like the transformer slot engine's
    with _pytest.raises(ValueError, match="kv_quant"):
        ChatEngine(params, cfg, ByteTokenizer(), continuous=True,
                   kv_quant="int8")


def test_next_spec_decode_token_exact(hf_next, rng):
    """Greedy speculative decode == plain greedy, token for token, for
    BOTH a self-repetitive prompt (high n-gram acceptance) and a random
    prompt (near-zero acceptance) — correctness must be
    acceptance-agnostic. Also pins the EOS cut."""
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import generate_packed, generate_spec

    _, cfg, params = hf_next
    S, T = 16, 10
    rep = np.tile(rng.integers(2, 127, 4), 8)[:S]     # abcd abcd ...
    rnd = rng.integers(2, 127, S)
    ids = np.stack([rep, rnd])
    lengths = np.array([S, S - 5], np.int32)
    ids[1, S - 5:] = 0
    for eos_ids in ((), tuple(int(t) for t in np.unique(rnd[:3]))):
        sp = SamplingParams(max_new_tokens=T, eos_token_ids=eos_ids,
                            pad_token_id=0)
        plain = generate_packed(params, cfg, ids, lengths, sp)
        for k in (3, 8):
            spec = generate_spec(params, cfg, ids, lengths, sp, spec_k=k)
            np.testing.assert_array_equal(spec.lengths, plain.lengths)
            for b in range(2):
                n = plain.lengths[b]
                np.testing.assert_array_equal(spec.sequences[b, :n],
                                              plain.sequences[b, :n])


def test_next_flash_prefill_parity(hf_next, rng):
    """attn_impl="flash" (the 32k-context judge prefill path — dense
    scores OOM there) matches the XLA dense path at valid positions, and
    greedy generate is token-exact across impls."""
    from video_r2_tpu.models.qwen3_next import generate_packed
    from video_r2_tpu.engine.sampling import SamplingParams

    _, cfg, params = hf_next
    fcfg = cfg.replace(attn_impl="flash")
    S = 24
    lengths = np.array([24, 15], np.int32)
    ids = rng.integers(2, 127, (2, S))
    ids[1, 15:] = 0
    xla = np.asarray(forward(params, cfg, jnp.asarray(ids),
                             lengths=jnp.asarray(lengths)))
    fl = np.asarray(forward(params, fcfg, jnp.asarray(ids),
                            lengths=jnp.asarray(lengths)))
    for b, n in enumerate(lengths):   # pad rows differ by design (masked)
        np.testing.assert_allclose(fl[b, :n], xla[b, :n],
                                   rtol=2e-4, atol=2e-4)
    sp = SamplingParams(max_new_tokens=6)
    a = generate_packed(params, cfg, ids, lengths, sp)
    b = generate_packed(params, fcfg, ids, lengths, sp)
    np.testing.assert_array_equal(a.sequences, b.sequences)


def test_next_spec_sampled_near_zero_temp(hf_next, rng):
    """Sampled spec at temperature ~0 collapses to greedy (acceptance
    probabilities hit {0,1} and categorical becomes argmax)."""
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import generate_packed, generate_spec

    _, cfg, params = hf_next
    S, T = 16, 8
    ids = np.tile(rng.integers(2, 127, 4), 8)[None, :S].repeat(2, axis=0)
    lengths = np.array([S, S], np.int32)
    greedy = generate_packed(params, cfg, ids, lengths,
                             SamplingParams(max_new_tokens=T))
    sampled = generate_spec(params, cfg, ids, lengths,
                            SamplingParams(do_sample=True, temperature=1e-6,
                                           max_new_tokens=T), spec_k=4)
    np.testing.assert_array_equal(sampled.sequences, greedy.sequences)


def test_next_spec_sampled_matches_plain_distribution(hf_next, rng):
    """Rejection-sampling spec samples the SAME distribution as the plain
    loop: per-position marginals over many parallel rows agree within the
    plain-vs-plain noise floor (the repo's standard TV-distance check)."""
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import generate_packed, generate_spec

    _, cfg, params = hf_next
    B, T = 512, 3
    row = np.tile(rng.integers(2, 127, 5), 4)[:18]
    ids = np.tile(row[None, :], (B, 1))
    lens = np.full((B,), 18, np.int32)
    sp = SamplingParams(do_sample=True, temperature=0.8, top_k=8,
                        max_new_tokens=T)
    plain = generate_packed(params, cfg, ids, lens, sp, seed=11).sequences
    plain2 = generate_packed(params, cfg, ids, lens, sp, seed=77).sequences
    spec = generate_spec(params, cfg, ids, lens, sp, seed=23,
                         spec_k=3).sequences

    def tv(a, b, t):
        vals = np.union1d(a[:, t], b[:, t])
        pa = np.array([(a[:, t] == v).mean() for v in vals])
        pb = np.array([(b[:, t] == v).mean() for v in vals])
        return 0.5 * np.abs(pa - pb).sum()

    for t in range(T):
        floor = tv(plain, plain2, t)
        dev = tv(spec, plain, t)
        assert dev < floor + 0.08, (t, dev, floor)
    assert len(np.unique(plain[:, 0])) >= 3


def test_next_large_batch_decode_gmm(rng):
    """cfg.moe_gmm_decode (OPT-IN — see its r5 kernel-fault note): decode
    steps with T = B > RAGGED_MAX_TOKENS (judge bursts, spec verify
    windows) route through the sorted GMM instead of the E x-oversized
    exact einsum. Token-exact vs the einsum path, spec included."""
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import (generate_packed,
                                                generate_spec,
                                                init_qwen3_next_params)

    # this test compiles several LARGE interpret-mode GMM decode scans —
    # bound the process's live executables first (the CPU backend
    # segfaults after many hundreds of compiles, CLAUDE.md r3; the
    # module-scoped conftest clear is not enough once this test joined
    # the file)
    jax.clear_caches()
    cfg_e = tiny_next_config()
    cfg_g = tiny_next_config(moe_gmm_prefill=True, moe_gmm_decode=True)
    params = init_qwen3_next_params(cfg_e, seed=0)
    B, S, T = 36, 16, 4    # decode steps carry 36 tokens (> 32)
    ids = rng.integers(2, 127, (B, S))
    lens = np.full((B,), S, np.int32)
    sp = SamplingParams(max_new_tokens=T, eos_token_ids=(), pad_token_id=0)
    a = generate_packed(params, cfg_e, ids, lens, sp).sequences
    b = generate_packed(params, cfg_g, ids, lens, sp).sequences
    np.testing.assert_array_equal(a, b)
    # spec verify windows: B=7 x W=5 = 35 rows also take the GMM path
    c = generate_spec(params, cfg_g, ids[:7], lens[:7], sp,
                      spec_k=4).sequences
    d = generate_packed(params, cfg_g, ids[:7], lens[:7], sp).sequences
    np.testing.assert_array_equal(c, d)
    jax.clear_caches()


def test_next_kv_quant_int8(hf_next, rng):
    """cfg.kv_quant="int8": the 12/48 full-attention layers' KV strips
    store int8 with factored per-token/head scales (VERDICT r4 #7 — the
    32k-context judge KV halves). Contract mirrors the transformer
    engines' (test_engine.test_kv_quant_and_chunked_prefill): the first
    generated token comes from the full-precision prefill attention and
    must match bf16 exactly; spec decode over the int8 cache is
    token-exact vs the plain int8 loop; sharded int8 == single-device
    int8."""
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import (QuantNextCache,
                                                generate_packed,
                                                generate_spec, prefill)
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh
    from video_r2_tpu.parallel.sharding import shard_params

    _, cfg, params = hf_next
    qcfg = cfg.replace(kv_quant="int8")
    T = 8
    base = rng.integers(2, 127, 5).tolist()
    ids = np.asarray([base * 3 + [3], (base * 4)[:16]], np.int32)
    lens = np.array([16, 16], np.int32)
    sp = SamplingParams(max_new_tokens=T, eos_token_ids=(), pad_token_id=0)

    _, cache = prefill(params, qcfg, jnp.asarray(ids), jnp.asarray(lens), 32)
    assert isinstance(cache, QuantNextCache)
    assert cache.k.dtype == jnp.int8 and cache.k_scale.shape == (
        cfg.num_groups, 2, 32, cfg.num_key_value_heads)

    fp = generate_packed(params, cfg, ids, lens, sp)
    q = generate_packed(params, qcfg, ids, lens, sp)
    np.testing.assert_array_equal(fp.sequences[:, 0], q.sequences[:, 0])
    spec = generate_spec(params, qcfg, ids, lens, sp, spec_k=4)
    np.testing.assert_array_equal(spec.sequences, q.sequences)
    mesh = make_mesh(MeshConfig(ep=2, tp=2, fsdp=2))
    q_m = generate_packed(shard_params(params, mesh), qcfg, ids, lens, sp,
                          mesh=mesh)
    np.testing.assert_array_equal(q_m.sequences, q.sequences)


def test_next_act_quant_w8a8(hf_next, rng):
    """cfg.act_quant="int8" over int8 weight leaves: W8A8 prefill linears
    (integer MXU). The quantized-activation forward must track the
    weight-only int8 forward closely AND actually differ from it (the
    branch engaged); float weights no-op."""
    from video_r2_tpu.models.qwen3_next import (forward,
                                                quantize_qwen3_next_params)

    _, cfg, params = hf_next
    qparams = quantize_qwen3_next_params(params, bits=8)
    ids = jnp.asarray(rng.integers(2, 127, (2, 12)), jnp.int32)
    wo = np.asarray(forward(qparams, cfg, ids))
    w8a8 = np.asarray(forward(qparams, cfg.replace(act_quant="int8"), ids))
    assert not np.array_equal(wo, w8a8), "W8A8 path did not engage"
    scale = np.abs(wo).max()
    np.testing.assert_allclose(w8a8, wo, atol=0.05 * scale)
    # float weights: act_quant is a no-op (linear ignores it)
    fp = np.asarray(forward(params, cfg, ids))
    fp_aq = np.asarray(forward(params, cfg.replace(act_quant="int8"), ids))
    np.testing.assert_array_equal(fp, fp_aq)


def test_next_chat_engine_kv_quant(hf_next):
    """ChatEngine(kv_quant="int8"[, spec_decode]) serves the Next family in
    batch mode — the guard is gone; spec+int8 matches plain int8 text for
    text; the prefix store is bypassed (bf16-only continue path)."""
    from video_r2_tpu.engine.chat import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine

    _, cfg, params = hf_next
    cfg = cfg.replace(eos_token_id=1, pad_token_id=0)
    mk = lambda **kw: ChatEngine(params, cfg, ByteTokenizer(specials={
        "<|im_start|>": 2, "<|im_end|>": 1, "<|endoftext|>": 0}),
        max_new_tokens=6, **kw)
    msgs = [[{"role": "user", "content": f"judge {i} judge {i}"}]
            for i in range(2)]
    plain_q = mk(kv_quant="int8", prefix_cache=False)
    spec_q = mk(kv_quant="int8", spec_decode=3, prefix_cache=False)
    a = plain_q.chat_batch(msgs, temperature=0.0, max_tokens=6)
    b = spec_q.chat_batch(msgs, temperature=0.0, max_tokens=6)
    assert a == b
    # the PREFIX STORE composes with kv_quant: the bf16 prefix/continue
    # chain quantizes at the packed path's boundary — token-exact vs it
    from video_r2_tpu.models.qwen3_next import NextPrefixStore

    store_q = mk(kv_quant="int8")
    assert store_q._prefix_store is not None
    # tiny test prompts share a short chat-template prefix — drop the
    # store's thresholds so the reuse path actually engages
    store_q._prefix_store = NextPrefixStore(min_prefix=8, bucket=8)
    c = store_q.chat_batch(msgs, temperature=0.0, max_tokens=6)
    assert c == a
    assert store_q._prefix_store.misses > 0
    aq = mk(act_quant="int8")   # guard gone; float weights -> no-op
    assert aq.chat_batch(msgs, temperature=0.0, max_tokens=6) == \
        mk().chat_batch(msgs, temperature=0.0, max_tokens=6)


def test_next_checkpoint_load(hf_next, rng, tmp_path):
    """save_pretrained safetensors dir -> load_qwen3_next_checkpoint
    (consume + quantize-on-load paths) == direct state-dict conversion.
    MULTI-SHARD: the load streams tensors one at a time (LazyStateDict) —
    the judge checkpoint is an 80B across many shards and must never
    materialize as a full host state dict; an mtp.* extra head in a shard
    is skipped like HF's _keys_to_ignore_on_load_unexpected."""
    from safetensors.numpy import save_file

    from video_r2_tpu.models.loader import LazyStateDict
    from video_r2_tpu.models.qwen3_next import load_qwen3_next_checkpoint

    model, cfg, params = hf_next
    model.save_pretrained(tmp_path, safe_serialization=True,
                          max_shard_size="200KB")
    shards = sorted(tmp_path.glob("*.safetensors"))
    assert len(shards) > 1, "test must exercise the multi-shard path"
    # an extra head the load must ignore
    save_file({"mtp.head.weight": np.zeros((4, 4), np.float32)},
              str(tmp_path / "zz-extra.safetensors"))

    # the lazy view materializes on demand and forgets on pop — this is
    # what bounds peak host RSS at ~one converted tree for the 80B
    lazy = LazyStateDict(sorted(tmp_path.glob("*.safetensors")),
                         skip_prefixes=("mtp.",))
    assert all(not k.startswith("mtp.") for k in lazy.keys())
    n0 = len(lazy)
    first = next(iter(lazy.keys()))
    t = lazy.pop(first)
    assert isinstance(t, np.ndarray) and len(lazy) == n0 - 1

    loaded = load_qwen3_next_checkpoint(tmp_path, cfg, dtype="float32")
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    qloaded = load_qwen3_next_checkpoint(tmp_path, cfg, dtype="float32",
                                         quantize="int8")
    assert qloaded["groups"]["lin"]["qkvz"]["kernel_q"].dtype == np.int8
    ids = rng.integers(2, 127, (1, 7))
    out = generate(qloaded, cfg, ids, np.array([7], np.int32),
                   max_new_tokens=3)
    assert out.shape == (1, 3)


def test_next_checkpoint_load_sharded(hf_next, rng, tmp_path):
    """load_qwen3_next_checkpoint(mesh=...) == unsharded load, leaf for
    leaf, with every leaf placed by the parallel/sharding rules (the 80B
    judge loads straight into its TP=4 layout, serve_qwen3.sh:13)."""
    from video_r2_tpu.models.qwen3_next import load_qwen3_next_checkpoint
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    model, cfg, params = hf_next
    model.save_pretrained(tmp_path, safe_serialization=True,
                          max_shard_size="200KB")
    mesh = make_mesh(MeshConfig(ep=2, tp=2, fsdp=2))
    sharded = load_qwen3_next_checkpoint(tmp_path, cfg, dtype="float32",
                                         mesh=mesh)
    flat_s = jax.tree.leaves(sharded)
    assert any(len(x.sharding.device_set) > 1 for x in flat_s)
    for a, b in zip(flat_s, jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_next_continuous_engine_parity(hf_next, rng):
    """Slot-continuous decode == batch generate_packed, token for token,
    with uneven prompt lengths and a mid-stream admission."""
    from video_r2_tpu.engine.next_continuous import Qwen3NextContinuousEngine
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import generate_packed

    _, cfg, params = hf_next
    T = 6
    prompts = [rng.integers(2, 127, n).tolist() for n in (9, 14, 5)]
    sp = SamplingParams(max_new_tokens=T, eos_token_ids=(), pad_token_id=0)

    def ref(p):
        ids = np.asarray(p, np.int32)[None]
        return generate_packed(params, cfg, ids,
                               np.array([len(p)], np.int32),
                               sp).sequences[0].tolist()

    eng = Qwen3NextContinuousEngine(params, cfg, num_slots=2, max_len=64,
                                    sp=sp, prompt_buckets=(16, 32))
    r0 = eng.submit(prompts[0], T)
    r1 = eng.submit(prompts[1], T)
    assert eng.submit(prompts[2], T) is None   # pool full
    done = {}
    mid_submitted = False
    while eng.num_active or not mid_submitted:
        for rid, toks in eng.step():
            done[rid] = toks
        if not mid_submitted and len(done) >= 1:
            done_rid = next(iter(done))
            r2 = eng.submit(prompts[2], T)     # mid-stream admission
            assert r2 is not None
            mid_submitted = True
    assert done[r0] == ref(prompts[0])
    assert done[r1] == ref(prompts[1])
    assert done[r2] == ref(prompts[2])
    assert done_rid in (r0, r1)


def _drive_next_continuous(params, cfg, prompts, sp, T, mesh=None,
                           spec_decode=0, steps=1):
    """Admit prompts[0:2], run to first finish, admit prompts[2] mid-stream
    (the continuous-batching acid test), drain. Returns (ordered outputs,
    spec_stats)."""
    from video_r2_tpu.engine.next_continuous import Qwen3NextContinuousEngine

    eng = Qwen3NextContinuousEngine(params, cfg, num_slots=2, max_len=64,
                                    sp=sp, prompt_buckets=(16, 32),
                                    mesh=mesh, spec_decode=spec_decode)
    r0 = eng.submit(prompts[0], T)
    r1 = eng.submit(prompts[1], T)
    done = {}
    mid = False
    while eng.num_active or not mid:
        for rid, toks in eng.step(steps):
            done[rid] = toks
        if not mid and len(done) >= 1:
            r2 = eng.submit(prompts[2], T)
            assert r2 is not None
            mid = True
    return [done[r] for r in (r0, r1, r2)], eng.spec_stats


def test_next_continuous_mesh_parity(hf_next, rng):
    """The actual judge deployment shape (reference serve_qwen3.sh:11-17:
    Qwen3-Next continuous batching at TP=4): slot-continuous serving under
    an ep x tp x fsdp mesh == single-device batch generate, token for
    token, including a mid-stream admission. The hybrid cache lives in the
    judge-scale layout (KV strips + DeltaNet value heads on "tp",
    parallel/sharding.next_cache_shardings)."""
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import generate_packed
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    _, cfg, params = hf_next
    T = 6
    prompts = [rng.integers(2, 127, n).tolist() for n in (9, 14, 5)]
    sp = SamplingParams(max_new_tokens=T, eos_token_ids=(), pad_token_id=0)
    refs = [generate_packed(params, cfg, np.asarray(p, np.int32)[None],
                            np.array([len(p)], np.int32), sp
                            ).sequences[0].tolist() for p in prompts]
    mesh = make_mesh(MeshConfig(ep=2, tp=2, fsdp=2))
    outs, _ = _drive_next_continuous(params, cfg, prompts, sp, T, mesh=mesh)
    assert outs == refs


def test_next_continuous_spec_parity(hf_next, rng):
    """Speculative decoding in the Next slot engine (per-slot n-gram
    drafting + the recurrent-state-aware verify/commit split): token-exact
    vs plain batch greedy, single-device AND under the mesh, with real
    draft acceptance on repetitive prompts and a mid-stream admission."""
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import generate_packed
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    _, cfg, params = hf_next
    T = 8
    base = rng.integers(2, 127, 6).tolist()
    prompts = [base * 3, rng.integers(2, 127, 14).tolist(), base * 2]
    sp = SamplingParams(max_new_tokens=T, eos_token_ids=(), pad_token_id=0)
    refs = [generate_packed(params, cfg, np.asarray(p, np.int32)[None],
                            np.array([len(p)], np.int32), sp
                            ).sequences[0].tolist() for p in prompts]
    outs, stats = _drive_next_continuous(params, cfg, prompts, sp, T,
                                         spec_decode=4)
    assert outs == refs
    # drafting must actually accept on the repetitive prompts, or spec is
    # just a slower plain loop
    assert stats["spec_tokens"] > stats["spec_rounds"], stats
    mesh = make_mesh(MeshConfig(ep=2, tp=2, fsdp=2))
    outs_m, stats_m = _drive_next_continuous(params, cfg, prompts, sp, T,
                                             mesh=mesh, spec_decode=4)
    assert outs_m == refs
    assert stats_m["spec_tokens"] > stats_m["spec_rounds"], stats_m


def test_next_continuous_spec_mixed_pool(hf_next, rng):
    """A greedy slot and a temp~0 sampled slot speculate TOGETHER in one
    pool; both match the plain greedy reference (sampled acceptance
    probabilities collapse to {0,1} at temp 1e-6). Multi-round dispatch
    (steps=2) exercises the in-jit round scan."""
    from video_r2_tpu.engine.next_continuous import Qwen3NextContinuousEngine
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import generate_packed

    _, cfg, params = hf_next
    T = 8
    base = rng.integers(2, 127, 5).tolist()
    prompts = [base * 3, base * 2]
    greedy_sp = SamplingParams(max_new_tokens=T, eos_token_ids=(),
                               pad_token_id=0)
    sampled_sp = SamplingParams(do_sample=True, temperature=1e-6,
                                max_new_tokens=T, eos_token_ids=(),
                                pad_token_id=0)
    refs = [generate_packed(params, cfg, np.asarray(p, np.int32)[None],
                            np.array([len(p)], np.int32), greedy_sp
                            ).sequences[0].tolist() for p in prompts]
    eng = Qwen3NextContinuousEngine(params, cfg, num_slots=2, max_len=64,
                                    sp=greedy_sp, prompt_buckets=(16, 32),
                                    spec_decode=4)
    r0 = eng.submit(prompts[0], T, sp=greedy_sp)
    r1 = eng.submit(prompts[1], T, sp=sampled_sp)
    done = {}
    while eng.num_active:
        for rid, toks in eng.step(2):
            done[rid] = toks
    assert done[r0] == refs[0]
    assert done[r1] == refs[1]


def test_next_continuous_chunked_prefill(hf_next, rng):
    """prefill_chunk_tokens: a long prompt prefills one chunk per step(),
    interleaved with decode — token-exact vs batch generate, for the plain
    AND speculative engines (the B=1 accumulator cache commits through the
    pause-masked DeltaNet state math, so partial last chunks stay exact).
    The short prompt admitted first keeps decoding while the long one
    prefills (its tokens must be identical to an un-chunked run)."""
    from video_r2_tpu.engine.next_continuous import Qwen3NextContinuousEngine
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import generate_packed

    _, cfg, params = hf_next
    T = 6
    short = rng.integers(2, 127, 7).tolist()
    long_p = rng.integers(2, 127, 27).tolist()   # 4 chunks of 8, partial tail
    sp = SamplingParams(max_new_tokens=T, eos_token_ids=(), pad_token_id=0)

    def ref(p):
        return generate_packed(params, cfg, np.asarray(p, np.int32)[None],
                               np.array([len(p)], np.int32), sp
                               ).sequences[0].tolist()

    for spec in (0, 3):
        eng = Qwen3NextContinuousEngine(
            params, cfg, num_slots=2, max_len=64, sp=sp,
            prompt_buckets=(8, 32), prefill_chunk_tokens=8, spec_decode=spec)
        r0 = eng.submit(short, T)       # admits immediately (<= one chunk)
        r1 = eng.submit(long_p, T)      # chunked: 4 step() calls to admit
        assert eng.prefilling[1]
        done = {}
        while eng.num_active:
            for rid, toks in eng.step():
                done[rid] = toks
        assert done[r0] == ref(short), f"spec={spec}"
        assert done[r1] == ref(long_p), f"spec={spec}"


def test_next_chat_engine_continuous(hf_next):
    """ChatEngine(continuous=True) serves Qwen3-Next through the shared
    run loop (concurrent chats, per-request sampling, EOS handling)."""
    from concurrent.futures import ThreadPoolExecutor

    from video_r2_tpu.engine.chat import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine

    _, cfg, params = hf_next
    cfg = cfg.replace(eos_token_id=1, pad_token_id=0)
    eng = ChatEngine(params, cfg, ByteTokenizer(specials={
        "<|im_start|>": 2, "<|im_end|>": 1, "<|endoftext|>": 0}),
        max_new_tokens=5, continuous=True, num_slots=2, max_len=64)
    try:
        msgs = [[{"role": "user", "content": f"judge {i}"}]
                for i in range(4)]
        with ThreadPoolExecutor(max_workers=4) as ex:
            outs = list(ex.map(
                lambda m: eng.chat(m, temperature=0.0, max_tokens=5), msgs))
        assert len(outs) == 4 and all(isinstance(o, str) for o in outs)
        # determinism across the concurrent pool: same prompt -> same text
        again = eng.chat(msgs[0], temperature=0.0, max_tokens=5)
        assert again == outs[0]
    finally:
        eng.shutdown()


def test_next_chat_engine_continuous_mesh(hf_next):
    """ChatEngine(continuous=True, mesh=...) hosts the Qwen3-Next slot
    engine sharded — the reference's judge deployment (vLLM continuous
    batching at TP, serve_qwen3.sh) behind the same OpenAI surface — with
    spec decode on, and stats exposing the mesh + spec counters."""
    from concurrent.futures import ThreadPoolExecutor

    from video_r2_tpu.engine.chat import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh

    _, cfg, params = hf_next
    cfg = cfg.replace(eos_token_id=1, pad_token_id=0)
    mesh = make_mesh(MeshConfig(ep=2, tp=2, fsdp=2))
    ref_eng = ChatEngine(params, cfg, ByteTokenizer(specials={
        "<|im_start|>": 2, "<|im_end|>": 1, "<|endoftext|>": 0}),
        max_new_tokens=5, prefix_cache=False)
    eng = ChatEngine(params, cfg, ByteTokenizer(specials={
        "<|im_start|>": 2, "<|im_end|>": 1, "<|endoftext|>": 0}),
        max_new_tokens=5, continuous=True, num_slots=2, max_len=64,
        mesh=mesh, spec_decode=3)
    try:
        msgs = [[{"role": "user", "content": f"judge {i}"}]
                for i in range(3)]
        with ThreadPoolExecutor(max_workers=3) as ex:
            outs = list(ex.map(
                lambda m: eng.chat(m, temperature=0.0, max_tokens=5), msgs))
        # sharded continuous == single-device batch, text for text
        for m, o in zip(msgs, outs):
            assert o == ref_eng.chat(m, temperature=0.0, max_tokens=5)
        s = eng.stats()
        assert {k: v for k, v in s["mesh"].items() if v > 1} == {
            "ep": 2, "tp": 2, "fsdp": 2}
        assert s["spec_stats"]["spec_dispatches"] > 0
    finally:
        eng.shutdown()


def test_next_prefix_reuse_parity(hf_next, rng):
    """Shared-prefix burst generation (prefix prefilled once, suffixes
    continued from its state) == whole-prompt generation, token for token,
    greedy AND sampled (same seed, same rng consumption); second burst
    hits the store."""
    from video_r2_tpu.engine.chat import pack_prompts
    from video_r2_tpu.engine.sampling import SamplingParams
    from video_r2_tpu.models.qwen3_next import (NextPrefixStore,
                                                generate_packed)

    _, cfg, params = hf_next
    prefix = rng.integers(2, 127, 64).tolist()
    suffixes = [rng.integers(2, 127, n).tolist() for n in (7, 12, 3)]
    full = [prefix + s for s in suffixes]
    store = NextPrefixStore(min_prefix=64, bucket=64)
    assert store.split(full) == 64
    for sp in (SamplingParams(max_new_tokens=6),
               SamplingParams(do_sample=True, temperature=0.8, top_k=8,
                              max_new_tokens=6)):
        packed = pack_prompts(full, pad_id=0)
        ref = generate_packed(params, cfg, packed.input_ids, packed.lengths,
                              sp, seed=5)
        got = store.generate(params, cfg, full, sp, seed=5)
        np.testing.assert_array_equal(got.sequences, ref.sequences)
        np.testing.assert_array_equal(got.lengths, ref.lengths)
    assert store.misses == 1 and store.hits == 1
    # spec + prefix compose: greedy token-exact vs the whole-prompt path
    sp = SamplingParams(max_new_tokens=6)
    packed = pack_prompts(full, pad_id=0)
    ref = generate_packed(params, cfg, packed.input_ids, packed.lengths,
                          sp, seed=5)
    got = store.generate(params, cfg, full, sp, seed=5, spec_k=4)
    np.testing.assert_array_equal(got.sequences, ref.sequences)
    # no usable common prefix -> exact fallback to the packed path
    mixed = [rng.integers(2, 127, 20).tolist() for _ in range(2)]
    packed = pack_prompts(mixed, pad_id=0)
    sp = SamplingParams(max_new_tokens=4)
    ref = generate_packed(params, cfg, packed.input_ids, packed.lengths,
                          sp, seed=1)
    got = store.generate(params, cfg, mixed, sp, seed=1)
    np.testing.assert_array_equal(got.sequences, ref.sequences)


def test_next_chat_engine_prefix_cache(hf_next):
    """ChatEngine judge bursts with a shared system prompt produce the
    same text with the prefix store on and off, and the store reports
    hits on repeat bursts."""
    from video_r2_tpu.engine.chat import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine

    _, cfg, params = hf_next
    cfg = cfg.replace(eos_token_id=1, pad_token_id=0)
    tok = ByteTokenizer(specials={"<|im_start|>": 2, "<|im_end|>": 1,
                                  "<|endoftext|>": 0})
    system = "You are a strict video-QA judge. " * 4   # long shared prefix
    msgs = [[{"role": "system", "content": system},
             {"role": "user", "content": f"rate answer {i}"}]
            for i in range(3)]
    on = ChatEngine(params, cfg, tok, max_new_tokens=5)
    off = ChatEngine(params, cfg, tok, max_new_tokens=5,
                     prefix_cache=False)
    assert on.chat_batch(msgs) == off.chat_batch(msgs)
    on.chat_batch(msgs)
    assert on.stats()["prefix_cache_hits"] >= 1


def test_next_golden_gradients(hf_next, rng):
    """jax.grad through the whole hybrid stack (chunked delta rule, conv,
    gated norms, MoE + shared expert) matches HF torch autograd — the
    trainability anchor."""
    import torch

    from video_r2_tpu.models.qwen3_next import next_loss

    model, cfg, params = hf_next
    B, S = 2, 15
    ids = rng.integers(2, 127, (B, S))
    labels = ids.copy()
    labels[:, :3] = -100   # ignore a prefix (masked-token path)

    tids = torch.from_numpy(ids)
    tl = torch.from_numpy(labels.astype(np.int64))
    out = model(input_ids=tids)
    logits = out.logits[:, :-1].reshape(-1, 128).float()
    tgt = tl[:, 1:].reshape(-1)
    tloss = torch.nn.functional.cross_entropy(logits, tgt,
                                              ignore_index=-100)
    model.zero_grad()
    tloss.backward()

    # our loss predicts labels at the SAME position (the caller shifts)
    shifted = np.full_like(labels, -100)
    shifted[:, :-1] = labels[:, 1:]
    loss, grads = jax.value_and_grad(next_loss)(
        params, cfg, jnp.asarray(ids), jnp.asarray(shifted))
    np.testing.assert_allclose(float(loss), float(tloss), rtol=2e-4)

    sd_grads = {k: v.grad for k, v in model.named_parameters()
                if v.grad is not None}

    def t(name, transpose=False):
        g = sd_grads[name].numpy()
        return g.T if transpose else g

    # spot-check leaves across every module family (layer 0 = groups.lin
    # sublayer 0; layer 3 = groups.full group 0)
    checks = [
        (grads["groups"]["lin"]["qkvz"]["kernel"][0, 0],
         t("model.layers.0.linear_attn.in_proj_qkvz.weight", True)),
        (grads["groups"]["lin"]["A_log"][0, 0],
         t("model.layers.0.linear_attn.A_log")),
        (grads["groups"]["lin"]["dt_bias"][0, 0],
         t("model.layers.0.linear_attn.dt_bias")),
        (grads["groups"]["lin"]["conv"][0, 0],
         t("model.layers.0.linear_attn.conv1d.weight")[:, 0, :]),
        (grads["groups"]["full"]["q"]["kernel"][0],
         t("model.layers.3.self_attn.q_proj.weight", True)),
        (grads["groups"]["full"]["q_norm"][0],
         t("model.layers.3.self_attn.q_norm.weight")),
        (grads["groups"]["lin"]["router"]["kernel"][0, 0],
         t("model.layers.0.mlp.gate.weight", True)),
        (grads["groups"]["lin"]["experts"]["gate"]["kernel"][0, 0, 2],
         t("model.layers.0.mlp.experts.2.gate_proj.weight", True)),
        (grads["groups"]["lin"]["shared_gate"]["kernel"][0, 0],
         t("model.layers.0.mlp.shared_expert_gate.weight", True)),
        (grads["final_norm"], t("model.norm.weight")),
        (grads["lm_head"]["kernel"], t("lm_head.weight", True)),
    ]
    for ours, ref in checks:
        np.testing.assert_allclose(np.asarray(ours), ref,
                                   rtol=5e-3, atol=2e-5)


def test_next_lora_sft_step(hf_next, rng):
    """LoRA SFT over the hybrid judge: adapters-only training step runs
    and overfits a tiny batch (loss strictly decreases)."""
    import optax

    from video_r2_tpu.models.qwen3_next import (NEXT_LORA_TARGETS,
                                                make_next_lora_sft_step)
    from video_r2_tpu.train.lora import LoRAConfig, LoRATrainState, init_lora

    _, cfg, params = hf_next
    lcfg = LoRAConfig(r=4, alpha=8, targets=NEXT_LORA_TARGETS)
    lora = init_lora(params, lcfg, seed=0)
    assert "a" in lora["groups"]["lin"]["qkvz"]["kernel"]
    opt = optax.adam(5e-3)
    step = make_next_lora_sft_step(params, cfg, lcfg, opt, donate=False)
    state = LoRATrainState(lora, opt.init(lora), 0)
    ids = rng.integers(2, 127, (2, 12))
    labels = np.full_like(ids, -100)
    labels[:, :-1] = ids[:, 1:]
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)}
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_next_sharded_loss_and_grads(hf_next, rng):
    """next_loss and its gradients under an ep x tp x fsdp mesh == single
    device (GSPMD from the param annotations; training-side certification
    of the sharding rules)."""
    from video_r2_tpu.models.qwen3_next import next_loss
    from video_r2_tpu.parallel.mesh import MeshConfig, make_mesh
    from video_r2_tpu.parallel.sharding import shard_params

    _, cfg, params = hf_next
    ids = rng.integers(2, 127, (2, 12))
    labels = np.full_like(ids, -100)
    labels[:, :-1] = ids[:, 1:]
    args = (jnp.asarray(ids), jnp.asarray(labels))
    loss1, g1 = jax.value_and_grad(next_loss, argnums=0)(params, cfg, *args)
    mesh = make_mesh(MeshConfig(ep=2, tp=2, fsdp=2))
    sparams = shard_params(params, mesh)
    loss2, g2 = jax.jit(
        jax.value_and_grad(next_loss, argnums=0),
        static_argnums=(1,))(sparams, cfg, *args)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_next_int4_quantized(hf_next, rng):
    """bits=4 weight-only (group-128 packed nibbles where K permits,
    int8 elsewhere): finite logits, generate runs."""
    from video_r2_tpu.models.qwen3_next import quantize_qwen3_next_params

    _, cfg, params = hf_next
    q = quantize_qwen3_next_params(params, bits=4)
    # tiny dims (H=32 < 256) can't group-128: falls back to int8 everywhere
    assert "kernel_q" in q["groups"]["lin"]["qkvz"]
    ids = rng.integers(2, 127, (1, 9))
    out = np.asarray(forward(q, cfg, jnp.asarray(ids)))
    assert np.isfinite(out).all()


def test_next_http_server_smoke(hf_next):
    """OpenAI server end-to-end over a Qwen3-Next engine: POST
    /v1/chat/completions (batch mode) + GET /metrics shows the prefix
    store counters."""
    import json
    import urllib.request

    from video_r2_tpu.engine.chat import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine, serve

    _, cfg, params = hf_next
    cfg = cfg.replace(eos_token_id=1, pad_token_id=0)
    eng = ChatEngine(params, cfg, ByteTokenizer(specials={
        "<|im_start|>": 2, "<|im_end|>": 1, "<|endoftext|>": 0}),
        max_new_tokens=4)
    srv = serve(eng, port=0, background=True)
    port = srv.server_address[1]
    try:
        body = json.dumps({
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["message"]["role"] == "assistant"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
            metrics = json.loads(r.read())
        assert "prefix_cache_hits" in metrics
    finally:
        srv.shutdown()


def test_next_qlora_int8_base_with_kernel_flags(hf_next, rng):
    """QLoRA over an int8 base with the judge preset's kernel flags ON:
    next_loss must force the einsum MoE path (the int8 GMM/ragged kernels
    have no VJP — this exact combination crashed before the fix)."""
    import optax

    from video_r2_tpu.models.qwen3_next import (
        NEXT_LORA_TARGETS, make_next_lora_sft_step,
        quantize_qwen3_next_params)
    from video_r2_tpu.train.lora import (LoRAConfig, LoRATrainState,
                                         init_lora_for_quantized)

    _, cfg, params = hf_next
    cfg = cfg.replace(moe_gmm_prefill=True, moe_ragged_decode=True)
    qbase = quantize_qwen3_next_params(params)
    lcfg = LoRAConfig(r=4, alpha=8, targets=NEXT_LORA_TARGETS)
    lora = init_lora_for_quantized(qbase, lcfg, seed=0)
    opt = optax.adam(5e-3)
    step = make_next_lora_sft_step(qbase, cfg, lcfg, opt, donate=False)
    state = LoRATrainState(lora, opt.init(lora), 0)
    ids = rng.integers(2, 127, (2, 10))
    labels = np.full_like(ids, -100)
    labels[:, :-1] = ids[:, 1:]
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)}
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_next_continuous_cancel_and_budget_clamp(hf_next, rng):
    """request_cancel is lock-free (callable from step()'s tok_cb without
    deadlock) and over-budget requests clamp to the slot's room instead
    of streaming garbage from a frozen frontier."""
    from video_r2_tpu.engine.next_continuous import Qwen3NextContinuousEngine
    from video_r2_tpu.engine.sampling import SamplingParams

    _, cfg, params = hf_next
    sp = SamplingParams(max_new_tokens=8, eos_token_ids=(), pad_token_id=0)
    eng = Qwen3NextContinuousEngine(params, cfg, num_slots=2, max_len=32,
                                    sp=sp, prompt_buckets=(16,))
    # budget clamp: 100-token request into a 32-slot engine
    prompt = rng.integers(2, 127, 10).tolist()
    got = {}
    rid = eng.submit(prompt, 100, done_cb=lambda r, t: got.update({r: t}))
    while eng.num_active:
        eng.step()
    # prompt truncates to room=8 first, then the budget clamps to the
    # remaining strip: prompt + generation always fit the slot
    assert len(got[rid]) <= 32 - 8 - 1
    # cancel from inside the step's tok_cb (the stop-watcher call path)
    seen = []

    def tok_cb(r, t):
        seen.append(t)
        eng.request_cancel(r)     # would deadlock if cancel took the lock

    rid2 = eng.submit(prompt, 8, done_cb=lambda r, t: got.update({r: t}),
                      tok_cb=tok_cb)
    while eng.num_active:
        eng.step()
    assert len(got[rid2]) == 1    # cancelled after the first token


def test_next_tar_reward_pipeline(hf_next):
    """The TAR reward (GRPO's judge-gated temporal reward) runs end to end
    against the NATIVE Qwen3-Next judge: reward -> EngineJudge batching ->
    ChatEngine batch generate -> hybrid model. Tiny random weights emit
    junk, so only the plumbing contract is asserted (scores in [0, 1],
    junk-JSON extraction degrades to 0 instead of raising) — the scoring
    semantics are pinned by the StaticJudge tests."""
    from video_r2_tpu.engine.chat import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine
    from video_r2_tpu.rewards.embedding import HashingEmbedder
    from video_r2_tpu.rewards.judge import EngineJudge
    from video_r2_tpu.rewards.temporal import (
        temporal_grounding_sentence_embedding_consistency_reward)

    _, cfg, params = hf_next
    cfg = cfg.replace(eos_token_id=1, pad_token_id=0)
    eng = ChatEngine(params, cfg, ByteTokenizer(specials={
        "<|im_start|>": 2, "<|im_end|>": 1, "<|endoftext|>": 0}),
        max_new_tokens=8)
    judge = EngineJudge(eng, max_tokens=8)
    comps = [[{"role": "assistant", "content":
               "<think>at 5s a car passes</think><answer>A</answer>"}]] * 2
    answers = [[{"role": "assistant", "content": "A"}]] * 2
    tg = [{"00:05": "a car passes"}] * 2
    prompts = [[{"role": "system", "content": "s"},
                {"role": "user", "content": [
                    {"type": "video", "video": "x"},
                    {"type": "text", "text": "what passes?"}]}]] * 2
    r = temporal_grounding_sentence_embedding_consistency_reward(
        comps, answers, tg, prompts=prompts, judge=judge,
        embedder=HashingEmbedder())
    assert len(r) == 2 and all(0.0 <= x <= 1.0 for x in r)


def test_next_moe_kernel_flags(hf_next, rng):
    """The ragged-decode / GMM-prefill kernel flags reproduce the einsum
    MoE path (interpret mode on CPU) — the judge preset runs with them ON."""
    _, cfg, params = hf_next
    ids = rng.integers(2, 127, (1, 9))
    base = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    kcfg = cfg.replace(moe_ragged_decode=True, moe_gmm_prefill=True)
    ours = np.asarray(forward(params, kcfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, base, rtol=2e-4, atol=2e-4)
