"""Speculative decoding (engine/spec_decode.py): token-exact parity with
plain greedy decode, acceptance actually reduces dispatch count, EOS/budget
edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_r2_tpu.engine import SamplingParams
from video_r2_tpu.engine.generate import generate, prefill
from video_r2_tpu.engine.spec_decode import spec_decode
from video_r2_tpu.models import init_params, tiny_test_config


def _prompts(rng, B=4, S=24):
    lens = np.array([S, S - 4, S - 7, S])[:B]
    ids = rng.integers(2, 400, size=(B, S))
    for b in range(B):
        ids[b, lens[b]:] = 0
    return ids, lens


@pytest.mark.parametrize("spec_k", [2, 4])
def test_spec_matches_plain_greedy(rng, spec_k):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32", seed=3)
    ids, lens = _prompts(rng)
    ids[0, :24] = np.tile(rng.integers(2, 400, size=6), 4)  # lookup-friendly
    sp = SamplingParams(max_new_tokens=16, pad_token_id=0, eos_token_ids=())
    r1 = generate(params, cfg, ids, lens, sp)
    r2 = generate(params, cfg, ids, lens, sp, spec_decode=spec_k)
    np.testing.assert_array_equal(r1.sequences, r2.sequences)
    np.testing.assert_array_equal(r1.lengths, r2.lengths)
    np.testing.assert_allclose(r1.logprobs, r2.logprobs, atol=1e-5)


def test_spec_matches_plain_with_eos(rng):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32", seed=3)
    ids, lens = _prompts(rng)
    sp0 = SamplingParams(max_new_tokens=16, pad_token_id=0, eos_token_ids=())
    base = generate(params, cfg, ids, lens, sp0)
    eos_tok = int(base.sequences[0, 5])  # a token the model actually emits
    sp = SamplingParams(max_new_tokens=16, pad_token_id=0,
                        eos_token_ids=(eos_tok,))
    r1 = generate(params, cfg, ids, lens, sp)
    r2 = generate(params, cfg, ids, lens, sp, spec_decode=4)
    np.testing.assert_array_equal(r1.sequences, r2.sequences)
    np.testing.assert_array_equal(r1.lengths, r2.lengths)


def test_spec_acceptance_cuts_dispatches(rng):
    """A maximally self-repetitive model (zero params -> constant argmax)
    must accept essentially every draft: the verify loop runs ~T/(K+1)
    iterations, not T."""
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32", method="zeros")
    ids, lens = _prompts(rng, B=2)
    T, K = 24, 4
    sp = SamplingParams(max_new_tokens=T, pad_token_id=0, eos_token_ids=())
    max_cache = ids.shape[1] + T + K + 1
    pos = np.broadcast_to(np.arange(ids.shape[1])[None, None],
                          (3,) + ids.shape).copy()
    logits, cache = prefill(params, cfg, jnp.asarray(ids), jnp.asarray(pos),
                            jnp.asarray(lens), max_cache)
    toks, _, gen_len, iters = spec_decode(
        params, cfg, sp, logits, cache, jnp.asarray(lens),
        jnp.asarray(np.zeros_like(lens)), jnp.asarray(ids),
        s_pad=ids.shape[1], spec_k=K)
    assert int(iters) <= 2 + T // (K + 1), int(iters)  # ~5x fewer dispatches
    assert np.all(np.asarray(gen_len) == T)
    # constant-argmax model emits one repeated token
    assert len(np.unique(np.asarray(toks))) == 1


def test_chat_engine_spec_matches_plain():
    """ChatEngine(spec_decode=K): chat and chat_batch outputs are identical
    to the non-speculative engine; EngineJudge.chat_many routes a burst
    through one batched speculative generate."""
    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine
    from video_r2_tpu.rewards import EngineJudge

    cfg = tiny_test_config(vocab_size=152064).replace(
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32", seed=5)
    plain = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=6)
    spec = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=6,
                      spec_decode=3)
    msgs = [[{"role": "user", "content": "judge: is A == A? answer yes/no"}],
            [{"role": "user", "content": "extract the final letter: B"}]]
    assert spec.chat(msgs[0]) == plain.chat(msgs[0])
    assert spec.chat_batch(msgs) == [plain.chat(m) for m in msgs]
    # sampling requests fall back to the plain path (no error)
    spec.chat(msgs[0], temperature=0.7)
    judge = EngineJudge(spec, max_tokens=6)
    outs = judge.chat_many([("sys", "u1"), ("sys", "u2")])
    ref = EngineJudge(plain, max_tokens=6)
    assert outs == ref.chat_many([("sys", "u1"), ("sys", "u2")])


def test_spec_sampling_near_zero_temp_matches_greedy(rng):
    """Sampled spec at temperature ~0: acceptance probabilities collapse to
    {0, 1} and categorical to argmax, so the stream equals plain greedy."""
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32", seed=3)
    ids, lens = _prompts(rng)
    ids[0, :24] = np.tile(rng.integers(2, 400, size=6), 4)
    greedy = generate(params, cfg, ids, lens,
                      SamplingParams(max_new_tokens=12, pad_token_id=0,
                                     eos_token_ids=()))
    sampled = generate(params, cfg, ids, lens,
                       SamplingParams(do_sample=True, temperature=1e-6,
                                      max_new_tokens=12, pad_token_id=0,
                                      eos_token_ids=()),
                       spec_decode=4)
    np.testing.assert_array_equal(sampled.sequences, greedy.sequences)


def test_spec_sampling_matches_plain_distribution(rng):
    """Rejection-sampling verification samples from the SAME distribution
    as the plain sampling loop (Leviathan/Chen exactness, deterministic
    n-gram proposal): per-position marginals over many parallel rows agree
    within sampling noise. A repetitive prompt makes drafting fire (the
    acceptance path is exercised, not just the fallthrough)."""
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32", seed=3)
    B, T = 1024, 3
    row = np.tile(rng.integers(2, 400, size=6), 4)[:20]
    ids = np.tile(row[None, :], (B, 1))
    lens = np.full((B,), 20)
    sp = SamplingParams(do_sample=True, temperature=0.8, top_k=8,
                        max_new_tokens=T, pad_token_id=0, eos_token_ids=())
    plain = generate(params, cfg, ids, lens, sp, seed=11).sequences
    plain2 = generate(params, cfg, ids, lens, sp, seed=77).sequences
    spec = generate(params, cfg, ids, lens, sp, seed=23,
                    spec_decode=3).sequences

    def tv(a, b, t):
        vals = np.union1d(a[:, t], b[:, t])
        pa = np.array([(a[:, t] == v).mean() for v in vals])
        pb = np.array([(b[:, t] == v).mean() for v in vals])
        return 0.5 * np.abs(pa - pb).sum()

    # calibrate against the finite-sample noise floor (the support grows
    # ~8^t, so raw TV at later positions is noise-dominated even for two
    # plain runs): spec-vs-plain must sit within margin of plain-vs-plain
    for t in range(T):
        floor = tv(plain, plain2, t)
        dev = tv(spec, plain, t)
        assert dev < floor + 0.06, (t, dev, floor)
    # sanity: the distribution is genuinely non-degenerate
    assert len(np.unique(plain[:, 0])) >= 3


@pytest.mark.parametrize("spec_k", [2, 4])
def test_spec_int8_kv_matches_plain_int8_kv(rng, spec_k):
    """int8-KV speculative decode == plain int8-KV greedy, token for token:
    both paths quantize each new token's K/V with the same per-token absmax
    and attend through the quantized cache, so the verify-chunk frontier
    scatter changes nothing about the numerics."""
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32", seed=3)
    ids, lens = _prompts(rng)
    ids[0, :24] = np.tile(rng.integers(2, 400, size=6), 4)  # lookup-friendly
    sp = SamplingParams(max_new_tokens=16, pad_token_id=0, eos_token_ids=())
    r1 = generate(params, cfg, ids, lens, sp, kv_quant="int8")
    r2 = generate(params, cfg, ids, lens, sp, kv_quant="int8",
                  spec_decode=spec_k)
    np.testing.assert_array_equal(r1.sequences, r2.sequences)
    np.testing.assert_array_equal(r1.lengths, r2.lengths)
    np.testing.assert_allclose(r1.logprobs, r2.logprobs, atol=1e-5)


def test_chat_engine_continuous_spec_matches_plain():
    """ChatEngine(continuous=True, spec_decode=K): the slot loop's per-slot
    frontier verification produces the same judge outputs as the plain
    continuous engine."""
    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine

    cfg = tiny_test_config(vocab_size=152064).replace(
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32", seed=5)
    msgs = [[{"role": "user", "content": "judge: is A == A? answer yes/no"}],
            [{"role": "user", "content": "extract the final letter: B"}]]

    # full-suite stability: this test's spec-dispatch compile has stalled
    # indefinitely (faulthandler-verified, main thread, inside pjit
    # cache_miss) when run after ~270 other tests, while passing in any
    # smaller batch — an XLA-CPU compile pathology against the bloated
    # process-lifetime cache, not a code bug. Start from a clean cache.
    jax.clear_caches()

    def warm(spec, kind):
        # pre-warm the dispatch jit caches on the MAIN thread: ChatEngine's
        # run_loop compiles on a background thread otherwise, which has
        # (rarely) stalled late in long pytest processes — with the caches
        # warm the thread only ever cache-hits
        from video_r2_tpu.engine.continuous import (ContinuousEngine,
                                                    PagedContinuousEngine)
        from video_r2_tpu.engine.sampling import SamplingParams as SP

        kw = dict(num_slots=2, max_len=128,
                  sp=SP(eos_token_ids=(cfg.eos_token_id,),
                        pad_token_id=cfg.pad_token_id),
                  spec_decode=spec)
        eng = (PagedContinuousEngine(params, cfg, page_size=32, **kw)
               if kind == "paged" else ContinuousEngine(params, cfg, **kw))
        eng.submit([5, 6, 7], max_new_tokens=2)
        while eng.num_active:
            eng.step()

    def run(spec, kind="slots"):
        warm(spec, kind)
        eng = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=6,
                         continuous=True, num_slots=2, max_len=128,
                         spec_decode=spec, engine_kind=kind, page_size=32)
        try:
            return eng.chat_batch(msgs)
        finally:
            eng.shutdown()

    plain = run(0)
    assert plain == run(3)
    # the paged serving core speculates too (multi-query paged kernel)
    assert plain == run(3, kind="paged")
