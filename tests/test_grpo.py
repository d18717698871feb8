"""GRPO tests: advantage math vs hand-computed reference formulas, completion
masking, chunked logprobs vs oracle, loss behavior, and a full end-to-end
rollout->reward->step cycle on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_r2_tpu.models import init_params, tiny_test_config
from video_r2_tpu.ops.logprobs import chunked_token_logprobs
from video_r2_tpu.train import (
    GRPOConfig,
    GRPORunner,
    GRPOTrainState,
    combine_rewards,
    completion_mask_from_ids,
    compute_advantages,
    grpo_loss,
    make_grpo_step,
)


def test_completion_mask():
    ids = np.array([
        [5, 6, 99, 7, 8],    # eos (99) at idx 2
        [5, 6, 7, 8, 9],     # no eos
        [99, 1, 2, 3, 4],    # eos first
    ])
    m = completion_mask_from_ids(ids, eos_token_id=99)
    np.testing.assert_array_equal(m, [
        [1, 1, 1, 0, 0], [1, 1, 1, 1, 1], [1, 0, 0, 0, 0]])
    mt = completion_mask_from_ids(ids, 99, mask_truncated=True)
    np.testing.assert_array_equal(mt[1], [0, 0, 0, 0, 0])


def test_combine_rewards_and_gating():
    names = ["accuracy_reward", "format_reward", "tar_reward"]
    r = np.array([[1.0, 1.0, 0.5], [0.0, 1.0, 0.8], [np.nan, 1.0, 0.2]])
    cfg = GRPOConfig(reward_weights=(1.0, 0.5, 2.0))
    total = combine_rewards(r, names, cfg)
    np.testing.assert_allclose(total, [1 + 0.5 + 1.0, 0 + 0.5 + 1.6, 0.5 + 0.4])
    # positive reinforcement: tar zeroed when accuracy <= 0.1
    cfg2 = GRPOConfig(reward_weights=(1.0, 0.5, 2.0),
                      positive_reinforcement="tar_reward")
    total2 = combine_rewards(r, names, cfg2)
    # rows 1,2 gated (NaN accuracy > 0.1 is False, reference parity)
    np.testing.assert_allclose(total2, [2.5, 0.5, 0.5])


def test_advantages_group_norm():
    cfg = GRPOConfig(num_generations=4, scale_rewards=True)
    rewards = np.array([1.0, 0.0, 1.0, 0.0,   2.0, 2.0, 2.0, 2.0])
    adv = compute_advantages(rewards, rewards[:, None], ["accuracy_reward"], cfg)
    g1 = rewards[:4]
    expected = (g1 - g1.mean()) / (g1.std(ddof=1) + 1e-4)
    np.testing.assert_allclose(adv[:4], expected, rtol=1e-6)
    np.testing.assert_allclose(adv[4:], 0.0)  # zero-variance group
    cfg_ns = GRPOConfig(num_generations=4, scale_rewards=False)
    adv2 = compute_advantages(rewards, rewards[:, None], ["accuracy_reward"], cfg_ns)
    np.testing.assert_allclose(adv2[:4], g1 - g1.mean())


def test_advantages_mapo():
    cfg = GRPOConfig(num_generations=4, loss_type="mapo")
    acc = np.array([1.0, 1.0, 0.0, 0.0])
    rewards = acc + 0.5
    rpf = acc[:, None]
    adv = compute_advantages(rewards, rpf, ["accuracy_reward"], cfg)
    g = rewards
    mu, sigma = g.mean(), g.std()
    eps = np.finfo(np.float64).eps
    p = 0.5
    lam = np.clip(1 - 4 * p * (1 - p), 0, 1)  # = 0
    expected = (1 - lam) * (g - mu) / (sigma + eps) + lam * (g - mu) / (mu + eps)
    np.testing.assert_allclose(adv, expected, rtol=1e-9)


def test_chunked_logprobs_matches_oracle(rng):
    N, H, V = 37, 16, 211
    hidden = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.2)
    toks = jnp.asarray(rng.integers(0, V, size=N))
    temp = 0.7

    def oracle(h, w):
        logits = (h @ w) / temp
        return jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                   toks[:, None], axis=-1)[:, 0]

    ours = chunked_token_logprobs(hidden, weight, toks, temp, 8)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle(hidden, weight)),
                               rtol=1e-5, atol=1e-6)
    # grads: d(sum logp * coeff)/d(hidden, weight)
    coeff = jnp.asarray(rng.normal(size=N).astype(np.float32))
    f_ours = lambda h, w: (chunked_token_logprobs(h, w, toks, temp, 8) * coeff).sum()
    f_ref = lambda h, w: (oracle(h, w) * coeff).sum()
    g1 = jax.grad(f_ours, argnums=(0, 1))(hidden, weight)
    g2 = jax.grad(f_ref, argnums=(0, 1))(hidden, weight)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def _loss_batch(cfg, rng, B=4, P=6, C=5, adv=None):
    ids = rng.integers(2, 400, size=(B, P + C))
    pos = np.broadcast_to(np.arange(P + C)[None, None], (3, B, P + C)).copy()
    cmask = np.ones((B, C), np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.asarray(pos),
        "attention_mask": jnp.ones((B, P + C), jnp.int32),
        "completion_mask": jnp.asarray(cmask),
        "advantages": jnp.asarray(
            adv if adv is not None else rng.normal(size=B), jnp.float32),
    }


def test_grpo_loss_zero_at_start_beta0(rng):
    """With old==current and beta=0: ratio=1 so loss = -mean(adv) and grads
    equal policy-gradient direction; value check: loss == -mean(advantages)."""
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    gcfg = GRPOConfig(beta=0.0, num_generations=2, logp_chunk_size=16)
    batch = _loss_batch(cfg, rng)
    loss, metrics = grpo_loss(params, cfg, gcfg, batch)
    np.testing.assert_allclose(
        float(loss), float(-batch["advantages"].mean()), rtol=1e-5)
    assert float(metrics["clip_ratio/region"]) == 0.0


def test_grpo_loss_kl_zero_when_ref_equals(rng):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    gcfg = GRPOConfig(beta=0.04, num_generations=2, logp_chunk_size=16)
    batch = _loss_batch(cfg, rng)
    from video_r2_tpu.train import per_token_logps

    C = batch["completion_mask"].shape[1]
    ref_lp = per_token_logps(params, cfg, batch["input_ids"],
                             batch["position_ids"], batch["attention_mask"],
                             C, gcfg.temperature, 16)
    batch["ref_per_token_logps"] = ref_lp
    loss, metrics = grpo_loss(params, cfg, gcfg, batch)
    assert abs(float(metrics["kl"])) < 1e-9


def test_grpo_loss_types(rng):
    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    batch = _loss_batch(cfg, rng)
    vals = {}
    for lt in ["grpo", "bnpo", "dr_grpo", "gmpo"]:
        gcfg = GRPOConfig(beta=0.0, loss_type=lt, max_completion_length=8,
                          logp_chunk_size=16)
        loss, _ = grpo_loss(params, cfg, gcfg, batch)
        vals[lt] = float(loss)
        assert np.isfinite(vals[lt])
    # dr_grpo divides by B*max_completion_length (8) not token count (5)
    np.testing.assert_allclose(vals["dr_grpo"], vals["bnpo"] * 5 / 8, rtol=1e-5)


@pytest.mark.parametrize("spec", [0, 2])
def test_grpo_end_to_end_cycle(rng, spec):
    """Full cycle on the tiny model: rollout, rewards, advantage, train step.
    spec=2 routes the SAMPLED rollouts through rejection-sampling
    speculative decoding (distribution-exact; parity pinned at the generate
    level in test_spec_decode.py) — the cycle must train identically in
    structure."""
    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.rewards import format_reward
    from video_r2_tpu.train import make_grpo_step
    from video_r2_tpu.train.optim import OptimConfig, make_optimizer

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    gcfg = GRPOConfig(num_generations=2, beta=0.04, max_completion_length=8,
                      max_prompt_length=128, temperature=1.0,
                      logp_chunk_size=64, num_iterations=2,
                      rollout_spec_decode=spec)
    opt = make_optimizer(OptimConfig(learning_rate=1e-4, total_steps=10), params)
    step = make_grpo_step(cfg, gcfg, opt, donate=False)

    def fake_reward(completions, **kw):
        return [float(len(c[0]["content"]) % 3) for c in completions]

    runner = GRPORunner(
        params, cfg, gcfg, ByteTokenizer(),
        reward_funcs=[fake_reward, format_reward],
        reward_func_names=["fake_reward", "format_reward"],
        step_fn=step, ref_params=params)

    frames = rng.integers(0, 256, size=(4, 28, 28, 3), dtype=np.uint8)
    samples = [{
        "prompt": [
            {"role": "system", "content": "sys"},
            {"role": "user", "content": [
                {"type": "video", "video": frames, "video_fps": 2.0, "nframes": 4},
                {"type": "text", "text": "What?"}]},
        ],
        "assistant": "<answer>A</answer>",
        "temporal_grounding": {},
        "temporal_captions": {},
    } for _ in range(2)]

    state = GRPOTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    state, metrics = runner.train_cycle(state, samples)
    assert np.isfinite(metrics["loss"])
    assert "reward_mean" in metrics and "rewards/fake_reward/mean" in metrics
    assert int(state.step) == 2  # num_iterations optimizer steps
    assert "kl" in metrics


@pytest.mark.parametrize("spec", [0, 2])
def test_grpo_paged_rollout_cycle(rng, spec):
    """rollout_backend='paged': the full GRPO cycle runs on the continuous
    paged engine (VERDICT r1 #6), including video prompts."""
    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.train import make_grpo_step
    from video_r2_tpu.train.optim import OptimConfig, make_optimizer

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    gcfg = GRPOConfig(num_generations=2, beta=0.04, max_completion_length=8,
                      max_prompt_length=128, temperature=1.0,
                      logp_chunk_size=64, rollout_backend="paged",
                      rollout_spec_decode=spec)
    opt = make_optimizer(OptimConfig(learning_rate=1e-4, total_steps=10), params)
    step = make_grpo_step(cfg, gcfg, opt, donate=False)

    def fake_reward(completions, **kw):
        return [float(len(c[0]["content"]) % 3) for c in completions]

    runner = GRPORunner(
        params, cfg, gcfg, ByteTokenizer(),
        reward_funcs=[fake_reward], reward_func_names=["fake_reward"],
        step_fn=step, ref_params=params)

    frames = rng.integers(0, 256, size=(4, 28, 28, 3), dtype=np.uint8)
    samples = [{
        "prompt": [{"role": "user", "content": [
            {"type": "video", "video": frames, "video_fps": 2.0, "nframes": 4},
            {"type": "text", "text": "What?"}]}],
        "assistant": "<answer>A</answer>",
        "temporal_grounding": {}, "temporal_captions": {},
    } for _ in range(2)]

    state = GRPOTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    state, metrics = runner.train_cycle(state, samples)
    assert np.isfinite(metrics["loss"])
    assert metrics["completion_len_mean"] > 0
    assert "kl" in metrics
    # the engine is reused on the next cycle (no rebuild)
    eng = runner._rollout_eng
    assert eng is not None
    state, metrics = runner.train_cycle(state, samples)
    assert runner._rollout_eng is eng
    assert np.isfinite(metrics["loss"])


def test_lora_grpo_cycle(rng):
    """LoRA-GRPO: adapters train; ref policy = adapter-disabled base (no
    reference model copy). KL is exactly 0 at step 0 and grows after."""
    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.train.lora import (
        LoRAConfig,
        LoRATrainState,
        attach_lora,
        init_lora,
        make_lora_grpo_step,
    )
    from video_r2_tpu.train.optim import OptimConfig, make_optimizer

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    base = init_params(cfg, dtype="float32")
    lcfg = LoRAConfig(r=4, alpha=8)
    lora = init_lora(base, lcfg)
    gcfg = GRPOConfig(num_generations=2, beta=0.04, max_completion_length=6,
                      max_prompt_length=128, logp_chunk_size=64)
    opt = make_optimizer(OptimConfig(learning_rate=3e-3, total_steps=10), lora)
    step = make_lora_grpo_step(base, cfg, gcfg, lcfg, opt, donate=False)

    def odd_len_reward(completions, **kw):
        return [float(len(c[0]["content"]) % 2) for c in completions]

    runner = GRPORunner(
        attach_lora(base, lora, lcfg), cfg, gcfg, ByteTokenizer(),
        reward_funcs=[odd_len_reward], reward_func_names=["odd_len_reward"],
        step_fn=step, ref_params=base,
        params_from_state=lambda s: attach_lora(base, s.lora, lcfg))

    frames = rng.integers(0, 256, size=(4, 28, 28, 3), dtype=np.uint8)
    sample = {"prompt": [{"role": "user", "content": [
                  {"type": "video", "video": frames, "video_fps": 2.0,
                   "nframes": 4},
                  {"type": "text", "text": "What?"}]}],
              "assistant": "<answer>A</answer>",
              "temporal_grounding": {}, "temporal_captions": {}}
    state = LoRATrainState(lora, opt.init(lora), jnp.zeros((), jnp.int32))
    state, m1 = runner.train_cycle(state, [sample, sample])
    assert abs(m1["kl"]) < 1e-6  # adapters at init == base -> KL exactly 0
    state, m2 = runner.train_cycle(state, [sample, sample])
    assert np.isfinite(m2["loss"])
    assert m2["kl"] >= 0.0
    # adapters actually moved
    assert float(jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), state.lora, 0.0)) > 0.0


def test_grpo_image_prompt(rng, tmp_path):
    """GRPO prompts with image content (reference grpo_dataset image branch)."""
    from PIL import Image

    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.train import make_grpo_step
    from video_r2_tpu.train.optim import OptimConfig, make_optimizer

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    img_path = tmp_path / "i.png"
    Image.fromarray(rng.integers(0, 256, (56, 56, 3), dtype=np.uint8)).save(img_path)
    gcfg = GRPOConfig(num_generations=2, beta=0.0, max_completion_length=4,
                      max_prompt_length=128, logp_chunk_size=64)
    opt = make_optimizer(OptimConfig(learning_rate=1e-4, total_steps=5), params)
    step = make_grpo_step(cfg, gcfg, opt, donate=False)
    runner = GRPORunner(params, cfg, gcfg, ByteTokenizer(),
                        reward_funcs=[lambda completions, **kw:
                                      [float(len(c[0]["content"]) % 2)
                                       for c in completions]],
                        reward_func_names=["len_reward"], step_fn=step)
    sample = {"prompt": [{"role": "user", "content": [
                  {"type": "image", "image": str(img_path)},
                  {"type": "text", "text": "What is this?"}]}],
              "assistant": "<answer>A</answer>",
              "temporal_grounding": {}, "temporal_captions": {}}
    state = GRPOTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    state, m = runner.train_cycle(state, [sample])
    assert np.isfinite(m["loss"])


def test_all_nan_reward_warning(rng, caplog):
    """Rows every reward function declined to score warn loudly
    (grpo_trainer.py:894-903 parity)."""
    import logging

    from video_r2_tpu.engine import ByteTokenizer

    cfg = tiny_test_config(vocab_size=152064).replace(
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    gcfg = GRPOConfig(num_generations=2, beta=0.0, max_completion_length=4,
                      max_prompt_length=64, temperature=1.0)
    runner = GRPORunner(
        params, cfg, gcfg, ByteTokenizer(),
        reward_funcs=[lambda completions, **kw: [None] * len(completions)],
        reward_func_names=["declines"], step_fn=None)
    samples = [{"prompt": [{"role": "user", "content": "hi"}],
                "assistant": "x"}]
    with caplog.at_level(logging.WARNING):
        runner.rollout_and_score(samples)
    assert any("All reward functions returned None" in r.message
               for r in caplog.records)
