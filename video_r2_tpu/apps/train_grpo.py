"""GRPO training entry point (train/src/train/train_grpo.py + train_grpo.sh parity).

Usage:
  python -m video_r2_tpu.apps.train_grpo --run.checkpoint <hf_dir> \\
      --data.data_path grpo.json --grpo.num_generations 8 --grpo.beta 0.04 \\
      --grpo.reward_weights 1,1,1 --run.max_steps 500
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AppConfig, parse_config
from ..data.grpo import GRPODataset
from ..rewards.embedding import load_embedder
from ..rewards.judge import OpenAICompatClient
from ..rewards.registry import load_reward_funcs
from ..train.checkpoint import resume_or_none, save_checkpoint
from ..train.grpo import GRPOTrainState, make_grpo_step
from ..train.grpo_runner import GRPORunner
from ..train.optim import make_optimizer
from .common import attn_impl, build_mesh, build_model, build_tokenizer, logger, setup_logging

DEFAULT_REWARDS = ("accuracy_reward", "format_reward",
                   "temporal_grounding_sentence_embedding_consistency_reward")


def main(argv=None, app: AppConfig | None = None, batch_size: int = 1,
         reward_names=DEFAULT_REWARDS, judge=None, embedder=None):
    setup_logging()
    app = app or parse_config(argv)
    cfg, params = build_model(app)
    tok = build_tokenizer(app)
    impl = attn_impl(app)
    if impl == "sp":
        # rollout generation is not sequence-sharded (decode is short-seq);
        # GRPO's loss forward is pinned to xla below regardless
        impl = "flash" if jax.default_backend() == "tpu" else "xla"

    dataset = GRPODataset(app.data.data_path, app.data)
    reward_names = list(reward_names)
    reward_funcs = load_reward_funcs(reward_names)
    judge = judge or OpenAICompatClient()
    embedder = embedder or load_embedder()

    # mesh: reference GRPO is 8-way ZeRO-3 (train_grpo.sh:41-42). Params,
    # optimizer state, loss batches and rollout generation all shard.
    mesh = build_mesh(app)
    if mesh is not None:
        from ..parallel.sharding import shard_params

        params = shard_params(params, mesh)
        logger.info("GRPO sharded over mesh %s", dict(mesh.shape))
    use_lora = app.run.use_lora
    if use_lora:
        # LoRA-GRPO (the reference trains GRPO over the same PEFT setup,
        # train_grpo.sh): adapters train, the base is frozen, and the
        # reference policy is the base with adapters DISABLED — the PEFT
        # disable_adapter trick (grpo_trainer.py:340-343), so no ref copy
        # exists. The base isn't donated (it rides the jit as an argument),
        # so aliasing it as ref_params is safe.
        from ..train.lora import (LoRATrainState, attach_lora, init_lora,
                                  lora_param_count, make_lora_grpo_step)

        lora = init_lora(params, app.lora, seed=app.run.seed)
        optimizer = make_optimizer(app.optim, lora)
        step = make_lora_grpo_step(params, cfg, app.grpo, app.lora,
                                   optimizer, mesh=mesh)
        base = step.base_params   # sharded under a mesh
        ref_params = base if app.grpo.beta != 0 else None
        runner = GRPORunner(
            attach_lora(base, lora, app.lora), cfg, app.grpo, tok,
            reward_funcs, reward_names, step, ref_params=ref_params,
            judge=judge, embedder=embedder, attn_impl=impl,
            seed=app.run.seed, mesh=mesh,
            params_from_state=lambda s: attach_lora(base, s.lora, app.lora))
        state = LoRATrainState(lora, optimizer.init(lora),
                               jnp.zeros((), jnp.int32))
        logger.info("LoRA-GRPO: r=%d alpha=%d (%d adapter params)",
                    app.lora.r, app.lora.alpha, lora_param_count(lora))
    else:
        optimizer = make_optimizer(app.optim, params)
        # loss forward: xla expresses the [prompt_pad | completion] gap as a
        # bias; with sp>1 the sp path expresses it as sharded segment ids
        loss_impl = "sp" if app.run.sp > 1 else "xla"
        step = make_grpo_step(cfg, app.grpo, optimizer, attn_impl=loss_impl,
                              mesh=mesh)
        # ref policy must be a REAL copy (reference: fresh model copy,
        # grpo_trainer.py:329-339): the train state aliases `params`'
        # buffers, and the donated step deletes them — an aliased ref would
        # die on cycle 2
        ref_params = (jax.tree_util.tree_map(jnp.copy, params)
                      if app.grpo.beta != 0 else None)
        runner = GRPORunner(params, cfg, app.grpo, tok, reward_funcs,
                            reward_names, step, ref_params=ref_params,
                            judge=judge, embedder=embedder, attn_impl=impl,
                            seed=app.run.seed, mesh=mesh)
        state = GRPOTrainState(params, optimizer.init(params),
                               jnp.zeros((), jnp.int32))
    start = 0
    if app.run.resume:
        resumed = resume_or_none(app.run.output_dir, state)
        if resumed is not None:
            state, start = resumed
            runner.params = runner.params_from_state(state)

    from ..utils.metrics_log import MetricsLogger

    mlog = MetricsLogger(app.run.output_dir)
    rng = np.random.default_rng(app.run.seed)
    for cycle in range(start, app.run.max_steps):
        idx = rng.choice(len(dataset), size=batch_size, replace=False)
        samples = [dataset[int(i)] for i in idx]
        t0 = time.time()
        state, metrics = runner.train_cycle(state, samples)
        logger.info("cycle %d loss %.4f reward %.3f kl %.5f len %.1f (%.1fs)",
                    cycle + 1, metrics.get("loss", float("nan")),
                    metrics["reward_mean"], metrics.get("kl", 0.0),
                    metrics["completion_len_mean"], time.time() - t0)
        mlog.log(cycle + 1, metrics)
        if (cycle + 1) % app.run.save_steps == 0:
            save_checkpoint(app.run.output_dir, state, cycle + 1,
                            keep=app.run.save_total_limit)
    save_checkpoint(app.run.output_dir, state, app.run.max_steps,
                    keep=app.run.save_total_limit)
    if use_lora:
        from ..train.checkpoint import export_hf_checkpoint
        from ..train.lora import merge_lora

        merged = merge_lora(step.base_params, state.lora, app.lora)
        out = export_hf_checkpoint(merged, cfg,
                                   f"{app.run.output_dir}/merged_hf")
        logger.info("exported merged HF weights to %s", out)
    return state


if __name__ == "__main__":
    main()
