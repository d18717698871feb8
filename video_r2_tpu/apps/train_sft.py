"""SFT training entry point (train/src/train/train_sft.py + train_sft.sh parity).

Usage:
  python -m video_r2_tpu.apps.train_sft --run.checkpoint <hf_dir> \\
      --data.data_path data.json --data.image_folder videos/ \\
      --optim.learning_rate 1e-5 --optim.vision_lr 2e-6 \\
      --run.fsdp 8 --run.max_steps 1000
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from ..config import AppConfig, parse_config
from ..data.sft import SFTCollator, SFTDataset
from ..train.checkpoint import resume_or_none, save_checkpoint
from ..train.optim import make_optimizer
from ..train.sft import init_train_state, make_sft_step
from .common import attn_impl, build_mesh, build_model, build_tokenizer, logger, setup_logging


def data_iterator(dataset, collator, batch_size: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(dataset))
    i = 0
    while True:
        if i + batch_size > len(order):
            order = rng.permutation(len(dataset))
            i = 0
        yield collator([dataset[int(j)] for j in order[i: i + batch_size]])
        i += batch_size


def main(argv=None, app: AppConfig | None = None, batch_size: int = 4):
    setup_logging()
    app = app or parse_config(argv)
    cfg, params = build_model(app)
    tok = build_tokenizer(app)
    mesh = build_mesh(app)
    impl = attn_impl(app)

    dataset = SFTDataset(app.data.data_path, tok, cfg, app.data)
    collator = SFTCollator(cfg, app.data)
    it = data_iterator(dataset, collator, batch_size, app.run.seed)

    optim_cfg = app.optim
    if optim_cfg.total_steps != app.run.max_steps:
        import dataclasses

        optim_cfg = dataclasses.replace(optim_cfg, total_steps=app.run.max_steps)
    use_lora = app.run.use_lora
    if use_lora:
        # the reference's SHIPPED SFT recipe is LoRA r=64 a=64 over a frozen
        # base with vision/merger excluded (train_sft.sh:30-44): only
        # adapter weights train; the base ships once as a jit argument
        from ..train.lora import LoRATrainState, init_lora, lora_param_count

        lora = init_lora(params, app.lora, seed=app.run.seed)
        optimizer = make_optimizer(optim_cfg, lora)
        if mesh is not None:
            from ..parallel.sharding import shard_params

            params = shard_params(params, mesh)
        state = LoRATrainState(lora, optimizer.init(lora),
                               jnp.zeros((), jnp.int32))
        logger.info("LoRA: r=%d alpha=%d (%d adapter params; base frozen)",
                    app.lora.r, app.lora.alpha, lora_param_count(lora))
    else:
        optimizer = make_optimizer(optim_cfg, params)
        state = init_train_state(params, optimizer, mesh=mesh)

    start_step = 0
    if app.run.resume:
        resumed = resume_or_none(app.run.output_dir, state)
        if resumed is not None:
            state, start_step = resumed
            logger.info("resumed from step %d", start_step)

    sft_cfg = app.sft
    if sft_cfg.attn_impl != impl:
        import dataclasses

        sft_cfg = dataclasses.replace(sft_cfg, attn_impl=impl)

    from ..utils.metrics_log import MetricsLogger

    mlog = MetricsLogger(app.run.output_dir)
    step_cache = {}
    t0 = time.time()
    for step_no in range(start_step, app.run.max_steps):
        batch = next(it)
        arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
        layout_key = (batch.video_layout.s_pad if batch.video_layout else 0,
                      batch.image_layout.s_pad if batch.image_layout else 0,
                      arrays["input_ids"].shape)
        if layout_key not in step_cache:
            if use_lora:
                from ..train.lora import make_lora_sft_step

                step_cache[layout_key] = make_lora_sft_step(
                    params, cfg, sft_cfg, app.lora, optimizer, mesh=mesh,
                    video_layout=batch.video_layout,
                    image_layout=batch.image_layout)
            else:
                step_cache[layout_key] = make_sft_step(
                    cfg, sft_cfg, optimizer, mesh=mesh,
                    video_layout=batch.video_layout,
                    image_layout=batch.image_layout)
        step = step_cache[layout_key]
        if mesh is not None:
            arrays = step.shard_batch(arrays)
        state, metrics = step(state, arrays)

        if (step_no + 1) % app.run.log_steps == 0:
            dt = (time.time() - t0) / app.run.log_steps
            t0 = time.time()
            logger.info("step %d loss %.4f grad_norm %.3f (%.2f s/step)",
                        step_no + 1, float(metrics["loss"]),
                        float(metrics["grad_norm"]), dt)
            mlog.log(step_no + 1, {**metrics, "s_per_step": dt})
        if (step_no + 1) % app.run.save_steps == 0:
            save_checkpoint(app.run.output_dir, state, step_no + 1,
                            keep=app.run.save_total_limit)
            logger.info("saved checkpoint-%d", step_no + 1)

    save_checkpoint(app.run.output_dir, state, app.run.max_steps,
                    keep=app.run.save_total_limit)
    if use_lora:
        # export MERGED weights in HF layout (the reference's
        # merge_lora_weights.py step) so eval/serving consume a plain
        # checkpoint; the adapter state itself lives in checkpoint-N/
        from ..train.checkpoint import export_hf_checkpoint
        from ..train.lora import merge_lora

        merged = merge_lora(params, state.lora, app.lora)
        out = export_hf_checkpoint(merged, cfg,
                                   f"{app.run.output_dir}/merged_hf")
        logger.info("exported merged HF weights to %s", out)
    return state


if __name__ == "__main__":
    main()
