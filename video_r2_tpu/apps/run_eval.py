"""Accuracy eval entry point (eval/scripts/accuracy/run_all.sh parity).

Usage:
  python -m video_r2_tpu.apps.run_eval --run.checkpoint <hf_dir> \\
      --tasks mvbench_think,videomme_think --docs path/to/docs.json \\
      --limit 8 --run.output_dir out/
"""

from __future__ import annotations

import sys

from ..config import AppConfig, parse_config
from ..evalharness import EngineModel, evaluate, get_task
from .common import (
    attn_impl,
    build_mesh,
    build_model,
    build_tokenizer,
    logger,
    setup_logging,
)


def main(argv=None):
    setup_logging()
    argv = list(sys.argv[1:] if argv is None else argv)
    tasks_arg, docs_arg, limit = "mvbench_think", None, None
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--tasks":
            tasks_arg = argv[i + 1]
            i += 2
        elif argv[i] == "--docs":
            docs_arg = argv[i + 1]
            i += 2
        elif argv[i] == "--limit":
            limit = int(argv[i + 1])
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    app = parse_config(rest)
    cfg, params = build_model(app)
    tok = build_tokenizer(app)

    tasks = [get_task(name, dataset_path=docs_arg)
             for name in tasks_arg.split(",")]
    ev = app.eval
    model = EngineModel(
        params, cfg, tok, attn_impl=attn_impl(app),
        max_num_frames=ev.max_num_frames, max_pixels=ev.max_pixels,
        min_pixels=ev.min_pixels, fps=ev.fps or None,
        batch_size=ev.batch_size, system_prompt=ev.system_prompt,
        engine_mode=ev.engine_mode,
        engine_max_len=ev.engine_max_len or None,
        act_quant=ev.act_quant or None, kv_quant=ev.kv_quant or None,
        vit_act_quant=ev.vit_act_quant or None,
        window_divisible=ev.window_divisible, decode_steps=ev.decode_steps,
        patch_dtype=ev.patch_dtype, spec_decode=ev.spec_decode,
        mesh=build_mesh(app))  # --run.dp/fsdp/tp shard the eval model
    out = evaluate(model, tasks, limit=limit, output_dir=app.run.output_dir,
                   cache_dir=f"{app.run.output_dir}/cache")  # resumable
    for name, res in out["results"].items():
        logger.info("%s: %s", name, res)
    return out


if __name__ == "__main__":
    main()
