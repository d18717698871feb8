"""Shared app bootstrap: model/tokenizer/mesh construction from AppConfig."""

from __future__ import annotations

import logging

from ..config import AppConfig, resolve_attn_impl
from ..engine.chat import load_tokenizer
from ..models.loader import init_params, load_hf_checkpoint
from ..parallel.mesh import MeshConfig, make_mesh

logger = logging.getLogger("video_r2_tpu")


def setup_logging():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")


def build_model(app: AppConfig, mesh=None):
    """mesh: checkpoint leaves stream straight into their rule shardings
    (the 80B judge loads into its TP layout without ever materializing on
    one device); downstream shard_params calls are idempotent no-ops."""
    cfg = app.model_config()
    wq = app.run.weight_quant
    if wq not in ("", None, "int8", "int4"):
        # a typo ('in8', 'int_4') would otherwise silently load int8
        raise ValueError(
            f"run.weight_quant must be '', 'int8', or 'int4' (got {wq!r})")
    from ..models.qwen3_next import is_qwen3_next_config

    is_next = is_qwen3_next_config(cfg)
    if app.run.checkpoint:
        if is_next:
            from ..models.qwen3_next import load_qwen3_next_checkpoint

            params = load_qwen3_next_checkpoint(
                app.run.checkpoint, cfg,
                quantize="int8" if wq else None,
                bits=4 if wq == "int4" else 8, mesh=mesh)
        else:
            params = load_hf_checkpoint(
                app.run.checkpoint, cfg,
                quantize="int8" if wq else None,
                bits=4 if wq == "int4" else 8, mesh=mesh)
        logger.info("loaded weights from %s%s", app.run.checkpoint,
                    f" ({wq} weight-only, quantized on load)" if wq else "")
    else:
        if is_next:
            from ..models.qwen3_next import (init_qwen3_next_params,
                                             quantize_qwen3_next_params)

            params = init_qwen3_next_params(cfg, seed=app.run.seed,
                                            method="zeros")
            if wq:
                params = quantize_qwen3_next_params(
                    params, bits=4 if wq == "int4" else 8, consume=True)
        elif wq:
            from ..models.quant import init_params_quantized_zeros

            params = init_params_quantized_zeros(
                cfg, bits=4 if wq == "int4" else 8)
        else:
            params = init_params(cfg, seed=app.run.seed, method="zeros")
        logger.warning("no checkpoint given — zero-initialized params")
    return cfg, params


def build_tokenizer(app: AppConfig):
    return load_tokenizer(app.run.tokenizer or None)


def build_mesh(app: AppConfig):
    r = app.run
    ep = getattr(r, "ep", 1)
    if r.dp * r.pp * r.fsdp * r.sp * ep * r.tp <= 1:
        return None
    return make_mesh(MeshConfig(dp=r.dp, pp=r.pp, fsdp=r.fsdp, sp=r.sp,
                                ep=ep, tp=r.tp))


def attn_impl(app: AppConfig) -> str:
    return resolve_attn_impl(app.run)
