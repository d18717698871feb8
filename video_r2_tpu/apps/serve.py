"""Serving entry point (train/serve_llm/serve_qwen3.sh parity on our engine).

Usage:
  python -m video_r2_tpu.apps.serve --run.checkpoint <hf_dir> --port 8000
"""

from __future__ import annotations

import sys

from ..config import parse_config
from ..engine.server import ChatEngine, serve
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
    port = 8000
    continuous = False
    engine_kind = "slots"
    spec_decode = 0  # --spec-decode K: n-gram speculative greedy decode
    kv_quant = None  # --kv-quant int8: quantized KV cache (composes w/ spec)
    decode_window = 1  # --decode-window N: tokens (or spec rounds) per
                       # dispatch in continuous mode — raise for throughput
                       # judge bursts on high-latency links
    prefill_chunk = 0  # --prefill-chunk N: paged chunked prefill — long
                       # prompts prefill N tokens per step, interleaved
                       # with decode (vLLM --enable-chunked-prefill)
    max_len = 4096     # --max-len N: per-request context budget
                       # (vLLM --max-model-len; serve_qwen3.sh:14 = 32768)
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--port":
            port = int(argv[i + 1])
            i += 2
        elif argv[i] == "--continuous":
            continuous = True
            i += 1
        elif argv[i] == "--spec-decode":
            spec_decode = int(argv[i + 1])
            i += 2
        elif argv[i] == "--kv-quant":
            kv_quant = argv[i + 1]
            i += 2
        elif argv[i] == "--decode-window":
            decode_window = int(argv[i + 1])
            i += 2
        elif argv[i] == "--prefill-chunk":
            prefill_chunk = int(argv[i + 1])
            i += 2
        elif argv[i] == "--max-len":
            max_len = int(argv[i + 1])
            i += 2
        elif argv[i] == "--paged":
            continuous = True
            engine_kind = "paged"
            i += 1
        else:
            rest.append(argv[i])
            i += 1
    app = parse_config(rest)
    # --run.tp 4 serves tensor-parallel (the 80B-judge deployment shape,
    # serve_qwen3.sh:13): checkpoint leaves stream straight into their
    # shardings at load; the engine's shard_params is then a no-op
    mesh = build_mesh(app)
    cfg, params = build_model(app, mesh=mesh)
    tok = build_tokenizer(app)
    engine = ChatEngine(params, cfg, tok, attn_impl=attn_impl(app), mesh=mesh,
                        continuous=continuous, engine_kind=engine_kind,
                        spec_decode=spec_decode, kv_quant=kv_quant,
                        decode_window=decode_window,
                        prefill_chunk_tokens=prefill_chunk, max_len=max_len)
    logger.info("serving OpenAI-compatible API on :%d%s", port,
                f" (mesh {dict(mesh.shape)})" if mesh is not None else "")
    serve(engine, port=port)


if __name__ == "__main__":
    main()
