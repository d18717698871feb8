"""Continuous batching for the Qwen3-Next hybrid judge.

The vLLM role (reference serve_qwen3.sh: the judge serves CONCURRENT
TAC/VAS/TAR traffic) for models/qwen3_next.py: N decode slots share one
compiled step; requests admit into free slots via a bucketed single-prompt
prefill scattered into the batched hybrid cache.

Why a slot engine and not the paged engine: 36/48 layers carry a
CONSTANT-size recurrent state ([nv, dk, dv] + a conv tail per slot) — there
is nothing to page for them, and the remaining 1/4 of layers' KV is a
per-slot [max_len] strip. The per-slot reservation the paged design exists
to avoid is 4x smaller here by construction.

Inactive slots keep decoding garbage (masked, confined to their own cache
rows, overwritten at the next admission) — the cost of a fixed-shape step.
Their `length` is clamped below the KV strip so an idle engine can run
forever. Emission, EOS, budgets, per-token callbacks, and cancellation are
host-side; per-slot sampling params ride the jitted step
(engine/sampling.sample_token_per_slot, mixed greedy/sampled pools).

Protocol-compatible with engine/continuous._run_loop_impl (submit/step/
num_active/num_slots/request_cancel), so ChatEngine(continuous=True) hosts
it behind the same OpenAI server.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen3_next import (
    Qwen3NextCache,
    Qwen3NextConfig,
    _commit,
    _extend_forward,
    decode_step,
    prefill,
)
from .sampling import SamplingParams, sample_token_per_slot


@dataclass
class _Req:
    rid: int
    budget: int
    done_cb: Optional[Callable]
    tok_cb: Optional[Callable]
    eos: tuple
    toks: list = field(default_factory=list)


@partial(jax.jit, static_argnames=("cfg", "bucket", "mesh"),
         donate_argnums=(2,))
def _admit_jit(params, cfg, cache, slot, ids, true_len, bucket, mesh):
    """Prefill one prompt (B=1 at a bucketed length) and scatter its
    per-layer states into `slot` of the batched cache."""
    logits, pc = prefill(params, cfg, ids, true_len[None], bucket,
                         mesh=mesh)
    conv = cache.conv.at[:, :, slot].set(pc.conv[:, :, 0])
    rec = cache.rec.at[:, :, slot].set(pc.rec[:, :, 0])
    k = cache.k.at[:, slot, :bucket].set(pc.k[:, 0])
    v = cache.v.at[:, slot, :bucket].set(pc.v[:, 0])
    length = cache.length.at[slot].set(true_len)
    cache = Qwen3NextCache(conv=conv, rec=rec, k=k, v=v, length=length)
    if mesh is not None:
        from ..parallel.sharding import pin_next_cache

        # keep the persistent cache in ONE layout across admit/decode jits
        # (kv-heads + DeltaNet value heads on "tp") or GSPMD re-lays-out
        # the buffers around every scatter
        cache = pin_next_cache(cache, mesh, cfg.num_key_value_heads,
                               cfg.linear_num_value_heads)
    return logits[0], cache


@partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(1,))
def _step_jit(params, cache, last_logits, rng, temp, top_p, top_k,
              do_sample, cfg, mesh):
    rng, sub = jax.random.split(rng)
    tok = sample_token_per_slot(last_logits, sub, temp, top_p, top_k,
                                do_sample).astype(jnp.int32)
    logits, cache = decode_step(params, cfg, tok, cache, mesh=mesh)
    # idle slots decode garbage forever: clamp their frontier below the KV
    # strip (never binds for active rows — submit guarantees
    # true_len + budget < max_len)
    cache = cache._replace(
        length=jnp.minimum(cache.length, cache.k.shape[2] - 2))
    if mesh is not None:
        from ..parallel.sharding import pin_next_cache

        cache = pin_next_cache(cache, mesh, cfg.num_key_value_heads,
                               cfg.linear_num_value_heads)
    return tok, logits, cache, rng


@partial(jax.jit, static_argnames=("cfg", "ck", "mesh"), donate_argnums=(2,))
def _prefill_chunk_jit(params, cfg, sub_cache, chunk_ids, start, true_len,
                       ck, mesh):
    """One ck-token chunk of a single prompt's prefill, continuing a B=1
    accumulator cache (chunked prefill, the vLLM interleaving). Reuses the
    spec machinery: _extend_forward runs the chunk as a window at the
    frontier and _commit advances the DeltaNet state through the VALID
    tokens only (the last chunk's pad tail neither decays nor writes —
    pause masking). One compiled variant serves every chunk position:
    start/true_len are traced. The accumulator never touches the batched
    cache, so decode steps between chunks can't corrupt the recurrent
    state mid-prefill; _install_jit scatters it into the slot at the end."""
    logits_w, saved, kv_new = _extend_forward(params, cfg, chunk_ids,
                                              sub_cache, mesh=mesh)
    n_valid = jnp.clip(true_len - start, 0, ck)
    sub = _commit(cfg, sub_cache, saved, kv_new, n_valid[None])
    last_local = jnp.clip(true_len - 1 - start, 0, ck - 1)
    return logits_w[0, last_local], sub


@partial(jax.jit, static_argnames=("cfg", "bucket", "mesh"),
         donate_argnums=(1,))
def _install_jit(cfg, cache, slot, sub, true_len, bucket, mesh):
    """Scatter a completed chunked-prefill accumulator into `slot` of the
    batched cache (the tail of _admit_jit, without the prefill)."""
    conv = cache.conv.at[:, :, slot].set(sub.conv[:, :, 0])
    rec = cache.rec.at[:, :, slot].set(sub.rec[:, :, 0])
    k = cache.k.at[:, slot, :bucket].set(sub.k[:, 0, :bucket])
    v = cache.v.at[:, slot, :bucket].set(sub.v[:, 0, :bucket])
    length = cache.length.at[slot].set(true_len)
    cache = Qwen3NextCache(conv=conv, rec=rec, k=k, v=v, length=length)
    if mesh is not None:
        from ..parallel.sharding import pin_next_cache

        cache = pin_next_cache(cache, mesh, cfg.num_key_value_heads,
                               cfg.linear_num_value_heads)
    return cache


@partial(jax.jit, static_argnames=("cfg", "spec_k", "rounds", "greedy_only",
                                   "mesh"),
         donate_argnums=(2, 3))
def _spec_step_jit(params, cfg, cache, hist, last_logits, rej_tok, active,
                   samp, pad_id, rng, spec_k, rounds, greedy_only, mesh):
    """`rounds` speculative verify rounds for all slots in ONE dispatch.
    Reuses the transformer slot engine's per-slot drafting/acceptance
    (continuous._spec_tok0/_spec_draft/_spec_accept — greedy slots accept
    by argmax equality, token-exact; sampled by per-slot rejection
    sampling) around the hybrid model's verify/commit split
    (models/qwen3_next._extend_forward saves the post-conv DeltaNet
    streams; _commit replays ONLY the state math through the accepted
    prefix with pause masks — the recurrent state can't roll back, this
    keeps a round ~one forward). The slot frontier is cache.length itself:
    hist rows are [prompt | generated] contiguous, exactly _spec_draft's
    contract. Inactive slots commit 0 tokens (no state advance — unlike
    the plain step there is no garbage decode to clamp); a finished slot
    the host hasn't freed yet keeps committing, so its frontier clamps at
    Smax - W below the strip+window allocation."""
    from .continuous import (
        _spec_accept,
        _spec_draft,
        _spec_hist_update,
        _spec_tok0,
    )

    K = spec_k
    W = K + 1
    Smax = cache.k.shape[2]

    def round_body(carry, key):
        logits, cache, hist, rej = carry
        k_tok, k_acc = jax.random.split(key)
        tok0 = _spec_tok0(logits, k_tok, samp, active, pad_id, rej,
                          greedy_only)
        chunk, drafts = _spec_draft(hist, tok0, cache.length, K, False)
        logits_w, saved, kv_new = _extend_forward(params, cfg, chunk,
                                                  cache, mesh=mesh)
        n_commit, new_logits, rej = _spec_accept(
            logits_w.astype(jnp.float32), drafts, logits, active, K, samp,
            k_acc, greedy_only)
        hist = _spec_hist_update(hist, chunk, cache.length, n_commit)
        cache = _commit(cfg, cache, saved, kv_new, n_commit)
        cache = cache._replace(length=jnp.minimum(cache.length, Smax - W))
        if mesh is not None:
            from ..parallel.sharding import pin_next_cache

            cache = pin_next_cache(cache, mesh, cfg.num_key_value_heads,
                                   cfg.linear_num_value_heads)
        return (new_logits, cache, hist, rej), (chunk, n_commit)

    rng, sub = jax.random.split(rng)
    keys = jax.random.split(sub, rounds)
    (last_logits, cache, hist, rej_tok), (chunks, commits) = jax.lax.scan(
        round_body, (last_logits, cache, hist, rej_tok), keys)
    return chunks, commits, last_logits, cache, hist, rej_tok, rng


class Qwen3NextContinuousEngine:
    def __init__(self, params, cfg: Qwen3NextConfig, num_slots: int = 8,
                 max_len: int = 4096, sp: SamplingParams | None = None,
                 mesh=None, prompt_buckets=(128, 256, 512, 1024, 2048),
                 seed: int = 0, attn_impl: str | None = None,
                 spec_decode: int = 0, prefill_chunk_tokens: int = 0, **_):
        if cfg.kv_quant:
            raise ValueError(
                "Qwen3NextContinuousEngine carries a contiguous bf16 hybrid "
                "cache; cfg.kv_quant is batch-mode only (ChatEngine guards "
                "this — a direct construction must pass a bf16 cfg)")
        if mesh is not None:
            from ..parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        self.num_slots = N = num_slots
        self.max_len = max_len
        self.sp = sp or SamplingParams(eos_token_ids=(cfg.eos_token_id,),
                                       pad_token_id=cfg.pad_token_id)
        self.prompt_buckets = tuple(b for b in sorted(prompt_buckets)
                                    if b <= max_len) or (max_len,)
        self.spec_decode = spec_decode
        # spec verify windows write W tokens at the frontier BEFORE
        # acceptance — the KV strips (and hist rows) carry W slack
        W = spec_decode + 1 if spec_decode else 0
        G = cfg.num_groups
        P1 = cfg.full_attention_interval - 1
        K = cfg.linear_conv_kernel_dim
        dt = jnp.dtype(cfg.dtype)
        self.cache = Qwen3NextCache(
            conv=jnp.zeros((G, P1, N, K - 1, cfg.conv_dim), dt),
            rec=jnp.zeros((G, P1, N, cfg.linear_num_value_heads,
                           cfg.linear_key_head_dim,
                           cfg.linear_value_head_dim), jnp.float32),
            k=jnp.zeros((G, N, max_len + W, cfg.num_key_value_heads,
                         cfg.head_dim), dt),
            v=jnp.zeros((G, N, max_len + W, cfg.num_key_value_heads,
                         cfg.head_dim), dt),
            length=jnp.zeros((N,), jnp.int32))
        self.last_logits = jnp.zeros((N, cfg.vocab_size), jnp.float32)
        self.hist = (jnp.full((N, max_len + W), self.sp.pad_token_id,
                              jnp.int32) if spec_decode else None)
        self._spec_rej = (jnp.full((N,), -1, jnp.int32) if spec_decode
                          else None)
        self.spec_stats = {"spec_dispatches": 0, "spec_rounds": 0,
                           "spec_tokens": 0, "plain_dispatches": 0}
        if mesh is not None:
            from ..parallel.sharding import next_cache_shardings, replicated

            # persistent device state must live on the mesh or every jit
            # raises "incompatible devices" (CLAUDE.md r4). The cache takes
            # the judge-scale layout (KV strips + DeltaNet value heads on
            # "tp"); _admit_jit/_step_jit pin their outputs to the same
            # layout so it never bounces.
            sh = next_cache_shardings(mesh, cfg.num_key_value_heads,
                                      cfg.linear_num_value_heads)
            self.cache = Qwen3NextCache(**{
                n: jax.device_put(getattr(self.cache, n), sh[n])
                for n in self.cache._fields})
            rep = replicated(mesh)
            self.last_logits = jax.device_put(self.last_logits, rep)
            if spec_decode:
                self.hist = jax.device_put(self.hist, rep)
                self._spec_rej = jax.device_put(self._spec_rej, rep)
        self.rng = jax.random.PRNGKey(seed)
        # chunked prefill: long prompts prefill one chunk per step() call,
        # interleaved with decode (bounded inter-token latency for active
        # streams). The in-flight prompt accumulates in a B=1 sub-cache
        # that only touches the batched cache at install time.
        self.prefill_chunk_tokens = prefill_chunk_tokens
        self.prefilling = np.zeros((N,), bool)
        self._pending_prefill: list[dict] = []
        self.slot_req: list[Optional[_Req]] = [None] * N
        self.slot_temp = np.full((N,), 1.0, np.float32)
        self.slot_top_p = np.ones((N,), np.float32)
        self.slot_top_k = np.zeros((N,), np.int32)
        self.slot_do_sample = np.zeros((N,), bool)
        self._next_rid = 0
        self._lock = threading.Lock()
        self.decode_window = 1
        # lock-FREE cancellation (GIL-atomic set): ChatEngine's stop
        # watcher calls request_cancel from inside step()'s tok_cb, i.e.
        # while step() holds self._lock — a locked cancel would deadlock
        # the run loop (the transformer engine learned this first,
        # continuous.py request_cancel)
        self._cancelled: set[int] = set()

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def submit(self, prompt_ids, max_new_tokens: int = 128,
               done_cb: Callable | None = None,
               sp: SamplingParams | None = None,
               tok_cb: Callable | None = None, **_) -> Optional[int]:
        with self._lock:
            slot = next((i for i, r in enumerate(self.slot_req)
                         if r is None), None)
            if slot is None:
                return None
            ids = np.asarray(prompt_ids, np.int32)
            room = max(self.max_len - max_new_tokens - 1, 8)
            if ids.shape[0] > room:
                ids = ids[-room:]   # keep recent context (TRL truncation)
            true_len = int(ids.shape[0])
            # clamp the budget to the slot's real room: without this, an
            # over-budget request hits the idle-slot frontier clamp and
            # streams garbage from the frozen position instead of ending
            max_new_tokens = max(
                min(max_new_tokens, self.max_len - true_len - 1), 1)
            bucket = next((b for b in self.prompt_buckets if b >= true_len),
                          self.max_len)
            ck = self.prefill_chunk_tokens
            if ck and true_len > ck:
                # chunked: defer to the step() loop (one chunk per step,
                # interleaved with decode); the slot stays masked out of
                # decode/spec until the accumulator installs
                n_chunks = -(-bucket // ck)
                width = n_chunks * ck
                rows = np.full((1, width), self.cfg.pad_token_id, np.int32)
                rows[0, :true_len] = ids
                cfg = self.cfg
                G, P1 = cfg.num_groups, cfg.full_attention_interval - 1
                K = cfg.linear_conv_kernel_dim
                dt = jnp.dtype(cfg.dtype)
                sub = Qwen3NextCache(
                    conv=jnp.zeros((G, P1, 1, K - 1, cfg.conv_dim), dt),
                    rec=jnp.zeros((G, P1, 1, cfg.linear_num_value_heads,
                                   cfg.linear_key_head_dim,
                                   cfg.linear_value_head_dim), jnp.float32),
                    k=jnp.zeros((G, 1, width, cfg.num_key_value_heads,
                                 cfg.head_dim), dt),
                    v=jnp.zeros((G, 1, width, cfg.num_key_value_heads,
                                 cfg.head_dim), dt),
                    length=jnp.zeros((1,), jnp.int32))
                if self.mesh is not None:
                    from ..parallel.sharding import replicated

                    rep = replicated(self.mesh)
                    sub = Qwen3NextCache(*(jax.device_put(c, rep)
                                           for c in sub))
                self._pending_prefill.append({
                    "slot": slot, "rows": rows, "true_len": true_len,
                    "bucket": min(bucket, width), "done": 0, "sub": sub,
                    "ids": ids})
                self.prefilling[slot] = True
            else:
                padded = np.full((1, bucket), self.cfg.pad_token_id,
                                 np.int32)
                padded[0, :true_len] = ids
                logits, self.cache = _admit_jit(
                    self.params, self.cfg, self.cache, jnp.int32(slot),
                    jnp.asarray(padded), jnp.int32(true_len), bucket,
                    self.mesh)
                self.last_logits = self.last_logits.at[slot].set(logits)
                self._write_hist_row(slot, ids, true_len)
            rsp = sp or self.sp
            self.slot_temp[slot] = max(rsp.temperature, 1e-6)
            self.slot_top_p[slot] = rsp.top_p
            self.slot_top_k[slot] = rsp.top_k
            self.slot_do_sample[slot] = rsp.do_sample
            rid = self._next_rid
            self._next_rid += 1
            self.slot_req[slot] = _Req(rid, max_new_tokens, done_cb, tok_cb,
                                       tuple(rsp.eos_token_ids))
            return rid

    def request_cancel(self, rid: int) -> None:
        # no lock: called from tok_cb inside step()'s locked region
        self._cancelled.add(rid)

    def _write_hist_row(self, slot: int, ids, true_len: int) -> None:
        """Reset the spec-drafting history row for a newly admitted request
        ([prompt | pad...]). Every admission path must do this or drafting
        reads the previous occupant's tokens."""
        if self.hist is None:
            return
        row = np.full((self.hist.shape[1],), self.sp.pad_token_id, np.int32)
        row[:true_len] = ids
        self.hist = self.hist.at[slot].set(jnp.asarray(row))
        self._spec_rej = self._spec_rej.at[slot].set(-1)

    def _advance_prefill(self) -> None:
        """Chunked prefill: advance the oldest pending prompt by one chunk
        (called once per step() — prefill interleaves with decode, bounding
        active streams' inter-token latency by one chunk)."""
        if not self._pending_prefill:
            return
        st = self._pending_prefill[0]
        ck = self.prefill_chunk_tokens
        start = st["done"]
        chunk = st["rows"][:, start:start + ck]
        logits, st["sub"] = _prefill_chunk_jit(
            self.params, self.cfg, st["sub"], jnp.asarray(chunk),
            jnp.int32(start), jnp.int32(st["true_len"]), ck, self.mesh)
        st["done"] = start + ck
        if st["done"] >= st["true_len"]:
            slot = st["slot"]
            self.cache = _install_jit(self.cfg, self.cache, jnp.int32(slot),
                                      st["sub"], jnp.int32(st["true_len"]),
                                      st["bucket"], self.mesh)
            self.last_logits = self.last_logits.at[slot].set(logits)
            self._write_hist_row(slot, st["ids"], st["true_len"])
            self.prefilling[slot] = False
            self._pending_prefill.pop(0)

    def step(self, steps: int = 1) -> list[tuple[int, list[int]]]:
        """Advance all slots `steps` tokens; return finished (rid, toks)."""
        finished: list[tuple[int, list[int]]] = []
        if self.spec_decode:
            return self._step_spec(max(steps, 1))
        for _ in range(max(steps, 1)):
            if not self.num_active:
                break
            with self._lock:
                self._advance_prefill()   # one chunk per step, interleaved
                if not any(r is not None and not self.prefilling[i]
                           for i, r in enumerate(self.slot_req)):
                    continue   # every active slot is still mid-prefill
                tok, self.last_logits, self.cache, self.rng = _step_jit(
                    self.params, self.cache, self.last_logits, self.rng,
                    jnp.asarray(self.slot_temp),
                    jnp.asarray(self.slot_top_p),
                    jnp.asarray(self.slot_top_k),
                    jnp.asarray(self.slot_do_sample),
                    self.cfg, self.mesh)
                tok_h = np.asarray(tok)
                for i, req in enumerate(self.slot_req):
                    if req is None or self.prefilling[i]:
                        continue
                    if req.rid in self._cancelled:
                        self._cancelled.discard(req.rid)
                        req.budget = 0
                    if req.budget > 0:
                        t = int(tok_h[i])
                        req.toks.append(t)
                        req.budget -= 1
                        if req.tok_cb:
                            req.tok_cb(req.rid, t)
                        if t in req.eos:
                            req.budget = 0
                    if req.budget <= 0:
                        finished.append((req.rid, req.toks))
                        if req.done_cb:
                            req.done_cb(req.rid, req.toks)
                        self.slot_req[i] = None
        return finished

    def _step_spec(self, rounds: int) -> list[tuple[int, list[int]]]:
        """One dispatch of `rounds` speculative verify rounds for all
        slots: each round emits 1 + accepted tokens per slot (a dispatch
        advances every slot by at least `rounds` tokens, up to
        rounds*(K+1)). Same host-side emission/EOS/budget/cancel
        bookkeeping as the plain loop; tokens past a slot's EOS or budget
        inside the window are discarded (the slot frees; the device-side
        over-advance is confined to its own rows and overwritten at the
        next admission)."""
        if not self.num_active:
            return []
        finished: list[tuple[int, list[int]]] = []
        with self._lock:
            self._advance_prefill()   # one chunk per dispatch, interleaved
            active = np.asarray([r is not None for r in self.slot_req]) \
                & ~self.prefilling
            if not active.any():
                return []   # every active slot is still mid-prefill
            greedy_only = not bool(self.slot_do_sample[active].any())
            samp = (jnp.asarray(self.slot_temp),
                    jnp.asarray(self.slot_top_p),
                    jnp.asarray(self.slot_top_k),
                    jnp.asarray(self.slot_do_sample))
            (chunks, commits, self.last_logits, self.cache, self.hist,
             self._spec_rej, self.rng) = _spec_step_jit(
                self.params, self.cfg, self.cache, self.hist,
                self.last_logits, self._spec_rej, jnp.asarray(active),
                samp, self.sp.pad_token_id, self.rng, self.spec_decode,
                rounds, greedy_only, self.mesh)
            chunks = np.asarray(chunks)     # [R, N, W]
            commits = np.asarray(commits)   # [R, N]
            self.spec_stats["spec_dispatches"] += 1
            self.spec_stats["spec_rounds"] += int(commits.shape[0])
            self.spec_stats["spec_tokens"] += int(commits.sum())
            for r in range(chunks.shape[0]):
                for i, req in enumerate(self.slot_req):
                    if req is None or not active[i]:
                        continue
                    if req.rid in self._cancelled:
                        self._cancelled.discard(req.rid)
                        req.budget = 0
                    for j in range(int(commits[r, i])):
                        if req.budget <= 0:
                            break
                        t = int(chunks[r, i, j])
                        req.toks.append(t)
                        req.budget -= 1
                        if req.tok_cb:
                            req.tok_cb(req.rid, t)
                        if t in req.eos:
                            req.budget = 0
                    if req.budget <= 0:
                        finished.append((req.rid, req.toks))
                        if req.done_cb:
                            req.done_cb(req.rid, req.toks)
                        self.slot_req[i] = None
        return finished

    def run_loop(self, request_queue, stop: threading.Event,
                 idle_sleep: float = 0.005, admit_per_step: int = 1):
        from .continuous import _run_loop_impl

        return _run_loop_impl(self, request_queue, stop, idle_sleep,
                              admit_per_step=admit_per_step)
