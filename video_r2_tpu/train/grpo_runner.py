"""GRPO runner: host orchestration of one generation->score->train cycle.

The reference interleaves this inside a forked HF Trainer
(grpo_trainer.py:747-1030 + compute_loss buffering :1066-1083). Here it is an
explicit loop on the single JAX controller:

  sample B prompts -> preprocess vision ONCE per prompt -> repeat G x
  -> engine rollouts (shared params, no ZeRO gather) -> EOS masking
  -> reward fns (host python; judge HTTP off-mesh) -> group advantages
  -> ref/old logps (jitted) -> mu jitted train steps on the buffered batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.chat import expand_vision_placeholders, pack_prompts, render_messages
from ..engine.generate import generate
from ..engine.sampling import SamplingParams
from ..models.config import ModelConfig
from ..models.mrope import get_rope_index
from ..models.vision import plan_vision_layout, vit_forward
from ..rewards.embedding import embedder_tag as _embedder_tag
from ..utils.profiling import PhaseTimer, profiling_phase
from ..video import VideoPreprocessConfig, fetch_image, fetch_video
from .grpo import (
    GRPOConfig,
    combine_rewards,
    completion_mask_from_ids,
    compute_advantages,
    per_token_logps,
)


@dataclass
class PreparedPrompt:
    messages: list[dict]
    input_ids: np.ndarray            # [S] unpadded
    video_embeds: Any | None         # [N, H] device array (merged ViT out)
    video_grid_thw: list[tuple[int, int, int]]
    second_per_grid_ts: list[float]
    sample: dict                     # original dataset record fields


class GRPORunner:
    def __init__(self, params, cfg: ModelConfig, gcfg: GRPOConfig, tokenizer,
                 reward_funcs: list[Callable], reward_func_names: list[str],
                 step_fn, ref_params=None, judge=None, embedder=None,
                 video_cfg: VideoPreprocessConfig | None = None,
                 attn_impl: str = "xla", act_quant: str | None = None,
                 kv_quant: str | None = None,
                 seed: int = 0, mesh=None,
                 metrics_logger=None, params_from_state=None):
        self.params = params
        self.ref_params = ref_params
        # with a mesh, params are FSDP/TP-sharded and rollouts run sharded
        # generation on the same arrays — no ZeRO-3 gather-for-generation
        # (grpo_trainer.py:779-786 disappears by construction)
        self.mesh = mesh
        self.cfg = cfg
        self.gcfg = gcfg
        self.tok = tokenizer
        self.reward_funcs = reward_funcs
        self.reward_func_names = reward_func_names
        self.step_fn = step_fn
        self.judge = judge
        self.embedder = embedder
        self.video_cfg = video_cfg or VideoPreprocessConfig()
        self.attn_impl = attn_impl
        # "int8": W8A8 rollout prefill on the integer MXU (opt-in — rollout
        # sampling then sees slightly different logits than the bf16 loss
        # forward, the same class of policy mismatch as the reference's
        # vLLM-rollout setups)
        self.act_quant = act_quant
        # "int8": int8 rollout KV cache (QuantKVCache) — 2x rollout batch
        # headroom; same policy-mismatch class as act_quant above
        self.kv_quant = kv_quant
        self._seed = seed
        self.timer = PhaseTimer()
        self.metrics_logger = metrics_logger
        self._rollout_eng = None   # lazy PagedContinuousEngine ("paged" backend)
        # maps a train state to rollout/policy params; LoRA-GRPO passes
        # lambda s: attach_lora(base, s.lora, lcfg) so rollouts and the loss
        # see base+adapters while ref_params stays the bare base
        self.params_from_state = params_from_state or (lambda s: s.params)

    # ------------------------------------------------------------------
    def prepare_prompt(self, sample: dict, params) -> PreparedPrompt:
        """Render messages, preprocess vision once, tokenize."""
        messages = sample["prompt"]
        text = render_messages(messages, add_generation_prompt=True,
                               default_system=None)
        # Images ride the video path as 1-frame clips: get_rope_index's image
        # branch (t=1, second_per_grid=0) is numerically identical to a video
        # grid with t=1 and spg=0, and the rollout engine merges ONE vision
        # token type — so every visual becomes a "video" feature here.
        from ..engine.chat import IMAGE_PAD, VIDEO_PAD

        feats = []
        spgs = []
        for m in messages:
            if isinstance(m.get("content"), list):
                for ele in m["content"]:
                    if ele.get("type") == "video" or "video" in ele:
                        f = fetch_video(ele, self.video_cfg)
                        feats.append(f)
                        spgs.append(f.second_per_grid_t)
                    elif ele.get("type") == "image" or "image" in ele:
                        im = fetch_image(ele)
                        feats.append(im)
                        spgs.append(0.0)
        text = text.replace(IMAGE_PAD, VIDEO_PAD)
        embeds = None
        grids = [f.grid_thw for f in feats]
        if feats:
            patches = np.concatenate([f.patches for f in feats])
            layout = plan_vision_layout(grids, self.cfg.vision)
            embeds = vit_forward(params["visual"], self.cfg.vision,
                                 jnp.asarray(patches), layout)
            text = expand_vision_placeholders(
                text, [f.patches.shape[0] // 4 for f in feats], [])
        ids = np.asarray(self.tok.encode(text), np.int32)
        if ids.shape[0] > self.gcfg.max_prompt_length:
            ids = ids[-self.gcfg.max_prompt_length:]  # left truncation (TRL parity)
        return PreparedPrompt(messages, ids, embeds, grids, spgs, sample)


    def rollout_and_score(self, samples: list[dict]):
        """One generation batch: returns (device_batch dict, metrics dict)."""
        G = self.gcfg.num_generations
        prepared = [self.prepare_prompt(s, self.params) for s in samples]

        # repeat each prompt G times, consecutive (RepeatSampler layout)
        token_lists = [list(p.input_ids) for p in prepared for _ in range(G)]
        packed = pack_prompts(token_lists, pad_id=self.cfg.pad_token_id)
        B = packed.input_ids.shape[0]

        # positions: per repeated row
        vid_grids = [g for p in prepared for _ in range(G) for g in p.video_grid_thw]
        spg = [s for p in prepared for _ in range(G) for s in p.second_per_grid_ts]
        mask = (np.arange(packed.input_ids.shape[1])[None, :]
                < packed.lengths[:, None]).astype(np.int64)
        pos, deltas = get_rope_index(
            packed.input_ids, self.cfg,
            video_grid_thw=np.asarray(vid_grids) if vid_grids else None,
            second_per_grid_ts=np.asarray(spg) if spg else None,
            attention_mask=mask)

        embeds = None
        if any(p.video_embeds is not None for p in prepared):
            embeds = jnp.concatenate(
                [p.video_embeds for p in prepared for _ in range(G)
                 if p.video_embeds is not None])

        sp = SamplingParams(
            do_sample=True, temperature=self.gcfg.temperature,
            top_p=self.gcfg.top_p, top_k=self.gcfg.top_k,
            max_new_tokens=self.gcfg.max_completion_length,
            eos_token_ids=(self.cfg.eos_token_id,),
            pad_token_id=self.cfg.pad_token_id)
        self._seed += 1
        with profiling_phase(self.timer, "rollout_generate"):
            if self.gcfg.rollout_backend == "paged":
                completion_ids, gen_lengths = self._rollout_continuous(
                    token_lists, prepared, G, sp)
            else:
                res = generate(self.params, self.cfg, packed.input_ids,
                               packed.lengths, sp, position_ids=pos,
                               rope_deltas=deltas[:, 0], vision_embeds=embeds,
                               vision_token_id=self.cfg.video_token_id,
                               seed=self._seed, attn_impl=self.attn_impl,
                               act_quant=self.act_quant,
                               kv_quant=self.kv_quant, mesh=self.mesh,
                               spec_decode=(0 if self.mesh is not None else
                                            self.gcfg.rollout_spec_decode))
                completion_ids, gen_lengths = res.sequences, res.lengths

        cmask = completion_mask_from_ids(
            completion_ids, self.cfg.eos_token_id,
            self.gcfg.mask_truncated_completions)
        completions_text = [
            self.tok.decode(completion_ids[b][: gen_lengths[b]],
                            skip_special_tokens=True)
            for b in range(B)]
        completions = [[{"role": "assistant", "content": t}]
                       for t in completions_text]

        # rewards (host)
        reward_kwargs = {
            "prompts": [p.messages for p in prepared for _ in range(G)],
            "assistant": [{"content": p.sample.get("assistant", "")}
                          for p in prepared for _ in range(G)],
            "temporal_grounding": [p.sample.get("temporal_grounding", {})
                                   for p in prepared for _ in range(G)],
            "temporal_captions": [p.sample.get("temporal_captions", {})
                                  for p in prepared for _ in range(G)],
            "judge": self.judge,
            "embedder": self.embedder,
            "buffer_seconds": self.gcfg.buffer_seconds,
            "similarity_threshold": self.gcfg.similarity_threshold,
            "length_reinforcement_buffer": self.gcfg.length_reinforcement_buffer,
        }
        F = len(self.reward_funcs)
        rewards_per_func = np.full((B, F), np.nan)
        for i, (fn, name) in enumerate(zip(self.reward_funcs,
                                           self.reward_func_names)):
            with profiling_phase(self.timer, f"reward/{name}"):
                out = fn(completions=completions, **reward_kwargs)
            rewards_per_func[:, i] = [np.nan if r is None else r for r in out]

        # all-NaN reward warning (grpo_trainer.py:894-903): a row no reward
        # function scored contributes 0 via nansum — surface it loudly
        all_nan = np.isnan(rewards_per_func).all(axis=1)
        if all_nan.any():
            import logging

            logging.getLogger(__name__).warning(
                "All reward functions returned None for %d/%d completions "
                "(rows %s) — they contribute zero reward",
                int(all_nan.sum()), len(all_nan),
                np.nonzero(all_nan)[0][:8].tolist())

        rewards = combine_rewards(rewards_per_func, self.reward_func_names,
                                  self.gcfg)
        advantages = compute_advantages(rewards, rewards_per_func,
                                        self.reward_func_names, self.gcfg)

        # Loss layout: LEFT-padded prompt + completion (TRL parity). The
        # engine right-pads for generation, but the loss reads the hidden at
        # column P-1 to predict the first completion token — with right
        # padding that column is a pad slot for short prompts. Left padding
        # makes [.. pad | prompt | completion] contiguous for every row.
        P = packed.input_ids.shape[1]
        C = completion_ids.shape[1]
        left_ids = np.full_like(packed.input_ids, self.cfg.pad_token_id)
        left_mask = np.zeros((B, P), np.int32)
        for b in range(B):
            L = int(packed.lengths[b])
            left_ids[b, P - L:] = packed.input_ids[b, :L]
            left_mask[b, P - L:] = 1
        left_pos, left_deltas = get_rope_index(
            left_ids, self.cfg,
            video_grid_thw=np.asarray(vid_grids) if vid_grids else None,
            second_per_grid_ts=np.asarray(spg) if spg else None,
            attention_mask=left_mask)
        full_ids = np.concatenate([left_ids, completion_ids], axis=1)
        full_mask = np.concatenate([left_mask, cmask], axis=1)
        # completion positions: P + step + delta (delta accounts for padding)
        comp_pos = (P + np.arange(C)[None, :] + left_deltas)  # [B, C]
        full_pos = np.concatenate(
            [left_pos, np.broadcast_to(comp_pos[None], (3, B, C))], axis=2)

        batch = {
            "input_ids": jnp.asarray(full_ids),
            "position_ids": jnp.asarray(full_pos),
            "attention_mask": jnp.asarray(full_mask),
            "completion_mask": jnp.asarray(cmask),
            "advantages": jnp.asarray(advantages, jnp.float32),
        }
        if embeds is not None:
            batch["video_embeds"] = embeds

        # ref / old logps (no grad)
        if self.gcfg.beta != 0.0:
            assert self.ref_params is not None, "beta>0 requires ref_params"
            batch["ref_per_token_logps"] = self._logps(self.ref_params, batch, C)
        if self.gcfg.num_iterations > 1:
            batch["old_per_token_logps"] = self._logps(self.params, batch, C)

        metrics = {
            "reward_mean": float(np.mean(rewards)),
            "reward_std": float(np.std(rewards)),
            # provenance: TAR similarity via MiniLM vs the offline hashing
            # fallback — the two are NOT comparable (rewards/embedding.py)
            "embedder": _embedder_tag(self.embedder) if self.embedder else "none",
            "completion_len_mean": float(cmask.sum(1).mean()),
            "completion_len_min": float(cmask.sum(1).min()),
            "completion_len_max": float(cmask.sum(1).max()),
            "clipped_ratio": float(
                1 - (completion_ids == self.cfg.eos_token_id).any(1).mean()),
        }
        for i, name in enumerate(self.reward_func_names):
            metrics[f"rewards/{name}/mean"] = float(
                np.nanmean(rewards_per_func[:, i]))
            metrics[f"rewards/{name}/std"] = float(
                np.nanstd(rewards_per_func[:, i]))
        # completion-table logging (rich/wandb table parity)
        if self.metrics_logger is not None:
            self.metrics_logger.log_completions(
                int(self._seed),
                [str(p.messages) for p in prepared for _ in range(G)],
                completions_text,
                {name: list(rewards_per_func[:, i])
                 for i, name in enumerate(self.reward_func_names)})
        return batch, metrics

    # ------------------------------------------------------------------
    def _get_rollout_engine(self, max_prompt: int, num_requests: int):
        from ..engine.continuous import PagedContinuousEngine

        # decode-window margin: without it the multi-step window size
        # clamps (w -> w/2 -> ...) as slots near max_len, recompiling a
        # decode variant per size mid-rollout
        need = (max_prompt + self.gcfg.max_completion_length + 1
                + 2 * self.gcfg.rollout_decode_steps)
        page = 128
        need = -(-need // page) * page
        if self._rollout_eng is not None and self._rollout_eng.max_len >= need:
            self._rollout_eng.params = self.params  # track trained params
            return self._rollout_eng
        buckets, b = [], page
        while b < need:
            buckets.append(b)
            b *= 2
        buckets.append(need)
        self._rollout_eng = PagedContinuousEngine(
            self.params, self.cfg, num_slots=min(num_requests, 32),
            max_len=need,
            sp=SamplingParams(eos_token_ids=(self.cfg.eos_token_id,),
                              pad_token_id=self.cfg.pad_token_id),
            attn_impl=self.attn_impl, prompt_buckets=tuple(buckets),
            page_size=page, seed=self._seed,
            kv_quant=self.gcfg.rollout_kv_quant,
            spec_decode=self.gcfg.rollout_spec_decode)
        return self._rollout_eng

    def _rollout_continuous(self, token_lists, prepared, G, sp):
        """Rollouts on the paged continuous engine: each of the B x G
        requests streams independently, early-EOS rollouts free pages for
        the rest (VERDICT r1 #6). Returns (completion_ids [B,C], lengths)."""
        B = len(token_lists)
        C = self.gcfg.max_completion_length
        eng = self._get_rollout_engine(max(len(t) for t in token_lists), B)
        out_tokens: list = [None] * B
        pending = list(range(B))[::-1]
        rid_to_b: dict[int, int] = {}
        while pending or eng.num_active:
            while pending:
                bi = pending[-1]
                p = prepared[bi // G]
                rid = eng.submit(
                    token_lists[bi], max_new_tokens=C, sp=sp,
                    vision_embeds=p.video_embeds,
                    video_grid_thw=p.video_grid_thw or None,
                    second_per_grid_ts=(p.second_per_grid_ts
                                        if p.video_grid_thw else None))
                if rid is None:
                    break
                pending.pop()
                rid_to_b[rid] = bi
                # the group's other rollouts share this prompt — FORK them
                # off the fresh prefill (prefix-shared pages + CoW): one
                # prefill per prompt instead of per rollout
                sibs = [x for x in reversed(pending) if x // G == bi // G]
                if sibs:
                    for frid in eng.fork(rid, n=len(sibs)):
                        sb = sibs.pop(0)
                        pending.remove(sb)
                        rid_to_b[frid] = sb
            if eng.num_active:
                # multi-step window: rollouts are throughput-bound, and the
                # per-dispatch host latency dominates single-step decoding
                for rid, toks in eng.step(steps=self.gcfg.rollout_decode_steps):
                    out_tokens[rid_to_b[rid]] = toks
        completion_ids = np.full((B, C), self.cfg.pad_token_id, np.int64)
        lengths = np.zeros((B,), np.int64)
        for bi, toks in enumerate(out_tokens):
            completion_ids[bi, : len(toks)] = toks
            lengths[bi] = len(toks)
        return completion_ids, lengths

    def _logps(self, params, batch, C):
        return jax.lax.stop_gradient(per_token_logps(
            params, self.cfg, batch["input_ids"], batch["position_ids"],
            batch["attention_mask"], C, self.gcfg.temperature,
            self.gcfg.logp_chunk_size,
            video_embeds=batch.get("video_embeds"),
            attn_impl=self.attn_impl))

    # ------------------------------------------------------------------
    def train_cycle(self, state, samples: list[dict]):
        """One full GRPO cycle: rollout once, mu optimizer steps."""
        with profiling_phase(self.timer, "generate_and_score"):
            batch, gen_metrics = self.rollout_and_score(samples)
        shard_batch = getattr(self.step_fn, "shard_batch", None)
        if shard_batch is not None:
            batch = shard_batch(batch)
        metrics = dict(gen_metrics)
        with profiling_phase(self.timer, "optimize"):
            for _ in range(self.gcfg.num_iterations):
                state, step_metrics = self.step_fn(state, batch)
                self.params = self.params_from_state(state)
        metrics.update({k: float(v) for k, v in step_metrics.items()})
        metrics.update(self.timer.metrics())
        return state, metrics
