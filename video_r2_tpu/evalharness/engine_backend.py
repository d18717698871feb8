"""Engine-backed eval generation (the qwen2_5_vl adapter equivalent).

Batching strategy: sort instances by (video token count, prompt length) so
padded shapes bucket tightly (the reference sorts by length —
qwen2_5_vl.py:184-199), process in fixed-size batches, restore order.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..engine.chat import expand_vision_placeholders, pack_prompts, render_messages
from ..engine.generate import generate
from ..engine.sampling import SamplingParams
from ..models.mrope import get_rope_index
from ..models.vision import plan_vision_layout, vit_forward
from ..video import VideoPreprocessConfig, fetch_video
from ..video.geometry import plan_video_geometry
from .api import Instance


class EngineBackend:
    def __init__(self, params, cfg, tokenizer, max_num_frames=128,
                 max_pixels=151200, min_pixels=100352, fps=None, batch_size=8,
                 system_prompt="You are a helpful assistant.",
                 attn_impl="xla", act_quant=None, kv_quant=None, seed=0,
                 engine_mode="batch", engine_max_len=None, page_size=128,
                 window_divisible=False, vit_act_quant=None,
                 prefill_rows="auto", decode_steps=8,
                 patch_dtype="float32", mesh=None, spec_decode=0):
        # mesh: multi-chip eval — params shard per parallel.sharding rules
        # (FSDP/TP) and generate() runs sharded; the ViT executes on the
        # mesh via GSPMD from the weight shardings. The reference evals on
        # 8 GPUs via accelerate (run_all.sh:29); here one controller drives
        # the whole mesh, so rank sharding/padding/barriers don't exist.
        if mesh is not None:
            # engine_mode="paged" with a mesh runs the paged continuous
            # engine TP-sharded (kv heads over "tp"; the engine shards the
            # params/pools itself); "batch" shards here for generate()
            from ..parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.max_num_frames = max_num_frames
        self.max_pixels = max_pixels
        self.min_pixels = min_pixels
        self.fps = fps
        self.batch_size = batch_size
        self.system_prompt = system_prompt
        self.attn_impl = attn_impl
        self.act_quant = act_quant  # "int8": W8A8 prefill (integer MXU)
        # "int8": W8A8 inside the ViT too (compute-bound like prefill;
        # ~2x on the integer MXU). Changes vision activations -> opt-in.
        self.vit_act_quant = vit_act_quant
        self.kv_quant = kv_quant    # "int8": quantized KV cache (2x batch headroom)
        self.seed = seed
        # patch_dtype="float16" halves the host->device patch transfer at
        # the cost of rounding tower inputs to a 10-bit mantissa before the
        # (f32-promoted) patch-embed matmul — a small numerics shift, so
        # like window_divisible it is OPT-IN; the default stays
        # reference-exact f32
        self.vcfg = VideoPreprocessConfig(patch_dtype=patch_dtype)
        # "paged": run requests through PagedContinuousEngine (continuous
        # batching over the paged KV pool) instead of static batches — short
        # answers free their slot immediately, so mixed-length eval batches
        # don't decode at the longest sample's length
        self.engine_mode = engine_mode
        self.engine_max_len = engine_max_len
        self.page_size = page_size
        # spec_decode=K: speculative decoding — eval generation is GREEDY
        # and answers quote options/subtitles, the n-gram lookup's best
        # workload. Wired into BOTH engine modes: the paged continuous
        # engine's per-slot frontiers, and batch generate's while_loop
        # (token-exact by construction; composes with prefill_chunk,
        # kv_quant, and a mesh — tests/test_eval_engine_integration.py::
        # test_engine_model_eval_batch_spec_decode)
        self.spec_decode = spec_decode
        # snap resize targets to 112-px ViT windows: zero window padding in
        # the ViT and far fewer compile-shape buckets (video/geometry.py
        # snap_to_window). Changes input resolution inside the same pixel
        # budget -> off by default for reference-exact preprocessing.
        self.window_divisible = window_divisible
        # batch-chunked prefill: "auto" picks the largest row-chunk whose
        # token count stays under ~8k (full-batch multimodal prefill OOMs a
        # single 16 GB chip at B=16 x ~1.5k-token prompts — the MLP
        # intermediates are [B*S, 18944])
        self.prefill_rows = prefill_rows
        # paged mode: decode-tokens per dispatch (multi-step scheduling);
        # eval has no inter-token latency requirement, so window freely
        self.decode_steps = decode_steps
        self._cont = None
        # incremental response persistence (runner.CacheHook); set per call
        # by EngineModel.generate_until
        self.cache_hook = None

    def _video_ele(self, visual) -> dict:
        ele = {"min_pixels": self.min_pixels, "max_pixels": self.max_pixels}
        if isinstance(visual, str):
            ele["video"] = visual
        else:
            arr = np.asarray(visual)
            if arr.ndim == 2 or (arr.ndim == 3 and arr.shape[-1] != 3):
                # grayscale/palette/RGBA images: normalize to RGB the same
                # way the image path does (video/api.to_rgb)
                from PIL import Image

                from ..video.api import to_rgb

                arr = np.asarray(to_rgb(
                    visual if isinstance(visual, Image.Image)
                    else Image.fromarray(arr)))
            if arr.ndim == 3:
                # single image -> one temporal group (frame duplicated to
                # FRAME_FACTOR, grid t=1 — the same 1-frame-clip convention
                # GRPO prompts and _fetch_video_from_images use)
                arr = np.stack([arr, arr])
            ele["video"] = arr
            ele["video_fps"] = 1.0
        if self.fps is not None:
            ele["fps"] = self.fps
        ele["max_frames"] = self.max_num_frames
        if self.window_divisible:
            ele["window_divisible"] = True
        return ele

    def _prepare(self, inst: Instance):
        feats = []
        for visual in inst.visuals:
            ele = self._video_ele(visual)
            f = fetch_video(ele, self.vcfg)
            feats.append(f)
        messages = [{"role": "system", "content": self.system_prompt},
                    {"role": "user", "content": (
                        [{"type": "video", "video": "_"}] * len(feats)
                        + [{"type": "text", "text": inst.text}])}]
        text = render_messages(messages, default_system=None)
        text = expand_vision_placeholders(text, [f.num_tokens for f in feats], [])
        ids = self.tok.encode(text)
        return ids, feats

    @staticmethod
    def _apply_until(text: str, gen_kwargs: dict) -> str:
        """Trim at the task's stop strings (qwen2_5_vl.py:208-217,342-344:
        '\n\n' is dropped as a stopper to avoid truncating reasoning)."""
        until = gen_kwargs.get("until", [])
        if isinstance(until, str):
            until = [until]
        for term in until:
            if term and term != "\n\n":
                text = text.split(term)[0]
        return text

    def _estimate_cost(self, inst: Instance) -> tuple[int, int]:
        """Header-only (no decode) video-token estimate for shape-sorting.

        The reference sorts instances by length before batching
        (qwen2_5_vl.py:184-199) — but it can afford to preprocess first
        because torch DataLoader workers are separate processes. On one host
        core the decode must PIPELINE with device compute instead, so the
        sort key comes from cv2 header metadata (frame count / fps / native
        H x W -> plan_video_geometry), which costs ~ms per video."""
        total = 0
        for visual in inst.visuals:
            ele = self._video_ele(visual)
            try:
                if isinstance(visual, str):
                    import cv2

                    cap = cv2.VideoCapture(visual)
                    try:
                        nf = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
                        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
                        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                    finally:
                        cap.release()
                else:
                    arr = np.asarray(visual)
                    nf = 2 if arr.ndim == 3 else int(arr.shape[0])
                    h, w = int(arr.shape[-3]), int(arr.shape[-2])
                    fps = float(ele.get("video_fps", 1.0))
                geo = plan_video_geometry(ele, total_frames=max(nf, 2),
                                          video_fps=fps, native_height=h,
                                          native_width=w)
                t, gh, gw = geo.grid_thw
                total += t * gh * gw // 4
            except Exception:
                pass  # unsortable visual -> cost 0; correctness unaffected
        return (total, len(inst.text or ""))

    def generate_until(self, instances: list[Instance]) -> list[str]:
        # Group by gen_kwargs FIRST (a shape-sorted batch must not mix
        # requests with different max_new_tokens/temperature — ADVICE r1),
        # then shape-sort within each group by the cheap header estimate.
        groups: dict[str, list[int]] = {}
        for i, inst in enumerate(instances):
            key = repr(sorted((inst.gen_kwargs or {}).items()))
            groups.setdefault(key, []).append(i)
        schedule: list[tuple[list[int], dict]] = []  # (chunk idxs, gen_kwargs)
        for idxs in groups.values():
            order = sorted(idxs, key=lambda i: self._estimate_cost(instances[i]))
            gk = instances[order[0]].gen_kwargs
            if self.engine_mode == "paged":
                schedule.append((order, gk))
            else:
                for start in range(0, len(order), self.batch_size):
                    schedule.append((order[start: start + self.batch_size], gk))

        # Host preprocessing (video decode / burn-in / patchify / tokenize)
        # runs on worker threads UP TO `prefetch` instances ahead of the
        # device, in schedule order — cv2/PIL/numpy release the GIL, so the
        # next batch's decode overlaps this batch's prefill+decode on chip.
        flat = [i for chunk, _ in schedule for i in chunk]
        from ..data.prefetch import PrefetchLoader

        # VR2_DECODE_PROCS=N: decode in N forked worker PROCESSES (the
        # reference's torch-DataLoader-workers equivalent) — on multi-core
        # pod hosts the numpy patchify glue between GIL-releasing cv2 calls
        # serializes the default thread pool; _prepare is jax-free (host
        # fetch_video + tokenizer) so it is fork-safe. 0/unset = threads.
        n_procs = int(os.environ.get("VR2_DECODE_PROCS", "0") or 0)
        if (n_procs > 0
                and getattr(self.vcfg, "preprocess_backend", "host") != "host"):
            raise ValueError(
                "VR2_DECODE_PROCS requires preprocess_backend='host': "
                "forked decode workers must not touch jax/XLA "
                "(data/prefetch.py contract), and the 'device' backend "
                "runs the fused jax preprocess graph inside _prepare")
        loader = PrefetchLoader(
            ([i] for i in flat),
            lambda idx: self._prepare(instances[idx[0]]),
            num_workers=n_procs if n_procs > 0 else 4,
            prefetch=2 * self.batch_size,
            use_processes=n_procs > 0)
        results: dict[int, str] = {}
        hook = getattr(self, "cache_hook", None)
        try:
            for chunk, gk in schedule:
                if self.engine_mode == "paged":
                    results.update(self._run_continuous(loader, chunk, gk))
                else:
                    prepared = [next(loader) for _ in chunk]
                    results.update(self._run_batch(prepared, chunk, gk))
                if hook is not None:
                    # flush this batch's responses so a crash later in the
                    # task replays only what hasn't been persisted yet
                    done = [i for i in chunk if i in results]
                    hook.add_partial([instances[i] for i in done],
                                     [results[i] for i in done])
        finally:
            loader.close()
        return [results[i] for i in range(len(instances))]

    def loglikelihood(self, instances: list[Instance],
                      continuations: list[str] | None = None
                      ) -> list[tuple[float, bool]]:
        """(log P(continuation | context, visuals), is_greedy) per request —
        the lmms ABC's loglikelihood output type (api/model.py:29-50; unused
        by the 11 video benchmarks but part of the ABC surface). The
        continuation comes from `continuations[i]` or
        inst.gen_kwargs["continuation"]."""
        import jax

        from ..models.model import forward, lm_head_weight

        out = []
        for i, inst in enumerate(instances):
            cont = (continuations[i] if continuations is not None
                    else (inst.gen_kwargs or {}).get("continuation"))
            if cont is None:
                raise ValueError("loglikelihood needs a continuation per "
                                 "instance (continuations arg or "
                                 "gen_kwargs['continuation'])")
            ctx_ids, feats = self._prepare(inst)
            cont_ids = self.tok.encode(cont)
            ids = np.asarray([list(ctx_ids) + list(cont_ids)], np.int32)
            grids = [f.grid_thw for f in feats]
            spg = [f.second_per_grid_t for f in feats]
            pos, _ = get_rope_index(
                ids, self.cfg,
                video_grid_thw=np.asarray(grids) if grids else None,
                second_per_grid_ts=np.asarray(spg) if spg else None)
            patches = layout = None
            if feats:
                patches = jnp.asarray(np.concatenate(
                    [f.patches for f in feats]))
                layout = plan_vision_layout(grids, self.cfg.vision)
            hidden, _ = forward(self.params, self.cfg, jnp.asarray(ids),
                                jnp.asarray(np.asarray(pos)),
                                video_patches=patches, video_layout=layout,
                                attn_impl=self.attn_impl, return_hidden=True,
                                mesh=self.mesh)
            C = len(cont_ids)
            rows = hidden[0, len(ctx_ids) - 1: len(ctx_ids) - 1 + C]
            w = lm_head_weight(self.params, self.cfg)
            logits = (rows.astype(jnp.float32)
                      @ w.astype(jnp.float32))          # [C, V]
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            tok = jnp.asarray(np.asarray(cont_ids, np.int32))
            ll = float(logprobs[jnp.arange(C), tok].sum())
            greedy = bool((jnp.argmax(logits, axis=-1) == tok).all())
            out.append((ll, greedy))
        return out

    def _run_batch(self, prepared, indices, gen_kwargs):
        packed = pack_prompts([ids for ids, _ in prepared],
                              pad_id=self.cfg.pad_token_id)
        grids = [f.grid_thw for _, feats in prepared for f in feats]
        spg = [f.second_per_grid_t for _, feats in prepared for f in feats]
        mask = (np.arange(packed.input_ids.shape[1])[None, :]
                < packed.lengths[:, None]).astype(np.int64)
        pos, deltas = get_rope_index(
            packed.input_ids, self.cfg,
            video_grid_thw=np.asarray(grids) if grids else None,
            second_per_grid_ts=np.asarray(spg) if spg else None,
            attention_mask=mask)
        embeds = None
        if grids:
            # ViT per SAMPLE, not one batch-wide concatenated call: the
            # batch-size call's activation peak (plus the decoder executables
            # resident in HBM) OOMs a 16 GB chip at B=16 x 16 frames, and
            # per-sample shapes reuse one compiled executable across the
            # whole eval instead of compiling per batch-combination.
            embs = []
            for _, feats in prepared:
                if not feats:
                    continue
                patches = np.concatenate([f.patches for f in feats])
                layout = plan_vision_layout([f.grid_thw for f in feats],
                                            self.cfg.vision)
                embs.append(vit_forward(self.params["visual"], self.cfg.vision,
                                        jnp.asarray(patches), layout,
                                        act_quant=self.vit_act_quant))
            embeds = jnp.concatenate(embs)
        temp = float(gen_kwargs.get("temperature", 0.0))
        sp = SamplingParams(
            do_sample=gen_kwargs.get("do_sample", temp > 0),
            temperature=temp if temp > 0 else 1.0,
            top_p=float(gen_kwargs.get("top_p", 1.0)),
            top_k=int(gen_kwargs.get("top_k", 0)),
            max_new_tokens=int(gen_kwargs.get("max_new_tokens", 1024)),
            eos_token_ids=(self.cfg.eos_token_id,),
            pad_token_id=self.cfg.pad_token_id)
        self.seed += 1
        B, S = packed.input_ids.shape
        pc = self.prefill_rows
        if pc == "auto":
            pc = next((d for d in range(B, 0, -1)
                       if B % d == 0 and d * S <= 8192), 1)
        pc = pc if pc and pc < B else None
        res = generate(self.params, self.cfg, packed.input_ids, packed.lengths,
                       sp, position_ids=pos, rope_deltas=deltas[:, 0],
                       vision_embeds=embeds,
                       vision_token_id=self.cfg.video_token_id,
                       seed=self.seed, attn_impl=self.attn_impl,
                       act_quant=self.act_quant, kv_quant=self.kv_quant,
                       prefill_chunk=pc, mesh=self.mesh,
                       spec_decode=self.spec_decode)
        out = {}
        for row, idx in enumerate(indices):
            ids = res.sequences[row][: res.lengths[row]]
            out[idx] = self._apply_until(
                self.tok.decode(ids, skip_special_tokens=True), gen_kwargs)
        return out

    # -- continuous-batching path (vLLM-role eval backend, VERDICT r1 #6) ----
    def _get_cont_engine(self, needed_len: int):
        from ..engine.continuous import PagedContinuousEngine

        if self._cont is not None and self._cont.max_len >= needed_len:
            return self._cont
        max_len = self.engine_max_len or needed_len
        max_len = max(max_len, needed_len)
        ps = self.page_size
        max_len = -(-max_len // ps) * ps
        buckets = []
        b = ps
        while b < max_len:
            buckets.append(b)
            b *= 2
        buckets.append(max_len)
        self._cont = PagedContinuousEngine(
            self.params, self.cfg, num_slots=self.batch_size,
            max_len=max_len,
            sp=SamplingParams(eos_token_ids=(self.cfg.eos_token_id,),
                              pad_token_id=self.cfg.pad_token_id),
            attn_impl=self.attn_impl, prompt_buckets=tuple(buckets),
            page_size=ps, kv_quant=self.kv_quant,
            spec_decode=self.spec_decode, mesh=self.mesh)
        return self._cont

    def _run_continuous(self, loader, indices, gen_kwargs):
        """Continuous batching fed by the prefetch loader: admit instances as
        their host preprocessing completes (non-blocking poll) while active
        slots keep decoding — host decode and device decode overlap."""
        temp = float(gen_kwargs.get("temperature", 0.0))
        mnt = int(gen_kwargs.get("max_new_tokens", 1024))
        sp = SamplingParams(
            do_sample=gen_kwargs.get("do_sample", temp > 0),
            temperature=temp if temp > 0 else 1.0,
            top_p=float(gen_kwargs.get("top_p", 1.0)),
            top_k=int(gen_kwargs.get("top_k", 0)),
            max_new_tokens=mnt,
            eos_token_ids=(self.cfg.eos_token_id,),
            pad_token_id=self.cfg.pad_token_id)

        out: dict[int, str] = {}
        rid_to_idx: dict[int, int] = {}
        ready: list = []  # (prepared, idx) in schedule order
        pulled = 0
        n = len(indices)

        def pull_available():
            nonlocal pulled
            while pulled < n:
                item = loader.poll()
                if item is None:
                    break
                ready.append((item, indices[pulled]))
                pulled += 1

        def admit_ready() -> bool:
            """Admit ready instances; bursts (the common case at start-up
            and after a drain) go through submit_batch so K admissions cost
            one batched prefill dispatch per bucket group — including
            multimodal requests (embeds ride along per item)."""
            if not ready:
                return False
            # +decode-window margin so the multi-step window never clamps
            # (clamping recompiles a decode variant per window size)
            needed = max(len(ids) + mnt + 1 + 2 * self.decode_steps
                         for (ids, _), _ in ready)
            eng = self._cont
            if eng is None or needed > eng.max_len:
                if eng is not None and eng.num_active:
                    return False  # grow the pool only once drained
                # grow GEOMETRICALLY: ascending-cost admission would
                # otherwise rebuild (drain + reallocate + recompile the
                # paged executables) at every page-boundary crossing
                if eng is not None:
                    needed = max(needed, 2 * eng.max_len)
                eng = None  # drop every alias BEFORE allocating the new
                self._cont = None  # pool so the old one actually frees
                eng = self._get_cont_engine(needed)
            free_slots = eng.num_slots - eng.num_active
            if free_slots <= 0:
                return False
            take = ready[:free_slots]
            items = []
            for (ids, feats), _idx in take:
                vision = None
                if feats:
                    patches = np.concatenate([f.patches for f in feats])
                    layout = plan_vision_layout([f.grid_thw for f in feats],
                                                self.cfg.vision)
                    embeds = vit_forward(self.params["visual"],
                                         self.cfg.vision,
                                         jnp.asarray(patches), layout,
                                         act_quant=self.vit_act_quant)
                    vision = (embeds, [f.grid_thw for f in feats],
                              [f.second_per_grid_t for f in feats])
                items.append((list(ids), mnt, None, sp, None, vision))
            rids = eng.submit_batch(items)
            admitted = 0
            still_waiting = []
            for entry, rid in zip(take, rids):
                if rid is None:
                    still_waiting.append(entry)
                else:
                    rid_to_idx[rid] = entry[1]
                    admitted += 1
            ready[:free_slots] = still_waiting
            return admitted > 0

        done = 0
        eng = None
        while done < n:
            eng = None  # no stale alias across a possible engine rebuild
            pull_available()
            while admit_ready():
                pass
            eng = self._cont
            if eng is not None and eng.num_active:
                for rid, toks in eng.step(steps=self.decode_steps):
                    out[rid_to_idx[rid]] = self._apply_until(
                        self.tok.decode(toks, skip_special_tokens=True),
                        gen_kwargs)
                    done += 1
            elif not ready and pulled < n:
                # idle and nothing prepared: block on the next instance
                ready.append((next(loader), indices[pulled]))
                pulled += 1
        return out
