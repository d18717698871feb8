"""Checkpoint round-trip + rotation + resume; HF export/import round-trip;
LoRA init/apply/merge/train; OpenAI server end-to-end over real HTTP."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_r2_tpu.models import (
    convert_hf_state_dict,
    init_params,
    tiny_test_config,
)
from video_r2_tpu.train import (
    OptimConfig,
    SFTConfig,
    TrainState,
    init_train_state,
    make_optimizer,
    make_sft_step,
)
from video_r2_tpu.train.checkpoint import (
    export_hf_checkpoint,
    latest_checkpoint,
    load_checkpoint,
    params_to_hf_state_dict,
    resume_or_none,
    save_checkpoint,
)
from video_r2_tpu.train.lora import (
    LoRAConfig,
    LoRATrainState,
    apply_lora,
    init_lora,
    lora_param_count,
    make_lora_sft_step,
    merge_lora,
)
from video_r2_tpu.ops.fused_ce import IGNORE_INDEX


@pytest.fixture(scope="module")
def cfg_params():
    cfg = tiny_test_config()
    return cfg, init_params(cfg, dtype="float32")


def _batch(rng, B=2, S=12):
    ids = rng.integers(2, 400, size=(B, S))
    labels = ids.copy()
    labels[:, :4] = IGNORE_INDEX
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(S)[None, None], (3, B, S)).copy()),
        "attention_mask": jnp.ones((B, S), jnp.int32),
    }


def test_checkpoint_roundtrip_and_rotation(cfg_params, tmp_path, rng):
    cfg, params = cfg_params
    opt = make_optimizer(OptimConfig(total_steps=10), params)
    state = init_train_state(params, opt)
    step = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt, donate=False)
    state, _ = step(state, _batch(rng))

    for s in (1, 2, 3):
        save_checkpoint(tmp_path, state, s, keep=2)
    assert latest_checkpoint(tmp_path).name == "checkpoint-3"
    assert not (tmp_path / "checkpoint-1").exists()  # rotated away

    restored, step_no = resume_or_none(tmp_path, jax.tree.map(np.zeros_like, state))
    assert step_no == 3
    np.testing.assert_allclose(
        np.asarray(restored.params["model"]["norm"]["scale"]),
        np.asarray(state.params["model"]["norm"]["scale"]))
    assert resume_or_none(tmp_path / "empty", state) is None


def test_hf_export_roundtrip(cfg_params, tmp_path):
    cfg, params = cfg_params
    sd = params_to_hf_state_dict(params, cfg)
    back = convert_hf_state_dict(sd, cfg, dtype="float32")
    for path in [("model", "layers", "attn", "q", "kernel"),
                 ("visual", "patch_embed", "kernel"),
                 ("visual", "merger", "fc1", "kernel"),
                 ("lm_head", "kernel")]:
        a, b = params, back
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    out = export_hf_checkpoint(params, cfg, tmp_path / "hf")
    assert (out / "model.safetensors").exists()
    # loadable into an HF model
    import torch
    from safetensors.torch import load_file
    from tests.hf_ref import build_hf_tiny

    hf_model, _ = build_hf_tiny()
    sd_t = load_file(str(out / "model.safetensors"))
    # we export the standard on-disk checkpoint naming (visual.*, model.*);
    # transformers>=4.52 renames to model.visual/model.language_model in-memory
    remapped = {}
    for k, v in sd_t.items():
        if k.startswith("visual."):
            remapped["model." + k] = v
        elif k.startswith("model."):
            remapped["model.language_model." + k[len("model."):]] = v
        else:
            remapped[k] = v
    missing, unexpected = hf_model.load_state_dict(remapped, strict=False)
    assert not unexpected, unexpected
    # only rotary inv_freq style buffers may be missing
    assert all("inv_freq" in m or "rope" in m for m in missing), missing


def test_lora_init_apply_train(cfg_params, rng):
    cfg, params = cfg_params
    lcfg = LoRAConfig(r=4, alpha=8)
    lora = init_lora(params, lcfg)
    assert lora_param_count(lora) > 0
    # B zeros -> apply is identity initially
    eff = merge_lora(params, lora, lcfg)
    np.testing.assert_allclose(
        np.asarray(eff["model"]["layers"]["attn"]["q"]["kernel"]),
        np.asarray(params["model"]["layers"]["attn"]["q"]["kernel"]))
    # vision excluded by default; norms never adapted
    assert "visual" not in lora or not lora["visual"]
    assert "input_layernorm" not in lora["model"]["layers"]

    opt = make_optimizer(OptimConfig(learning_rate=5e-3, total_steps=10), lora)
    step = make_lora_sft_step(params, cfg, SFTConfig(ce_chunk_size=32),
                              lcfg, opt, donate=False)
    state = LoRATrainState(lora, opt.init(lora), jnp.zeros((), jnp.int32))
    batch = _batch(rng)
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # after training, adapters change the effective weights
    eff2 = merge_lora(params, state.lora, lcfg)
    assert not np.allclose(
        np.asarray(eff2["model"]["layers"]["attn"]["q"]["kernel"]),
        np.asarray(params["model"]["layers"]["attn"]["q"]["kernel"]))


def test_lora_step_does_not_bake_base(cfg_params, rng):
    """VERDICT r4 #3 regression: the jitted LoRA step must take the base
    params as an ARGUMENT, not a closure. A closed-over base is baked into
    the executable as constants (8.85 GB captured + 603 s compile on chip
    for the 7B model, re-embedded per compiled batch bucket). Baked params
    show up as weight-sized dense literals in the lowered IR."""
    import re

    cfg, params = cfg_params
    lcfg = LoRAConfig(r=4, alpha=8)
    lora = init_lora(params, lcfg)
    opt = make_optimizer(OptimConfig(learning_rate=5e-3, total_steps=10), lora)
    step = make_lora_sft_step(params, cfg, SFTConfig(ce_chunk_size=32),
                              lcfg, opt, donate=False)
    state = LoRATrainState(lora, opt.init(lora), jnp.zeros((), jnp.int32))
    batch = _batch(rng)
    text = step.jitted.lower(state, step.base_params, batch).as_text()
    max_leaf = max(x.size for x in jax.tree_util.tree_leaves(params))
    baked = []
    for line in text.splitlines():
        if "constant" not in line or "dense" not in line:
            continue
        m = re.search(r"tensor<((?:[0-9]+x)*[0-9]+)x?[a-z]", line)
        if m is None:
            continue
        n = int(np.prod([int(d) for d in m.group(1).split("x")]))
        if n >= max_leaf:
            baked.append((n, line[:120]))
    assert not baked, f"weight-sized constants baked into LoRA step: {baked[:3]}"


def test_openai_server_end_to_end(cfg_params):
    import urllib.request

    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine, serve

    cfg = tiny_test_config(vocab_size=152064).replace(
        eos_token_id=151645, pad_token_id=151643)
    params = init_params(cfg, dtype="float32")
    engine = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=4)
    server = serve(engine, host="127.0.0.1", port=0, background=True)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/models") as r:
            models = json.loads(r.read())
        assert models["data"][0]["id"] == "video-r2-tpu"

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({
                "model": "video-r2-tpu",
                "messages": [{"role": "system", "content": "s"},
                             {"role": "user", "content": "hello"}],
                "temperature": 0.0, "max_tokens": 4,
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["object"] == "chat.completion"
        assert out["choices"][0]["finish_reason"] == "stop"
        assert isinstance(out["choices"][0]["message"]["content"], str)

        # judge client interop
        from video_r2_tpu.rewards.judge import OpenAICompatClient

        client = OpenAICompatClient(base_url=f"http://127.0.0.1:{port}/v1",
                                    model="video-r2-tpu")
        resp = client.chat("sys", "user msg")
        assert isinstance(resp, str)
    finally:
        server.shutdown()


def test_sharded_checkpoint_roundtrip(tmp_path, rng):
    """Save a mesh-sharded train state and restore it into the same shardings
    (the ZeRO-3 'no gather on save' claim, N3)."""
    from video_r2_tpu.parallel import MeshConfig, make_mesh

    cfg = tiny_test_config()
    params = init_params(cfg, dtype="float32")
    mesh = make_mesh(MeshConfig(dp=1, fsdp=4, tp=2))
    opt = make_optimizer(OptimConfig(total_steps=5), params)
    state = init_train_state(params, opt, mesh=mesh)
    step = make_sft_step(cfg, SFTConfig(ce_chunk_size=32), opt, mesh=mesh,
                         donate=False)
    batch = step.shard_batch(_batch(rng, B=4))
    state, _ = step(state, batch)

    save_checkpoint(tmp_path, state, 1)
    # restore into abstract target carrying the SAME shardings
    import jax

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state)
    restored = load_checkpoint(tmp_path / "checkpoint-1", abstract)
    q0 = restored.params["model"]["layers"]["attn"]["q"]["kernel"]
    assert q0.sharding.spec == jax.sharding.PartitionSpec(None, "fsdp", "tp")
    np.testing.assert_allclose(
        np.asarray(q0),
        np.asarray(state.params["model"]["layers"]["attn"]["q"]["kernel"]))
    # restored state continues training
    state2, m = step(restored, batch)
    assert np.isfinite(float(m["loss"]))


def test_server_sse_streaming(cfg_params):
    """stream=true returns OpenAI chat.completion.chunk SSE frames whose
    concatenated deltas equal the non-streamed completion."""
    import json
    import urllib.request

    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine, serve

    cfg, params = cfg_params
    engine = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=6,
                        continuous=True, num_slots=2, max_len=64)
    server = serve(engine, host="127.0.0.1", port=0, background=True)
    port = server.server_address[1]
    body = {"messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 6}
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            plain = json.loads(r.read())["choices"][0]["message"]["content"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({**body, "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        deltas, saw_done, finish = [], False, None
        with urllib.request.urlopen(req, timeout=120) as r:
            for line in r:
                line = line.decode().strip()
                if not line.startswith("data: "):
                    continue
                data = line[len("data: "):]
                if data == "[DONE]":
                    saw_done = True
                    break
                obj = json.loads(data)
                assert obj["object"] == "chat.completion.chunk"
                ch = obj["choices"][0]
                deltas.append(ch["delta"].get("content", ""))
                finish = ch["finish_reason"] or finish
        assert saw_done and finish == "stop"
        assert "".join(deltas) == plain
    finally:
        server.shutdown()
        engine.shutdown()


def test_server_paged_continuous_mode(cfg_params):
    """ChatEngine(engine_kind='paged') serves over the paged KV pool."""
    import json
    import urllib.request

    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.engine.continuous import PagedContinuousEngine
    from video_r2_tpu.engine.server import ChatEngine, serve

    cfg, params = cfg_params
    engine = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=4,
                        continuous=True, engine_kind="paged", num_slots=2,
                        max_len=64, page_size=16)
    assert isinstance(engine._cont, PagedContinuousEngine)
    server = serve(engine, host="127.0.0.1", port=0, background=True)
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": [{"role": "user", "content": "hi"}],
                             "max_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())["choices"][0]["message"]["content"]
        assert isinstance(out, str)
    finally:
        server.shutdown()
        engine.shutdown()


def test_chat_many_batched_judging():
    """chat_many: native batch method wins, thread-pool fan-out preserves
    order, StaticJudge falls back serial (reference: single-batch vLLM
    judge generates, tac/vsibench.py run_llm_simple)."""
    import time

    from video_r2_tpu.rewards.judge import StaticJudge, chat_many

    class Native:
        def chat(self, s, u):
            raise AssertionError("native chat_many must be used")

        def chat_many(self, reqs):
            return [u for _, u in reqs]

    assert chat_many(Native(), [("s", "a"), ("s", "b")]) == ["a", "b"]

    class Slow:
        def chat(self, s, u):
            time.sleep(0.02 if u == "a" else 0.0)
            return u

    assert chat_many(Slow(), [("s", "a"), ("s", "b"), ("s", "c")],
                     max_workers=4) == ["a", "b", "c"]
    sj = StaticJudge(["1", "2"])
    assert chat_many(sj, [("s", "x"), ("s", "y")]) == ["1", "2"]
    assert [u for _, u in sj.calls] == ["x", "y"]  # order preserved


def test_engine_judge_batched(cfg_params):
    """EngineJudge fans concurrent judge calls into the continuous engine's
    shared decode loop (co-located judge role, serve_qwen3.sh parity)."""
    from video_r2_tpu.engine import ByteTokenizer
    from video_r2_tpu.engine.server import ChatEngine
    from video_r2_tpu.rewards.judge import EngineJudge, chat_many

    cfg, params = cfg_params
    engine = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=4,
                        continuous=True, engine_kind="paged", num_slots=4,
                        max_len=64, page_size=16)
    try:
        judge = EngineJudge(engine, max_tokens=4)
        one = judge.chat("You are a judge.", "Reply with A.")
        assert isinstance(one, str)
        outs = chat_many(judge, [("You are a judge.", f"Q{i}")
                                 for i in range(6)])
        assert len(outs) == 6
        assert all(isinstance(o, str) for o in outs)
    finally:
        engine.shutdown()


def test_chat_many_on_error_with_native_batch():
    """on_error='empty' survives a native chat_many: per-row degradation is
    preserved either via the native on_error kwarg or by falling back to the
    wrapped fan-out (review r3 finding)."""
    from video_r2_tpu.rewards.judge import chat_many

    class NativeAware:
        def chat(self, s, u):
            raise AssertionError("unused")

        def chat_many(self, reqs, on_error="raise"):
            assert on_error == "empty"
            return ["" if u == "bad" else u for _, u in reqs]

    out = chat_many(NativeAware(), [("s", "ok"), ("s", "bad")],
                    on_error="empty")
    assert out == ["ok", ""]

    class NativeNaive:
        def chat(self, s, u):
            if u == "bad":
                raise RuntimeError("boom")
            return u

        def chat_many(self, reqs):
            raise AssertionError("must not be used when isolation is needed")

    out = chat_many(NativeNaive(), [("s", "ok"), ("s", "bad")],
                    on_error="empty")
    assert out == ["ok", ""]


def test_submit_packed_rejects_multimodal(cfg_params):
    from video_r2_tpu.engine import ByteTokenizer  # noqa: F401
    from video_r2_tpu.engine.continuous import PagedContinuousEngine
    from video_r2_tpu.engine.sampling import SamplingParams as SP

    cfg, params = cfg_params
    eng = PagedContinuousEngine(
        params, cfg, num_slots=2, max_len=64,
        sp=SP(pad_token_id=cfg.pad_token_id, eos_token_ids=()),
        prompt_buckets=(16,), page_size=16)
    import numpy as _np
    import pytest as _pytest
    with _pytest.raises(ValueError, match="text-only"):
        eng.submit_packed([([1, 2, 3], 4, None, None, None,
                            (_np.zeros((2, 4)), [(1, 2, 2)], [1.0]))])
