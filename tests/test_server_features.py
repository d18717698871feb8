"""OpenAI-server request features: stop sequences, n choices, /metrics,
request cancellation.

vLLM-parity surface judges actually use (the reference's TAC/VAS clients
hit a vLLM server that honors all of these): `stop` truncates BEFORE the
stop string and cancels the in-flight request (slot frees instead of
burning budget), `n` returns multiple choices, /metrics exposes slot/page/
spec telemetry.
"""

import json
import urllib.request

import numpy as np
import pytest

from tests.hf_ref import build_hf_tiny
from video_r2_tpu.engine import ByteTokenizer, SamplingParams
from video_r2_tpu.engine.continuous import PagedContinuousEngine
from video_r2_tpu.engine.server import ChatEngine, _apply_stop, serve
from video_r2_tpu.models import convert_hf_state_dict


@pytest.fixture(scope="module")
def cfg_params():
    model, cfg = build_hf_tiny()
    return cfg, convert_hf_state_dict(model.state_dict(), cfg,
                                      dtype="float32")


def test_apply_stop():
    assert _apply_stop("a STOP b", ["STOP"]) == "a "
    assert _apply_stop("a b c", ["X"]) == "a b c"
    assert _apply_stop("x<end>y</end>", ["</end>", "<end>"]) == "x"


@pytest.mark.parametrize("continuous", [False, True])
def test_chat_stop_truncates(cfg_params, continuous):
    """stop strings truncate the completion (exclusive) in both batch and
    continuous modes; outputs equal the unstopped prefix."""
    cfg, params = cfg_params
    kw = dict(max_new_tokens=8)
    if continuous:
        kw.update(continuous=True, engine_kind="paged", num_slots=4,
                  max_len=64, page_size=16)
    eng = ChatEngine(params, cfg, ByteTokenizer(), **kw)
    msgs = [{"role": "user", "content": "hello"}]
    try:
        full = eng.chat(msgs)
        assert len(full) > 3
        stop = full[2:4]          # a substring mid-completion
        out = eng.chat(msgs, stop=stop)
        assert out == full[:full.find(stop)]
        # stream parity: concatenated deltas == non-streamed stopped text
        streamed = "".join(eng.chat_stream(msgs, stop=stop))
        assert streamed == out
        # chat_batch honors stop per-row
        outs = eng.chat_batch([msgs, msgs], stop=stop)
        assert outs == [out, out]
    finally:
        eng.shutdown()


def test_engine_cancel_frees_slot(cfg_params):
    """request_cancel finishes a request with its tokens-so-far at the next
    step and frees the slot for a new admission."""
    cfg, params = cfg_params
    eng = PagedContinuousEngine(
        params, cfg, num_slots=1, max_len=64,
        sp=SamplingParams(pad_token_id=cfg.pad_token_id, eos_token_ids=()),
        prompt_buckets=(16,), page_size=16)
    rid = eng.submit([5, 6, 7], max_new_tokens=30)
    done = eng.step()
    assert done == []                 # budget 30: still running
    eng.request_cancel(rid)
    done = eng.step()
    assert [r for r, _ in done] == [rid]
    assert 1 <= len(done[0][1]) < 30  # finished early with partial tokens
    assert eng.num_active == 0
    # slot is reusable
    rid2 = eng.submit([8, 9], max_new_tokens=2)
    assert rid2 is not None
    while eng.num_active:
        eng.step()


def test_http_n_choices_stop_and_metrics(cfg_params):
    cfg, params = cfg_params
    engine = ChatEngine(params, cfg, ByteTokenizer(), max_new_tokens=6,
                        continuous=True, engine_kind="paged", num_slots=4,
                        max_len=64, page_size=16)
    server = serve(engine, host="127.0.0.1", port=0, background=True)
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}"
    try:
        def post(payload):
            req = urllib.request.Request(
                f"{url}/v1/chat/completions", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        msgs = [{"role": "user", "content": "hi"}]
        out = post({"messages": msgs, "n": 3, "temperature": 0.0})
        assert [c["index"] for c in out["choices"]] == [0, 1, 2]
        texts = [c["message"]["content"] for c in out["choices"]]
        assert texts[0] == texts[1] == texts[2]   # greedy: identical

        full = texts[0]
        stop = full[1:3]
        out2 = post({"messages": msgs, "stop": stop})
        assert out2["choices"][0]["message"]["content"] == \
            full[:full.find(stop)]

        with urllib.request.urlopen(f"{url}/metrics", timeout=30) as r:
            m = json.loads(r.read())
        assert m["continuous"] and m["num_slots"] == 4
        assert "pages_total" in m and m["pages_free"] >= 0
        assert "spec_stats" in m
    finally:
        server.shutdown()
        engine.shutdown()
