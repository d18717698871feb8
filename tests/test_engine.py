"""Engine golden tests: greedy generation must match HF `generate`
token-for-token on the tiny model; sampling paths are exercised for shape and
filter correctness."""

import numpy as np
import pytest

from tests.hf_ref import build_hf_tiny, video_token_sequence
from video_r2_tpu.engine import (
    ByteTokenizer,
    SamplingParams,
    expand_vision_placeholders,
    generate,
    pack_prompts,
    render_messages,
)
from video_r2_tpu.models import (
    convert_hf_state_dict,
    get_rope_index,
    plan_vision_layout,
    vit_forward,
)


@pytest.fixture(scope="module")
def hf_and_params():
    model, cfg = build_hf_tiny()
    params = convert_hf_state_dict(model.state_dict(), cfg, dtype="float32")
    return model, cfg, params


def test_greedy_matches_hf_text_only(hf_and_params, rng):
    import torch

    model, cfg, params = hf_and_params
    B, T = 3, 12
    lens = [7, 9, 5]
    ids = np.full((B, max(lens)), cfg.pad_token_id, dtype=np.int64)
    for i, L in enumerate(lens):
        ids[i, :L] = rng.integers(2, 400, size=L)

    # HF: left-pad (its generate convention)
    left = np.full_like(ids, cfg.pad_token_id)
    mask = np.zeros_like(ids)
    for i, L in enumerate(lens):
        left[i, -L:] = ids[i, :L]
        mask[i, -L:] = 1
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.from_numpy(left),
            attention_mask=torch.from_numpy(mask),
            max_new_tokens=T, do_sample=False,
            pad_token_id=cfg.pad_token_id, eos_token_id=None,
        ).numpy()[:, left.shape[1]:]

    sp = SamplingParams(max_new_tokens=T, pad_token_id=cfg.pad_token_id)
    res = generate(params, cfg, ids, np.asarray(lens), sp)
    np.testing.assert_array_equal(res.sequences, hf_out)
    # note: lengths may undercount if the random model emits the pad id
    # naturally (gen_len counts non-pad; pad-after-eos contract), so only the
    # token sequences are asserted here.


def test_greedy_matches_hf_with_video(hf_and_params, rng):
    import torch

    model, cfg, params = hf_and_params
    grid = (2, 4, 4)
    patches = rng.normal(size=(32, cfg.vision.patch_input_dim)).astype(np.float32)
    ids = video_token_sequence(cfg, grid, prefix=[5, 6], suffix=[7, 8])
    spg = np.array([1.0])
    T = 10
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.from_numpy(ids),
            pixel_values_videos=torch.from_numpy(patches),
            video_grid_thw=torch.tensor([list(grid)]),
            second_per_grid_ts=torch.tensor(spg),
            max_new_tokens=T, do_sample=False,
            pad_token_id=cfg.pad_token_id, eos_token_id=None,
        ).numpy()[:, ids.shape[1]:]

    pos, deltas = get_rope_index(ids, cfg, video_grid_thw=np.array([grid]),
                                 second_per_grid_ts=spg)
    layout = plan_vision_layout([grid], cfg.vision)
    vemb = vit_forward(params["visual"], cfg.vision, patches, layout)
    sp = SamplingParams(max_new_tokens=T, pad_token_id=cfg.pad_token_id)
    res = generate(params, cfg, ids, np.array([ids.shape[1]]), sp,
                   position_ids=pos, rope_deltas=deltas[:, 0],
                   vision_embeds=vemb, vision_token_id=cfg.video_token_id)
    np.testing.assert_array_equal(res.sequences, hf_out)


def test_eos_stops_and_pads(hf_and_params, rng):
    _, cfg, params = hf_and_params
    ids = rng.integers(2, 400, size=(2, 6))
    sp = SamplingParams(max_new_tokens=8, pad_token_id=cfg.pad_token_id,
                        eos_token_ids=tuple(range(0, 512, 2)))  # half the vocab
    res = generate(params, cfg, ids, np.array([6, 6]), sp)
    for b in range(2):
        L = res.lengths[b]
        assert (res.sequences[b, L:] == cfg.pad_token_id).all()
        if L < sp.max_new_tokens:
            assert res.sequences[b, L - 1] % 2 == 0  # stopped on an "eos"


def test_sampling_filters():
    import jax
    import jax.numpy as jnp

    from video_r2_tpu.engine.sampling import apply_top_k, apply_top_p

    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    k = apply_top_k(logits, 2)
    assert (np.asarray(k)[0, :2] < -1e29).all() and (np.asarray(k)[0, 2:] > 0).all()

    p = apply_top_p(jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]])), 0.8)
    kept = np.asarray(p)[0] > -1e29
    assert kept.tolist() == [True, True, False, False]

    sp_greedy = SamplingParams(do_sample=False)
    tok = np.asarray(
        __import__("video_r2_tpu.engine.sampling", fromlist=["sample_token"])
        .sample_token(logits, jax.random.PRNGKey(0), sp_greedy))
    assert tok[0] == 3


def test_sampled_generation_runs(hf_and_params, rng):
    _, cfg, params = hf_and_params
    ids = rng.integers(2, 400, size=(2, 5))
    sp = SamplingParams(do_sample=True, temperature=0.9, top_p=0.9, top_k=40,
                        max_new_tokens=6, pad_token_id=cfg.pad_token_id)
    r1 = generate(params, cfg, ids, np.array([5, 5]), sp, seed=1)
    r2 = generate(params, cfg, ids, np.array([5, 5]), sp, seed=1)
    r3 = generate(params, cfg, ids, np.array([5, 5]), sp, seed=2)
    np.testing.assert_array_equal(r1.sequences, r2.sequences)  # deterministic per seed
    assert r1.sequences.shape == (2, 6)
    assert not np.array_equal(r1.sequences, r3.sequences)


def test_chat_template_and_tokenizer():
    msgs = [{"role": "user", "content": [
        {"type": "video", "video": "x.mp4"},
        {"type": "text", "text": "Describe."},
    ]}]
    text = render_messages(msgs)
    assert text.startswith("<|im_start|>system\n")
    assert "<|vision_start|><|video_pad|><|vision_end|>" in text
    assert text.endswith("<|im_start|>assistant\n")

    expanded = expand_vision_placeholders(text, [3], [])
    assert expanded.count("<|video_pad|>") == 3

    tok = ByteTokenizer()
    ids = tok.encode(expanded)
    assert ids.count(151656) == 3
    assert tok.decode(tok.encode("hello"), skip_special_tokens=True) == "hello"

    packed = pack_prompts([ids, ids[:5]], pad_id=151643, pad_to_multiple=16)
    assert packed.input_ids.shape[1] % 16 == 0
    assert packed.lengths.tolist() == [len(ids), 5]


def test_decode_positions_match_full_forward(hf_and_params, rng):
    """Position-exact check: cached decode must produce the same greedy tokens
    as iterative full re-forwarding (no cache), for ragged short prompts.
    This catches rope-delta offset bugs that tiny-model argmax can miss."""
    import jax.numpy as jnp

    from video_r2_tpu.models import forward, get_rope_index

    _, cfg, params = hf_and_params
    B, T = 2, 6
    lens = [5, 8]
    S = 8
    ids = np.full((B, S), cfg.pad_token_id, dtype=np.int64)
    for i, L in enumerate(lens):
        ids[i, :L] = rng.integers(2, 400, size=L)

    sp = SamplingParams(max_new_tokens=T, pad_token_id=cfg.pad_token_id)
    res = generate(params, cfg, ids, np.asarray(lens), sp)

    # iterative no-cache reference: re-forward the growing true sequence and
    # compare chosen-token LOGPROBS numerically (argmax alone can't resolve
    # the tiny model's weak position sensitivity)
    for b in range(B):
        seq = list(ids[b, :lens[b]])
        for t in range(T):
            cur = np.asarray([seq], dtype=np.int64)
            pos, _ = get_rope_index(cur, cfg)
            logits, _ = forward(params, cfg, cur, pos)
            row = np.asarray(logits)[0, -1]
            nxt = int(row.argmax())
            assert nxt == res.sequences[b, t], (b, t, nxt, res.sequences[b])
            ref_logp = float(row[nxt] - (np.log(np.exp(row - row.max()).sum())
                                         + row.max()))
            np.testing.assert_allclose(res.logprobs[b, t], ref_logp,
                                       rtol=0, atol=5e-5)
            seq.append(nxt)


def test_kernel_decode_matches_xla(hf_and_params, rng):
    """decode_impl="kernel" (stacked-cache Pallas decode, interpret mode on
    CPU) must match the XLA decode path token-for-token."""
    _, cfg, params = hf_and_params
    B, T = 3, 7
    lens = [13, 9, 11]
    ids = np.full((B, 13), cfg.pad_token_id, dtype=np.int64)
    for i, L in enumerate(lens):
        ids[i, :L] = rng.integers(2, 400, size=L)
    sp = SamplingParams(max_new_tokens=T, pad_token_id=cfg.pad_token_id,
                        eos_token_ids=())
    r_xla = generate(params, cfg, ids, np.asarray(lens), sp, decode_impl="xla")
    r_ker = generate(params, cfg, ids, np.asarray(lens), sp,
                     decode_impl="kernel")
    np.testing.assert_array_equal(r_xla.sequences, r_ker.sequences)
    np.testing.assert_allclose(r_xla.logprobs, r_ker.logprobs, atol=1e-4)


def test_kv_quant_and_chunked_prefill(hf_and_params, rng):
    """int8 KV cache: chunked prefill must be bit-identical to unchunked;
    quantized logprobs must track the fp path closely on the prompt-local
    first step (cache noise accumulates afterwards by design)."""
    _, cfg, params = hf_and_params
    B, T = 4, 6
    lens = [13, 9, 11, 8]
    ids = np.full((B, 13), cfg.pad_token_id, dtype=np.int64)
    for i, L in enumerate(lens):
        ids[i, :L] = rng.integers(2, 400, size=L)
    sp = SamplingParams(max_new_tokens=T, pad_token_id=cfg.pad_token_id,
                        eos_token_ids=())
    r_fp = generate(params, cfg, ids, np.asarray(lens), sp)
    r_q = generate(params, cfg, ids, np.asarray(lens), sp, kv_quant="int8")
    r_qc = generate(params, cfg, ids, np.asarray(lens), sp, kv_quant="int8",
                    prefill_chunk=2)
    np.testing.assert_array_equal(r_q.sequences, r_qc.sequences)
    np.testing.assert_allclose(r_q.logprobs, r_qc.logprobs, atol=1e-5)
    # first generated token comes from the full-precision prefill attention
    # (quantization only affects the cache decode reads), so it must agree
    np.testing.assert_array_equal(r_fp.sequences[:, 0], r_q.sequences[:, 0])
    np.testing.assert_allclose(r_fp.logprobs[:, 0], r_q.logprobs[:, 0],
                               atol=2e-3)


def test_multimodal_chunked_prefill_matches_unchunked(hf_and_params, rng):
    """prefill_chunk with vision embeds: each chunk takes its rows' slice of
    the concatenated embeds — must match the unchunked path token-for-token
    (the eval backend's B=16 multimodal batches rely on this to fit HBM)."""
    _, cfg, params = hf_and_params
    grid = (2, 4, 4)
    B, T = 4, 6
    rows, embs, lens = [], [], []
    for b in range(B):
        ids_b = video_token_sequence(cfg, grid, prefix=[5 + b, 6],
                                     suffix=[7, 8 + b])[0]
        patches = rng.normal(
            size=(32, cfg.vision.patch_input_dim)).astype(np.float32)
        layout = plan_vision_layout([grid], cfg.vision)
        embs.append(np.asarray(
            vit_forward(params["visual"], cfg.vision, patches, layout)))
        rows.append(ids_b)
        lens.append(len(ids_b))
    S = max(lens)
    ids = np.full((B, S), cfg.pad_token_id, np.int64)
    for b, r in enumerate(rows):
        ids[b, :len(r)] = r
    vemb = np.concatenate(embs)
    mask = (np.arange(S)[None, :] < np.asarray(lens)[:, None]).astype(np.int64)
    pos, deltas = get_rope_index(ids, cfg, video_grid_thw=np.array([grid] * B),
                                 second_per_grid_ts=np.ones(B),
                                 attention_mask=mask)
    sp = SamplingParams(max_new_tokens=T, pad_token_id=cfg.pad_token_id,
                        eos_token_ids=())
    kw = dict(position_ids=pos, rope_deltas=deltas[:, 0],
              vision_embeds=vemb, vision_token_id=cfg.video_token_id)
    full = generate(params, cfg, ids, np.asarray(lens), sp, **kw)
    chunked = generate(params, cfg, ids, np.asarray(lens), sp,
                       prefill_chunk=2, **kw)
    np.testing.assert_array_equal(full.sequences, chunked.sequences)
    np.testing.assert_allclose(full.logprobs, chunked.logprobs, atol=1e-5)


def test_chunked_prefill_mixed_text_and_vision_rows(hf_and_params, rng):
    """Regression (code review): a prefill chunk containing no vision tokens
    must pass None embeds (a 0-row gather source fails at trace time)."""
    _, cfg, params = hf_and_params
    grid = (2, 4, 4)
    vid_ids = video_token_sequence(cfg, grid, prefix=[5, 6], suffix=[7, 8])[0]
    txt_ids = list(rng.integers(2, 400, size=len(vid_ids)))
    rows = [txt_ids, txt_ids, list(vid_ids), list(vid_ids)]
    S = max(len(r) for r in rows)
    B = len(rows)
    ids = np.full((B, S), cfg.pad_token_id, np.int64)
    for b, r in enumerate(rows):
        ids[b, :len(r)] = r
    lens = np.asarray([len(r) for r in rows])
    patches = rng.normal(size=(32, cfg.vision.patch_input_dim)).astype(np.float32)
    layout = plan_vision_layout([grid], cfg.vision)
    emb = np.asarray(vit_forward(params["visual"], cfg.vision, patches, layout))
    vemb = np.concatenate([emb, emb])
    mask = (np.arange(S)[None, :] < lens[:, None]).astype(np.int64)
    pos, deltas = get_rope_index(ids, cfg, video_grid_thw=np.array([grid] * 2),
                                 second_per_grid_ts=np.ones(2),
                                 attention_mask=mask)
    sp = SamplingParams(max_new_tokens=4, pad_token_id=cfg.pad_token_id,
                        eos_token_ids=())
    kw = dict(position_ids=pos, rope_deltas=deltas[:, 0], vision_embeds=vemb,
              vision_token_id=cfg.video_token_id)
    full = generate(params, cfg, ids, lens, sp, **kw)
    chunked = generate(params, cfg, ids, lens, sp, prefill_chunk=2, **kw)
    np.testing.assert_array_equal(full.sequences, chunked.sequences)
