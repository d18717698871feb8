"""Native BPE engine vs pure-Python merge loop (synthetic vocab + real byte
alphabet), tokenizer file loading, and the prefetch loader."""

import json
import time

import numpy as np
import pytest

from video_r2_tpu.data.prefetch import PrefetchLoader
from video_r2_tpu.engine.bpe import BPETokenizer, bytes_to_unicode, _build_native


def _toy_tokenizer(use_native):
    b2u = bytes_to_unicode()
    # vocab: every visible byte + some merges over "hello world"
    vocab = {c: i for i, c in enumerate(b2u[b] for b in range(256))}

    def sym(s):
        return "".join(b2u[b] for b in s.encode())

    merges = [
        (sym("h"), sym("e")),
        (sym("l"), sym("l")),
        (sym("he"), sym("ll")),
        (sym("hell"), sym("o")),
        (sym(" "), sym("w")),
        (sym(" w"), sym("o")),
        (sym("r"), sym("l")),
        (sym("rl"), sym("d")),
        (sym(" wo"), sym("rld")),
    ]
    for a, b in merges:
        merged = a + b
        if merged not in vocab:
            vocab[merged] = len(vocab)
    specials = {"<|endoftext|>": 9000, "<|im_end|>": 9001}
    return BPETokenizer(vocab, merges, specials, use_native=use_native)


def test_native_builds():
    assert _build_native() is not None, "g++ build of native/bpe.cpp failed"


def test_native_matches_python_on_text():
    tn = _toy_tokenizer(use_native=True)
    tp = _toy_tokenizer(use_native=False)
    assert tn._native is not None
    for text in ["hello world", "hello", "worldly hello  world",
                 "hhhheeelllooo", "unmergeable xyz!", "hello<|im_end|>world"]:
        assert tn.encode(text) == tp.encode(text), text


def test_roundtrip_decode():
    t = _toy_tokenizer(use_native=True)
    for text in ["hello world", "abc def!  ghi", "tabs\tand\nnewlines"]:
        assert t.decode(t.encode(text)) == text
    ids = t.encode("hello<|im_end|>")
    assert ids[-1] == 9001
    assert t.decode(ids) == "hello"
    assert t.decode(ids, skip_special_tokens=False) == "hello<|im_end|>"


def test_no_characters_lost():
    # ADVICE r1: '_' was excluded from both the letter class and the
    # punctuation class of the pretokenizer regex, so encode('a_b') silently
    # dropped the underscore. Round-trip must preserve every character.
    t = _toy_tokenizer(use_native=False)
    for text in ["a_b", "__init__", "snake_case_name", "_", "a _ b",
                 "mixed_1_and-2", "trailing_", "_leading",
                 "punct!_?mix", "tabs\t_\tunders"]:
        assert t.decode(t.encode(text)) == text, text


def test_merge_order_is_rank_based():
    # "hell" requires he+ll before hell+o; a greedy-leftmost scheme would
    # differ if ranks were ignored
    t = _toy_tokenizer(use_native=False)
    merged = t._bpe_python(list("hello"))
    assert merged == ["hello"]


def test_from_pretrained(tmp_path):
    t = _toy_tokenizer(use_native=False)
    (tmp_path / "vocab.json").write_text(json.dumps(t.vocab))
    with open(tmp_path / "merges.txt", "w") as f:
        f.write("#version 0.2\n")
        for a, b in t.merge_ranks:
            f.write(f"{a} {b}\n")
    (tmp_path / "added_tokens.json").write_text(json.dumps(t.specials))
    loaded = BPETokenizer.from_pretrained(tmp_path, use_native=False)
    assert loaded.encode("hello world") == t.encode("hello world")
    assert loaded.eos_token_id == 9001


def test_native_speedup_sanity():
    tn = _toy_tokenizer(use_native=True)
    text = "hello world " * 500
    ids = tn.encode(text)
    assert len(ids) == 3 * 500  # hello, ' wo'? -> hello,' world',' ' per repeat
    # (exact count depends on merges; just require determinism)
    assert tn.encode(text) == ids


def test_prefetch_loader_order_and_errors():
    def make(idx):
        time.sleep(0.01 * (3 - idx[0] % 3))  # staggered latencies
        return sum(idx)

    batches = [[i, i + 1] for i in range(10)]
    loader = PrefetchLoader(iter(batches), make, num_workers=3, prefetch=4)
    out = list(loader)
    assert out == [sum(b) for b in batches]  # order preserved

    def boom(idx):
        if idx[0] == 2:
            raise ValueError("bad batch")
        return idx[0]

    loader = PrefetchLoader(iter([[0], [1], [2], [3]]), boom, num_workers=2)
    got = []
    with pytest.raises(ValueError, match="bad batch"):
        for x in loader:
            got.append(x)
    assert got == [0, 1]


def test_prefetch_backpressure_bounds_completed_batches():
    """Workers stall at `prefetch` completed batches ahead of the consumer —
    a fast host must not stage the whole dataset's arrays (review fix)."""
    import threading
    import time

    from video_r2_tpu.data.prefetch import PrefetchLoader

    peak = [0]
    lock = threading.Lock()

    def make(idx):
        return idx[0]

    loader = PrefetchLoader(([i] for i in range(100)), make,
                            num_workers=4, prefetch=3)
    time.sleep(0.5)  # give workers time to run far ahead if unbounded
    with loader._cv:
        staged = len(loader._pending)
    assert staged <= 3 + 4, staged  # bound + at most one in-flight per worker
    out = [next(loader) for _ in range(100)]
    assert out == list(range(100))
    loader.close()
