"""Checkpoint loading: safetensors shards, consume mode, quantize-on-load.

The judge-scale load path (loader.load_hf_checkpoint(quantize="int8")) must
produce EXACTLY the same tree as load-then-quantize while freeing host
tensors as it converts — a 30B judge checkpoint otherwise needs ~2.5x its
size in host RAM before it can serve (scripts/serve_judge.sh).
"""

import jax
import numpy as np
import pytest

from tests.hf_ref import build_hf_tiny
from video_r2_tpu.models import convert_hf_state_dict
from video_r2_tpu.models.loader import load_hf_checkpoint
from video_r2_tpu.models.quant import quantize_params


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from safetensors.numpy import save_file

    model, cfg = build_hf_tiny()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    d = tmp_path_factory.mktemp("ckpt")
    keys = sorted(state)
    half = len(keys) // 2   # two shards: the multi-shard glob path
    save_file({k: state[k] for k in keys[:half]},
              str(d / "model-00001-of-00002.safetensors"))
    save_file({k: state[k] for k in keys[half:]},
              str(d / "model-00002-of-00002.safetensors"))
    return d, cfg, state


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    for (pa, xa), (pb, xb) in zip(la, lb):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_load_matches_convert(ckpt):
    d, cfg, state = ckpt
    loaded = load_hf_checkpoint(d, cfg, dtype="float32")
    ref = convert_hf_state_dict(dict(state), cfg, dtype="float32")
    _trees_equal(loaded, ref)


def test_consume_mode_identical_and_frees(ckpt):
    d, cfg, state = ckpt
    s1 = dict(state)
    ref = convert_hf_state_dict(s1, cfg, dtype="float32")
    s2 = dict(state)
    out = convert_hf_state_dict(s2, cfg, dtype="float32", consume=True)
    assert s2 == {}           # ownership taken: caller's dict cleared
    _trees_equal(out, ref)


def test_quantize_on_load(ckpt):
    d, cfg, state = ckpt
    ref = quantize_params(
        convert_hf_state_dict(dict(state), cfg, dtype="float32"))
    loaded = load_hf_checkpoint(d, cfg, dtype="float32", quantize="int8")
    _trees_equal(loaded, ref)
    assert "kernel_q" in loaded["model"]["layers"]["attn"]["q"]


def test_quantize_consume_mutates_but_matches(ckpt):
    _, cfg, state = ckpt
    base = convert_hf_state_dict(dict(state), cfg, dtype="float32")
    ref = quantize_params(base, consume=False)
    base2 = convert_hf_state_dict(dict(state), cfg, dtype="float32")
    out = quantize_params(base2, consume=True)
    _trees_equal(out, ref)
    # consume dropped the full-precision kernels from the input tree
    assert "kernel" not in base2["model"]["layers"]["attn"]["q"]
