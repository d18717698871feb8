"""Paged decode attention vs the contiguous reference, and the page
allocator (interpret mode on CPU; TPU numerics exercised by ops drives)."""

import jax.numpy as jnp
import numpy as np
import pytest

from video_r2_tpu.ops.attention import _xla_attention
from video_r2_tpu.ops.paged_attention import PagedKVCache, paged_decode_attention


def _setup(rng, B=3, nh=4, kh=2, hd=64, page_size=16, max_pages=8):
    lengths = np.asarray([37, 16, 100])[:B]
    n_pages = 64
    k_pages = rng.normal(size=(kh, n_pages, page_size, hd)).astype(np.float32)
    v_pages = rng.normal(size=(kh, n_pages, page_size, hd)).astype(np.float32)
    tables = np.full((B, max_pages), 0, np.int32)
    used = iter(range(1, n_pages))
    for b in range(B):
        for p in range(-(-int(lengths[b]) // page_size)):
            tables[b, p] = next(used)
    q = rng.normal(size=(B, nh, hd)).astype(np.float32)
    return q, k_pages, v_pages, tables, lengths


def _reference(q, k_pages, v_pages, tables, lengths, page_size):
    B, nh, hd = q.shape
    kh = k_pages.shape[0]
    max_len = int(lengths.max())
    k = np.zeros((B, max_len, kh, hd), np.float32)
    v = np.zeros_like(k)
    for b in range(B):
        L = int(lengths[b])
        for p in range(-(-L // page_size)):
            start = p * page_size
            cnt = min(page_size, L - start)
            k[b, start:start + cnt] = np.moveaxis(k_pages[:, tables[b, p], :cnt], 0, 1)
            v[b, start:start + cnt] = np.moveaxis(v_pages[:, tables[b, p], :cnt], 0, 1)
    bias = np.where(np.arange(max_len)[None, :] < lengths[:, None], 0.0,
                    -1e30).astype(np.float32)[:, None, None, :]
    out = _xla_attention(jnp.asarray(q[:, None]), jnp.asarray(k),
                         jnp.asarray(v), jnp.asarray(bias))
    return np.asarray(out)[:, 0]


def test_paged_decode_matches_reference(rng):
    q, kp, vp, tables, lengths = _setup(rng)
    ref = _reference(q, kp, vp, tables, lengths, 16)
    out = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(tables), jnp.asarray(lengths), page_size=16,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_paged_decode_exact_page_boundary(rng):
    q, kp, vp, tables, lengths = _setup(rng, B=2)
    lengths = np.asarray([16, 32])  # exact multiples of the page size
    ref = _reference(q[:2], kp, vp, tables[:2], lengths, 16)
    out = paged_decode_attention(
        jnp.asarray(q[:2]), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(tables[:2]), jnp.asarray(lengths), page_size=16,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_cache_manager_alloc_append_release(rng):
    cache = PagedKVCache.create(num_layers=2, num_pages=10, page_size=4,
                                kv_heads=2, head_dim=8, batch=3, max_pages=4,
                                dtype=jnp.float32)
    assert len(cache.free_pages) == 10
    k_new = jnp.asarray(rng.normal(size=(2, 2, 2, 8)).astype(np.float32))
    v_new = k_new + 1
    seqs = np.asarray([0, 2])
    for step in range(5):  # crosses a page boundary at step 4
        cache.append_token(seqs, k_new, v_new)
    assert cache.lengths[0] == 5 and cache.lengths[2] == 5 and cache.lengths[1] == 0
    assert (cache.page_tables[0, :2] >= 0).all()
    assert len(cache.free_pages) == 10 - 4  # 2 pages per active sequence
    # token 0 of seq 0 landed at (page_tables[0,0], 0)
    p0 = int(cache.page_tables[0, 0])
    np.testing.assert_allclose(np.asarray(cache.k[:, :, p0, 0]),
                               np.asarray(jnp.swapaxes(k_new, 1, 2)[:, :, 0]))
    # release returns pages
    cache.release(0)
    assert len(cache.free_pages) == 10 - 2
    assert cache.lengths[0] == 0

    with pytest.raises(RuntimeError, match="out of pages"):
        big = PagedKVCache.create(2, 1, 4, 2, 8, 1, 4, dtype=jnp.float32)
        for _ in range(5):
            big.append_token(np.asarray([0]), k_new[:, :1], v_new[:, :1])


def test_paged_decode_stacked_int8_matches_dequant_reference(rng):
    """int8 page pool: the quant kernel's factored-scale math must equal
    attention over the EXPLICITLY dequantized pages (exact same quantized
    values, so tolerance is float noise, not quantization error)."""
    from video_r2_tpu.models.decoder import quantize_kv
    from video_r2_tpu.ops.paged_attention import paged_decode_attention_stacked

    B, nh, kh, hd, ps, L_layers = 3, 4, 2, 64, 16, 2
    lengths = np.asarray([37, 16, 100])
    n_pages, max_pages = 64, 8
    kf = rng.normal(size=(L_layers, kh, n_pages, ps, hd)).astype(np.float32)
    vf = rng.normal(size=(L_layers, kh, n_pages, ps, hd)).astype(np.float32)
    kq, ks = quantize_kv(jnp.asarray(kf))
    vq, vs = quantize_kv(jnp.asarray(vf))
    # dequantized pages for the reference path
    kd = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    vd = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
    tables = np.full((B, max_pages), 0, np.int32)
    used = iter(range(1, n_pages))
    for b in range(B):
        for p in range(-(-int(lengths[b]) // ps)):
            tables[b, p] = next(used)
    q = rng.normal(size=(B, nh, hd)).astype(np.float32)
    out0 = None
    for layer in range(L_layers):
        ref = _reference(q, kd[layer], vd[layer], tables, lengths, ps)
        out = paged_decode_attention_stacked(
            jnp.asarray(q), kq, vq, jnp.asarray(tables),
            jnp.asarray(lengths), jnp.int32(layer), page_size=ps,
            interpret=True, k_scales=ks, v_scales=vs)
        if layer == 0:
            out0 = out
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                                   atol=2e-5)
    # and the int8 path stays close to the UNquantized attention
    out_f = paged_decode_attention_stacked(
        jnp.asarray(q), jnp.asarray(kf), jnp.asarray(vf),
        jnp.asarray(tables), jnp.asarray(lengths), jnp.int32(0),
        page_size=ps, interpret=True)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out_f),
                               rtol=0.1, atol=0.05)


def test_quantized_cache_manager_append(rng):
    from video_r2_tpu.ops.paged_attention import PagedKVCache

    cache = PagedKVCache.create(num_layers=2, num_pages=10, page_size=4,
                                kv_heads=2, head_dim=8, batch=2, max_pages=4,
                                quantized=True)
    assert cache.quantized and cache.k.dtype == jnp.int8
    assert cache.k_scale.shape == (2, 2, 10, 4)
    k_new = jnp.asarray(rng.normal(size=(2, 1, 2, 8)).astype(np.float32))
    cache.append_token(np.asarray([0]), k_new, k_new + 1)
    p0 = int(cache.page_tables[0, 0])
    deq = (np.asarray(cache.k[:, :, p0, 0], np.float32)
           * np.asarray(cache.k_scale[:, :, p0, 0])[..., None])
    np.testing.assert_allclose(
        deq, np.asarray(jnp.swapaxes(k_new, 1, 2)[:, :, 0]),
        rtol=0.02, atol=0.02)


def test_paged_decode_stacked_multi_query_matches_reference(rng):
    """W-query verify chunks (speculative decoding on paged KV): query i at
    position lengths[b]-1+i attends keys < lengths[b]+i — parity vs a dense
    causal-within-chunk oracle, bf16-fp32 pages and int8 pages, including a
    chunk that CROSSES a page boundary."""
    from video_r2_tpu.models.decoder import quantize_kv
    from video_r2_tpu.ops.paged_attention import paged_decode_attention_stacked

    B, nh, kh, hd, ps, W, L_layers = 3, 4, 2, 64, 16, 5, 2
    # lengths chosen so [L, L+W) stays inside / crosses / starts a page
    lengths = np.asarray([37, 14, 32])
    n_pages = 32
    kf = rng.normal(size=(L_layers, kh, n_pages, ps, hd)).astype(np.float32)
    vf = rng.normal(size=(L_layers, kh, n_pages, ps, hd)).astype(np.float32)
    tables = np.zeros((B, 8), np.int32)
    used = iter(range(1, n_pages))
    for b in range(B):
        for p in range(-(-(int(lengths[b]) + W - 1) // ps)):
            tables[b, p] = next(used)
    q = rng.normal(size=(B, W, nh, hd)).astype(np.float32)

    def oracle(kp, vp, layer):
        outs = []
        max_len = int(lengths.max()) + W
        for b in range(B):
            k = np.zeros((1, max_len, kh, hd), np.float32)
            v = np.zeros_like(k)
            span = int(lengths[b]) + W - 1
            for p in range(-(-span // ps)):
                start = p * ps
                cnt = min(ps, span - start)
                k[0, start:start + cnt] = np.moveaxis(
                    kp[layer, :, tables[b, p], :cnt], 0, 1)
                v[0, start:start + cnt] = np.moveaxis(
                    vp[layer, :, tables[b, p], :cnt], 0, 1)
            j = np.arange(max_len)[None, :]
            i = np.arange(W)[:, None]
            bias = np.where(j < int(lengths[b]) + i, 0.0,
                            -1e30).astype(np.float32)[None, None]
            out = _xla_attention(jnp.asarray(q[b:b + 1]), jnp.asarray(k),
                                 jnp.asarray(v), jnp.asarray(bias))
            outs.append(np.asarray(out)[0])
        return np.stack(outs)

    for layer in range(L_layers):
        out = paged_decode_attention_stacked(
            jnp.asarray(q), jnp.asarray(kf), jnp.asarray(vf),
            jnp.asarray(tables), jnp.asarray(lengths), jnp.int32(layer),
            page_size=ps, interpret=True)
        np.testing.assert_allclose(np.asarray(out), oracle(kf, vf, layer),
                                   rtol=2e-5, atol=2e-5)

    # int8 pages: quantize, compare against the dequantized oracle
    kq, ks = quantize_kv(jnp.asarray(kf))
    vq, vs = quantize_kv(jnp.asarray(vf))
    kdq = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    vdq = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
    out = paged_decode_attention_stacked(
        jnp.asarray(q), kq, vq, jnp.asarray(tables), jnp.asarray(lengths),
        jnp.int32(0), page_size=ps, interpret=True,
        k_scales=ks, v_scales=vs)
    np.testing.assert_allclose(np.asarray(out), oracle(kdq, vdq, 0),
                               rtol=2e-4, atol=2e-4)
