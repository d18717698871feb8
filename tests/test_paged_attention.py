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
