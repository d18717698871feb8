"""Paged-attention decode kernel (Pallas TPU) + paged KV cache manager.

TPU-native equivalent of vLLM's paged attention (reference N5, SURVEY §2.4):
the KV cache lives in HBM as fixed-size pages; each sequence owns a page
table, so batches of ragged, continuously-batched sequences share one pool
with no per-sequence max-length reservation.

Kernel: one grid program per (sequence, kv-head). Pages are DMA'd
HBM -> VMEM double-buffered and reduced with an online softmax over the
grouped query heads — identical math to the flash kernel but gathering
through the page table (scalar-prefetched so indexing happens before the
body runs).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_PAGE_SIZE = 128


def _paged_decode_kernel(lengths_ref, tables_ref, q_ref, kp_ref, vp_ref,
                         o_ref, k_scratch, v_scratch, sem,
                         *, page_size: int, scale: float, max_pages: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    L = lengths_ref[b]
    n_pages = pl.cdiv(L, page_size)

    q = q_ref[0, 0].astype(jnp.float32) * scale          # [g, hd]
    g, hd = q.shape

    def dma(slot, p_idx):
        page_id = tables_ref[b, p_idx]
        return (
            pltpu.make_async_copy(kp_ref.at[h, page_id],
                                  k_scratch.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(vp_ref.at[h, page_id],
                                  v_scratch.at[slot], sem.at[slot, 1]),
        )

    # warm-up: start page 0
    for c in dma(0, 0):
        c.start()

    def body(p, carry):
        acc, m_i, l_i = carry
        slot = p % 2
        nxt = (p + 1) % 2

        @pl.when(p + 1 < n_pages)
        def _():
            for c in dma(nxt, p + 1):
                c.start()

        for c in dma(slot, p):
            c.wait()

        k = k_scratch[slot].astype(jnp.float32)          # [P, hd]
        v = v_scratch[slot].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [g, P]
        kpos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (g, page_size), 1)
        s = jnp.where(kpos < L, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        pexp = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(pexp, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            pexp, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((g, hd), jnp.float32)
    m_i = jnp.full((g, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((g, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, n_pages, body, (acc, m_i, l_i))
    o_ref[0, 0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _paged_decode_kernel_stacked(lengths_ref, tables_ref, layer_ref, q_ref,
                                 kp_ref, vp_ref, o_ref, k_scratch, v_scratch,
                                 sem, *, page_size: int, scale: float,
                                 max_pages: int, num_queries: int = 1):
    """num_queries > 1 (speculative verify chunks): the q block carries W
    stacked query tokens as [W*g, hd] rows; query i sits at cache position
    L-1+i and may attend keys < L+i (causal within the chunk), expressed as
    a per-row offset on the page mask. W=1 reproduces plain decode."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    L = lengths_ref[b]
    lyr = layer_ref[0]
    n_pages = pl.cdiv(L + num_queries - 1, page_size)

    q = q_ref[0, 0].astype(jnp.float32) * scale          # [W*g, hd]
    rows, hd = q.shape
    g = rows // num_queries
    # query index per q row (rows are [W, g] flattened)
    qi = jax.lax.broadcasted_iota(jnp.int32, (rows, page_size), 0) // g

    def dma(slot, p_idx):
        page_id = tables_ref[b, p_idx]
        return (
            pltpu.make_async_copy(kp_ref.at[lyr, h, page_id],
                                  k_scratch.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(vp_ref.at[lyr, h, page_id],
                                  v_scratch.at[slot], sem.at[slot, 1]),
        )

    # 3-deep DMA pipeline: 32 KB page copies are latency-bound, so keep two
    # pages in flight ahead of the one being reduced
    for c in dma(0, 0):
        c.start()

    @pl.when(n_pages > 1)
    def _():
        for c in dma(1, 1):
            c.start()

    def body(p, carry):
        acc, m_i, l_i = carry
        slot = p % 3

        @pl.when(p + 2 < n_pages)
        def _():
            for c in dma((p + 2) % 3, p + 2):
                c.start()

        for c in dma(slot, p):
            c.wait()

        k = k_scratch[slot].astype(jnp.float32)          # [P, hd]
        v = v_scratch[slot].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kpos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (rows, page_size), 1)
        s = jnp.where(kpos < L + qi, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        pexp = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(pexp, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            pexp, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((rows, hd), jnp.float32)
    m_i = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((rows, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, n_pages, body, (acc, m_i, l_i))
    o_ref[0, 0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _paged_decode_kernel_stacked_quant(lengths_ref, tables_ref, layer_ref,
                                       q_ref, kp_ref, vp_ref, ks_ref, vs_ref,
                                       o_ref, k_scratch, v_scratch,
                                       ks_scratch, vs_scratch, sem, *,
                                       page_size: int, scale: float,
                                       max_pages: int, num_queries: int = 1):
    """int8-page variant: per-(token, head) absmax scales ride in their own
    scale pages and factor OUT of both dots (quant_dot_product_attention
    math — q.(k_q*s) == (q.k_q)*s and sum p*(v_q*s) == sum (p*s)*v_q), so
    the page DMAs are half the bytes and nothing dequantized ever
    materializes in HBM."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    L = lengths_ref[b]
    lyr = layer_ref[0]
    n_pages = pl.cdiv(L + num_queries - 1, page_size)

    q = q_ref[0, 0].astype(jnp.float32) * scale          # [W*g, hd]
    rows, hd = q.shape
    g = rows // num_queries
    qi = jax.lax.broadcasted_iota(jnp.int32, (rows, page_size), 0) // g

    def dma(slot, p_idx):
        page_id = tables_ref[b, p_idx]
        return (
            pltpu.make_async_copy(kp_ref.at[lyr, h, page_id],
                                  k_scratch.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(vp_ref.at[lyr, h, page_id],
                                  v_scratch.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(ks_ref.at[lyr, h, page_id],
                                  ks_scratch.at[slot], sem.at[slot, 2]),
            pltpu.make_async_copy(vs_ref.at[lyr, h, page_id],
                                  vs_scratch.at[slot], sem.at[slot, 3]),
        )

    for c in dma(0, 0):
        c.start()

    @pl.when(n_pages > 1)
    def _():
        for c in dma(1, 1):
            c.start()

    def body(p, carry):
        acc, m_i, l_i = carry
        slot = p % 3

        @pl.when(p + 2 < n_pages)
        def _():
            for c in dma((p + 2) % 3, p + 2):
                c.start()

        for c in dma(slot, p):
            c.wait()

        k = k_scratch[slot].astype(jnp.float32)          # [P, hd] int8->f32
        v = v_scratch[slot].astype(jnp.float32)
        ks = ks_scratch[slot].astype(jnp.float32)        # [P]
        vs = vs_scratch[slot].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * ks[None, :]                              # factored k scales
        kpos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (rows, page_size), 1)
        s = jnp.where(kpos < L + qi, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        pexp = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(pexp, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            pexp * vs[None, :], v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # factored v scales
        return acc, m_new, l_new

    acc = jnp.zeros((rows, hd), jnp.float32)
    m_i = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((rows, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, n_pages, body, (acc, m_i, l_i))
    o_ref[0, 0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("page_size", "interpret", "mesh"))
def paged_decode_attention_stacked(
    q: jax.Array,            # [B, nh, hd] single decode step
    k_pages: jax.Array,      # [L, kh, N_pages, page_size, hd] full stack
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, max_pages] int32
    lengths: jax.Array,      # [B]
    layer: jax.Array,        # scalar int32 — layer to read
    page_size: int = DEFAULT_PAGE_SIZE,
    interpret: bool = False,
    k_scales: jax.Array | None = None,  # [L, kh, N_pages, page_size] f32
    v_scales: jax.Array | None = None,  # (int8 pages)
    mesh=None,                          # TP serving: kv heads over "tp"
) -> jax.Array:
    """Like paged_decode_attention but reads one layer out of the stacked
    page pool (scalar-prefetched index) — the pool stays put in HBM inside
    the decode layer scan, no per-layer slice materialization. With
    k_scales/v_scales the pages are int8 (half the KV bytes -> ~2x page
    capacity per HBM GB) and the scales factor out of both dots.

    q may also be [B, W, nh, hd] — a W-token speculative verify chunk whose
    token i sits at position lengths[b]-1+i (its K/V already written to the
    pages); the kernel applies the causal-within-chunk mask per query row.
    Returns [B, W, nh, hd] in that case.

    mesh: tensor-parallel paged serving (the reference judge runs vLLM at
    --tensor-parallel-size 4, train/serve_llm/serve_qwen3.sh:13). The
    kernel's (B, kh) grid is head-separable, so each "tp" shard runs the
    unchanged kernel over its own kv heads' pages — a partial-manual
    shard_map (manual over "tp" only; everything around it stays GSPMD)
    with q/pages/scales split on the head axis and tables/lengths
    replicated. No collective inside: head outputs concatenate."""
    if mesh is not None:
        tp = dict(mesh.shape).get("tp", 1)
        kh_g = k_pages.shape[1]
        if tp > 1 and kh_g % tp == 0:
            from jax.sharding import PartitionSpec as P

            qspec = (P(None, None, "tp", None) if q.ndim == 4
                     else P(None, "tp", None))
            pspec = P(None, "tp", None, None, None)
            inner = functools.partial(
                paged_decode_attention_stacked, page_size=page_size,
                interpret=interpret, mesh=None)
            if k_scales is not None:
                sspec = P(None, "tp", None, None)
                fn = jax.shard_map(
                    lambda q_, kp, vp, tb, ln, ly, ks, vs: inner(
                        q_, kp, vp, tb, ln, ly, k_scales=ks, v_scales=vs),
                    mesh=mesh,
                    in_specs=(qspec, pspec, pspec, P(), P(), P(),
                              sspec, sspec),
                    out_specs=qspec, axis_names={"tp"}, check_vma=False)
                return fn(q, k_pages, v_pages, page_tables, lengths, layer,
                          k_scales, v_scales)
            fn = jax.shard_map(
                inner, mesh=mesh,
                in_specs=(qspec, pspec, pspec, P(), P(), P()),
                out_specs=qspec, axis_names={"tp"}, check_vma=False)
            return fn(q, k_pages, v_pages, page_tables, lengths, layer)
        # tp == 1 (or doesn't divide kv heads): single-program fall-through
    if q.ndim == 4:
        B, W, nh, hd = q.shape
        multi = True
    else:
        B, nh, hd = q.shape
        W, multi = 1, False
    kh = k_pages.shape[1]
    g = nh // kh
    max_pages = page_tables.shape[1]
    # [B, W, kh, g, hd] -> [B, kh, W*g, hd]: rows ordered [W, g] so the
    # kernel recovers the query index as row // g
    qg = (q.reshape(B, W, kh, g, hd).transpose(0, 2, 1, 3, 4)
          .reshape(B, kh, W * g, hd))
    quant = k_scales is not None

    if quant:
        if page_size % 128 != 0 and not interpret:
            # the per-page scale DMA slices a [page_size] f32 run out of
            # the (1, 128)-tiled scale pool — real Mosaic rejects slices
            # not aligned to the 128-lane tiling (caught on chip r5;
            # interpret mode accepts silently). The value pages are fine
            # (their minor dim is hd). Engines default to page_size=128.
            raise ValueError(
                f"int8 paged KV needs page_size % 128 == 0 on TPU "
                f"(got {page_size}): the scale-page DMA must stay "
                f"lane-aligned")
        kernel = functools.partial(
            _paged_decode_kernel_stacked_quant, page_size=page_size,
            scale=hd ** -0.5, max_pages=max_pages, num_queries=W)
        extra_in = [pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY)]
        extra_args = (k_scales, v_scales)
        scratch = [
            pltpu.VMEM((3, page_size, hd), k_pages.dtype),
            pltpu.VMEM((3, page_size, hd), v_pages.dtype),
            pltpu.VMEM((3, page_size), k_scales.dtype),
            pltpu.VMEM((3, page_size), v_scales.dtype),
            pltpu.SemaphoreType.DMA((3, 4)),
        ]
    else:
        kernel = functools.partial(
            _paged_decode_kernel_stacked, page_size=page_size,
            scale=hd ** -0.5, max_pages=max_pages, num_queries=W)
        extra_in = []
        extra_args = ()
        scratch = [
            pltpu.VMEM((3, page_size, hd), k_pages.dtype),
            pltpu.VMEM((3, page_size, hd), v_pages.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, kh),
            in_specs=[
                pl.BlockSpec((1, 1, W * g, hd),
                             lambda b, h, L, T, lyr: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                *extra_in,
            ],
            out_specs=pl.BlockSpec((1, 1, W * g, hd),
                                   lambda b, h, L, T, lyr: (b, h, 0, 0)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, kh, W * g, hd), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1), qg, k_pages, v_pages,
      *extra_args)
    if multi:
        return (out.reshape(B, kh, W, g, hd).transpose(0, 2, 1, 3, 4)
                .reshape(B, W, nh, hd))
    return out.reshape(B, nh, hd)


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def paged_decode_attention(
    q: jax.Array,            # [B, nh, hd] single decode step
    k_pages: jax.Array,      # [kh, N_pages, page_size, hd]
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, max_pages] int32
    lengths: jax.Array,      # [B] int32 tokens in cache per sequence
    page_size: int = DEFAULT_PAGE_SIZE,
    interpret: bool = False,
) -> jax.Array:
    B, nh, hd = q.shape
    kh = k_pages.shape[0]
    g = nh // kh
    max_pages = page_tables.shape[1]
    qg = q.reshape(B, kh, g, hd)

    kernel = functools.partial(
        _paged_decode_kernel, page_size=page_size, scale=hd ** -0.5,
        max_pages=max_pages)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, kh),
            in_specs=[
                pl.BlockSpec((1, 1, g, hd), lambda b, h, L, T: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),      # k_pages stay in HBM
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, g, hd), lambda b, h, L, T: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, page_size, hd), k_pages.dtype),
                pltpu.VMEM((2, page_size, hd), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, kh, g, hd), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
      qg, k_pages, v_pages)
    return out.reshape(B, nh, hd)


# ---------------------------------------------------------------------------
# Host-side paged cache manager (the vLLM block allocator role)
# ---------------------------------------------------------------------------

@dataclass
class PagedKVCache:
    """Paged cache pool for one decoder layer stack.

    k/v: [L, kh, N_pages, page_size, hd] (kv-head leading so the decode
    kernel can DMA one head's page without breaking HBM tiling). Page tables
    and the free list live on host (allocation is control flow); appends are
    jitted scatter updates.
    """

    k: jax.Array
    v: jax.Array
    page_size: int
    page_tables: np.ndarray      # [B, max_pages] int32, -1 = unallocated
    lengths: np.ndarray          # [B]
    free_pages: list[int]
    refcount: np.ndarray = None  # [N_pages] int32: sharers per page (prefix
                                 # sharing — vLLM block refcounting)
    # Automatic prefix cache (vLLM APC): full prompt pages are content-
    # addressed by a chain hash over their token ids; released pages with a
    # registered hash park in an LRU `evictable` pool instead of the free
    # list, and `_alloc` evicts the oldest only under pressure. A later
    # prompt sharing the prefix re-acquires the pages without recompute.
    hash_to_page: dict = None    # chain-hash bytes -> page id
    page_hash: dict = None       # page id -> chain-hash bytes
    evictable: dict = None       # page id -> None, insertion-ordered (LRU)
    # int8 pool: per-(token, head) absmax scales [L, kh, N_pages, page_size]
    # (quantize_kv scheme — CLAUDE.md int8 KV cache); None for bf16 pools
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def create(cls, num_layers: int, num_pages: int, page_size: int,
               kv_heads: int, head_dim: int, batch: int, max_pages: int,
               dtype=jnp.bfloat16, quantized: bool = False) -> "PagedKVCache":
        shape = (num_layers, kv_heads, num_pages, page_size, head_dim)
        if quantized:
            sshape = shape[:-1]
            extra = dict(k=jnp.zeros(shape, jnp.int8),
                         v=jnp.zeros(shape, jnp.int8),
                         k_scale=jnp.zeros(sshape, jnp.float32),
                         v_scale=jnp.zeros(sshape, jnp.float32))
        else:
            extra = dict(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))
        return cls(
            page_size=page_size,
            page_tables=np.full((batch, max_pages), -1, np.int32),
            lengths=np.zeros((batch,), np.int32),
            free_pages=list(range(num_pages - 1, -1, -1)),
            refcount=np.zeros((num_pages,), np.int32),
            hash_to_page={}, page_hash={}, evictable={},
            **extra,
        )

    def available_pages(self) -> int:
        """Pages allocatable right now: truly free + evictable cached."""
        return len(self.free_pages) + len(self.evictable)

    def _uncache(self, p: int) -> None:
        h = self.page_hash.pop(p, None)
        if h is not None and self.hash_to_page.get(h) == p:
            del self.hash_to_page[h]

    def _alloc(self) -> int:
        if not self.free_pages:
            if self.evictable:
                # evict the least-recently-used cached page
                p = next(iter(self.evictable))
                del self.evictable[p]
                self._uncache(p)
                self.free_pages.append(p)
            else:
                raise RuntimeError("paged KV cache out of pages")
        p = self.free_pages.pop()
        self.refcount[p] = 1
        return p

    # -- automatic prefix cache (content-addressed full pages) --------------
    def cache_pages(self, hashes: list, pids: list) -> None:
        """Register pages under their chain hashes (first writer wins — a
        concurrent duplicate prefill keeps its private uncached copy)."""
        for h, p in zip(hashes, pids):
            if h not in self.hash_to_page and p not in self.page_hash:
                self.hash_to_page[h] = int(p)
                self.page_hash[int(p)] = h

    def match_pages(self, hashes: list) -> list[int]:
        """Acquire the longest cached run of `hashes` (refcount++ per hit;
        evictable hits return to live). Stops at the first miss."""
        out = []
        for h in hashes:
            p = self.hash_to_page.get(h)
            if p is None:
                break
            if p in self.evictable:
                del self.evictable[p]
            self.refcount[p] += 1
            out.append(p)
        return out

    def release_pages(self, pids: list[int]) -> None:
        """Drop one reference per listed page (undo of match_pages)."""
        for p in pids:
            p = int(p)
            self.refcount[p] -= 1
            if self.refcount[p] <= 0:
                self.refcount[p] = 0
                if p in self.page_hash:
                    self.evictable[p] = None
                else:
                    self.free_pages.append(p)

    def ensure_capacity(self, seq: int, new_tokens: int) -> None:
        """Allocate pages so sequence `seq` can hold `lengths[seq]+new_tokens`."""
        need = -(-(int(self.lengths[seq]) + new_tokens) // self.page_size)
        have = int((self.page_tables[seq] >= 0).sum())
        for slot in range(have, need):
            self.page_tables[seq, slot] = self._alloc()

    def share_prefix(self, src: int, dst: int, cow_last: bool) -> int | None:
        """Point `dst` at `src`'s pages (refcount++). If cow_last, the last
        used page gets a private copy slot for dst (the next decode token
        writes into it) — returns (old_pid, new_pid) info via the new pid so
        the caller can issue the device copy; None when no CoW needed."""
        used = int((self.page_tables[src] >= 0).sum())
        self.page_tables[dst] = self.page_tables[src]
        for p in self.page_tables[src][:used]:
            self.refcount[int(p)] += 1
        self.lengths[dst] = self.lengths[src]
        if not cow_last or used == 0:
            return None
        old = int(self.page_tables[dst, used - 1])
        new = self._alloc()
        self.refcount[old] -= 1
        self.page_tables[dst, used - 1] = new
        return (old, new)

    def release(self, seq: int) -> None:
        self.release_pages([int(p) for p in self.page_tables[seq] if p >= 0])
        self.page_tables[seq] = -1
        self.lengths[seq] = 0

    def append_token(self, seq_ids: np.ndarray, k_new: jax.Array,
                     v_new: jax.Array) -> None:
        """Append one token's KV for each listed sequence.
        k_new/v_new: [L, len(seq_ids), kh, hd]."""
        for s in seq_ids:
            self.ensure_capacity(int(s), 1)
        pos = self.lengths[seq_ids]
        page_idx = self.page_tables[seq_ids, pos // self.page_size]
        offset = pos % self.page_size
        pid = jnp.asarray(page_idx)
        off = jnp.asarray(offset)
        # k_new: [L, B_sel, kh, hd] -> write at [:, kh, page, offset]
        kn = jnp.swapaxes(k_new, 1, 2)
        vn = jnp.swapaxes(v_new, 1, 2)
        if self.quantized:
            from ..models.decoder import quantize_kv

            kq, ks = quantize_kv(kn)
            vq, vs = quantize_kv(vn)
            self.k = self.k.at[:, :, pid, off].set(kq)
            self.v = self.v.at[:, :, pid, off].set(vq)
            self.k_scale = self.k_scale.at[:, :, pid, off].set(ks)
            self.v_scale = self.v_scale.at[:, :, pid, off].set(vs)
        else:
            self.k = self.k.at[:, :, pid, off].set(kn)
            self.v = self.v.at[:, :, pid, off].set(vn)
        self.lengths[seq_ids] += 1
