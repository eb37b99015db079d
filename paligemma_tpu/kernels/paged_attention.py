"""Pallas paged decode attention: single-token attention over a shared
physical page pool addressed through a per-sequence page table.

Why paging: the slot-pool serving engine (runtime/serving.py) preallocates
``max_slots x max_seq_len`` KV rows, so HBM reservation — not compute —
caps the slot count. Paging keeps KV in fixed-size pages drawn from one
shared pool, so a mix of short and long sequences shares HBM by *actual*
length (the vLLM PagedAttention idea, done the TPU way — PAPERS.md "Ragged
Paged Attention"). The reference has no analog at all: it serves B==1 with
a torch.cat Python-list cache (ref: modeling_gemma.py:8-64,
processing_paligemma.py:174).

Kernel shape (derived from kernels/decode_attention.py — same online
softmax, same DMA-skip trick; only the KV addressing differs):

* pool is viewed as ``(n_pages, page_size, Hkv*D)``; the kv-block grid
  dimension walks each row's *logical* pages and the BlockSpec index map
  translates logical -> physical through the scalar-prefetched page table,
  so the pipeline DMAs exactly the pages that hold the row's tokens;
* logical pages past the row's last page clamp to the last valid page
  (same physical block index => Mosaic skips the re-fetch) and their
  compute is skipped with ``pl.when``;
* GQA query heads sharing a KV head fold into the row dimension, so each
  page streams once per KV head;
* masking is ``col < kv_len`` — serving slots are contiguous ``[0, len)``
  by construction (prompts are written densely; decode appends).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    # scalar prefetch (SMEM)
    lay_ref,  # (1,) int32: layer index into the stacked pool (0 if unstacked)
    pt_ref,  # (B, P_max) int32 page table: logical -> physical page
    lastpb_ref,  # (B,) int32: last logical page index each row needs
    kvlen_ref,  # (B,) int32: tokens valid in [0, kv_len)
    # blocks (VMEM)
    q_ref,  # (1, 1, G_pad, D)
    k_ref,  # (1, page_size, D) — (1, 1, page_size, D) when layer-stacked
    v_ref,
    o_ref,  # (1, 1, G_pad, D)
    # scratch
    acc_ref,  # (G_pad, D) f32
    m_ref,  # (G_pad, 128) f32
    l_ref,  # (G_pad, 128) f32
    *,
    scale: float,
    page_size: int,
):
    b = pl.program_id(0)
    pb = pl.program_id(2)
    n_pb = pl.num_programs(2)

    @pl.when(pb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # m starts at the TRUE -inf surrogate (NEG_INF), so the softmax is
        # exact even when every valid score is deeply negative (< -88,
        # where exp(s - 0) would underflow with an m==0 init and emit an
        # all-zero output). Masked columns are re-masked in p below, so a
        # fully-masked block contributes nothing; rows with kv_len == 0
        # keep l == 0 and the final guard emits exact zeros.
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(pb <= lastpb_ref[b])
    def _compute():
        g_pad = q_ref.shape[2]
        q = q_ref[0, 0]  # (G_pad, D)
        k = k_ref[...].reshape(page_size, q.shape[-1])
        v = v_ref[...].reshape(page_size, q.shape[-1])
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (G_pad, page_size) fp32

        col = (
            jax.lax.broadcasted_iota(jnp.int32, (g_pad, page_size), 1)
            + pb * page_size
        )
        s = jnp.where(col < kvlen_ref[b], s, NEG_INF)

        m_i = m_ref[...][:, :1]
        l_i = l_ref[...][:, :1]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        # re-mask p: with m_new == NEG_INF (nothing valid yet) the masked
        # scores would otherwise exp(s - m_new) == exp(0) == 1
        p = jnp.where(col < kvlen_ref[b], jnp.exp(s - m_new), 0.0)
        # alpha: exp(NEG_INF - NEG_INF) == 1 between fully-masked blocks is
        # harmless (l_i == 0, acc == 0); once m_new is a real max,
        # exp(NEG_INF - m_new) underflows to the correct 0
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(pb == n_pb - 1)
    def _finish():
        l = l_ref[...][:, :1]
        out = acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = out.astype(o_ref.dtype)


def supported(page_size: int, head_dim: int) -> bool:
    """Static check the serving engine uses to pick kernel vs XLA gather."""
    return page_size % 16 == 0 and head_dim % 128 == 0


def paged_decode_attention(
    q: jnp.ndarray,  # (B, Hq, D) — ONE query token per row
    k_pool: jnp.ndarray,  # (n_pages, page_size, Hkv, D) or (L, n_pages, ...)
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, P_max) int32 physical page ids
    kv_len: jnp.ndarray,  # (B,) int32: valid tokens (incl. this one)
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    layer_idx: Optional[jnp.ndarray] = None,  # scalar int32 when pool is (L, ...)
) -> jnp.ndarray:
    """Length-aware paged decode attention. Returns (B, Hq, D).

    Rows with ``kv_len == 0`` (inactive slots) return zeros. Page-table
    entries past a row's last logical page may hold anything (stale /
    sentinel ids are fine — they are clamped and never read).

    ``layer_idx``: when the pool carries the whole layer stack
    ``(L, n_pages, page_size, Hkv, D)`` (the scan-carry layout,
    models/gemma.forward_paged_decode), pass the layer to attend — the
    BlockSpec index map selects that layer's pages directly, so no
    layer-sized slice of the pool is ever materialized."""
    b, hq, d = q.shape
    if layer_idx is None:
        assert k_pool.ndim == 4, k_pool.shape
        page_size, hkv = k_pool.shape[1], k_pool.shape[2]
        n_pages = k_pool.shape[0]
        lay = jnp.zeros((1,), jnp.int32)
        # unstacked pools get a unit layer axis so one kernel serves both
        k_pool = k_pool[None]
        v_pool = v_pool[None]
    else:
        assert k_pool.ndim == 5, k_pool.shape
        page_size, hkv = k_pool.shape[2], k_pool.shape[3]
        n_pages = k_pool.shape[1]
        lay = jnp.reshape(layer_idx.astype(jnp.int32), (1,))
    p_max = page_table.shape[1]
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert page_size % 16 == 0, page_size
    assert d % 128 == 0, d

    sub = 16 if q.dtype == jnp.bfloat16 else 8
    g_pad = ((group + sub - 1) // sub) * sub
    qf = q.reshape(b, hkv, group, d)
    if g_pad != group:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    # Pool viewed as (L, n_pages, page_size, Hkv*D): free reshape that puts
    # (page_size, head_dim) on the tiled (sublane, lane) positions; the
    # per-head column offset is the last block index (h).
    k2 = k_pool.reshape(k_pool.shape[0], n_pages, page_size, hkv * d)
    v2 = v_pool.reshape(v_pool.shape[0], n_pages, page_size, hkv * d)

    lastpb = jnp.maximum(kv_len.astype(jnp.int32) - 1, 0) // page_size
    # clamp logical->physical through the table ONCE here so the index map
    # stays a pure lookup: entry[b, pb>last] := entry[b, last] (same
    # physical block index => Mosaic skips the re-fetch)
    pb_ids = jnp.minimum(jnp.arange(p_max)[None, :], lastpb[:, None])
    pt = jnp.take_along_axis(page_table.astype(jnp.int32), pb_ids, axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, hkv, p_max),
        in_specs=[
            pl.BlockSpec(
                (1, 1, g_pad, d),
                lambda bi, h, pb, lyr, tab, lpb, kl: (bi, h, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, page_size, d),
                lambda bi, h, pb, lyr, tab, lpb, kl: (lyr[0], tab[bi, pb], 0, h),
            ),
            pl.BlockSpec(
                (1, 1, page_size, d),
                lambda bi, h, pb, lyr, tab, lpb, kl: (lyr[0], tab[bi, pb], 0, h),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g_pad, d),
            lambda bi, h, pb, lyr, tab, lpb, kl: (bi, h, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((g_pad, d), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, page_size=page_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # rows/heads are independent; the page walk carries the online-
            # softmax state. Without this hint Mosaic assumes every grid
            # step may depend on the last and stalls the page DMAs.
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(
        lay,
        pt,
        lastpb,
        kv_len.astype(jnp.int32),
        qf,
        k2,
        v2,
    )
    return out[:, :, :group, :].reshape(b, hq, d)


def _kernel_multi(
    # scalar prefetch (SMEM)
    lay_ref,  # (1,) int32
    pt_ref,  # (B, P_max) int32 physical page ids (pre-clamped)
    lastsb_ref,  # (B,) int32: last SUPER-block index each row needs
    kvlen_ref,  # (B,) int32
    # blocks
    q_ref,  # (1, 1, G_pad, D)
    k_pool_ref,  # (L, n_pages, page_size, Hkv*D) HBM
    v_pool_ref,  # HBM
    o_ref,  # (1, 1, G_pad, D)
    # scratch
    kbuf,  # (2, P_SUB*page_size, D)
    vbuf,
    acc_ref,  # (G_pad, D) f32
    m_ref,  # (G_pad, 128) f32
    l_ref,  # (G_pad, 128) f32
    sems,  # DMA (2, 2, P_SUB)
    *,
    scale: float,
    page_size: int,
    p_sub: int,
    head_dim: int,
    n_pages: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    s = pl.program_id(2)
    n_sb = pl.num_programs(2)
    lay = lay_ref[0]

    def dma(pool_ref, buf, kv, sb, slot, j):
        # logical page sb*p_sub + j -> physical id via the clamped table
        pid = pt_ref[b, jnp.minimum(sb * p_sub + j, pt_ref.shape[1] - 1)]
        pid = jnp.clip(pid, 0, n_pages - 1)
        return pltpu.make_async_copy(
            pool_ref.at[lay, pid, :, pl.ds(h * head_dim, head_dim)],
            buf.at[slot, pl.ds(j * page_size, page_size)],
            sems.at[kv, slot, j],
        )

    def start_super(sb, slot):
        for j in range(p_sub):
            dma(k_pool_ref, kbuf, 0, sb, slot, j).start()
            dma(v_pool_ref, vbuf, 1, sb, slot, j).start()

    def wait_super(sb, slot):
        for j in range(p_sub):
            dma(k_pool_ref, kbuf, 0, sb, slot, j).wait()
            dma(v_pool_ref, vbuf, 1, sb, slot, j).wait()

    @pl.when(s == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        start_super(0, 0)

    # prefetch the next super-block this row still needs
    @pl.when((s + 1 <= lastsb_ref[b]) & (s + 1 < n_sb))
    def _prefetch():
        start_super(s + 1, jax.lax.rem(s + 1, 2))

    @pl.when(s <= lastsb_ref[b])
    def _compute():
        slot = jax.lax.rem(s, 2)
        wait_super(s, slot)
        g_pad = q_ref.shape[2]
        width = p_sub * page_size
        q = q_ref[0, 0]  # (G_pad, D)
        k = kbuf[slot]  # (width, D)
        v = vbuf[slot]
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (G_pad, width)
        col = (
            jax.lax.broadcasted_iota(jnp.int32, (g_pad, width), 1)
            + s * width
        )
        valid = col < kvlen_ref[b]
        sc = jnp.where(valid, sc, NEG_INF)
        m_i = m_ref[...][:, :1]
        l_i = l_ref[...][:, :1]
        m_new = jnp.maximum(m_i, jnp.max(sc, axis=-1, keepdims=True))
        p = jnp.where(valid, jnp.exp(sc - m_new), 0.0)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(s == n_sb - 1)
    def _finish():
        l = l_ref[...][:, :1]
        out = acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = out.astype(o_ref.dtype)


def paged_decode_attention_multi(
    q: jnp.ndarray,  # (B, Hq, D)
    k_pool: jnp.ndarray,  # (n_pages, page_size, Hkv, D) or (L, ...)
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, P_max) int32
    kv_len: jnp.ndarray,  # (B,) int32
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    layer_idx: Optional[jnp.ndarray] = None,
    pages_per_step: int = 8,
) -> jnp.ndarray:
    """Multi-page-per-step paged decode attention (manual double-buffered
    DMA). Same contract as :func:`paged_decode_attention`.

    The one-page-per-grid-step kernel is bounded at ~140 GB/s effective by
    the fixed ~4-8 us Mosaic cost per grid step (docs/PERFORMANCE.md
    "Kernel note"). Here each grid step hand-gathers ``pages_per_step``
    pages into a VMEM ring while the previous super-block computes, so the
    per-step overhead amortizes over pages_per_step x more bytes. Skipped
    super-blocks (rows shorter than the bucket) cost no DMA traffic at
    all — only rows that need a super-block fetch it."""
    b, hq, d = q.shape
    if layer_idx is None:
        assert k_pool.ndim == 4, k_pool.shape
        page_size, hkv = k_pool.shape[1], k_pool.shape[2]
        n_pages = k_pool.shape[0]
        lay = jnp.zeros((1,), jnp.int32)
        k_pool = k_pool[None]
        v_pool = v_pool[None]
    else:
        assert k_pool.ndim == 5, k_pool.shape
        page_size, hkv = k_pool.shape[2], k_pool.shape[3]
        n_pages = k_pool.shape[1]
        lay = jnp.reshape(layer_idx.astype(jnp.int32), (1,))
    p_max = page_table.shape[1]
    p_sub = min(pages_per_step, p_max)
    n_super = (p_max + p_sub - 1) // p_sub
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert page_size % 16 == 0, page_size
    assert d % 128 == 0, d

    sub = 16 if q.dtype == jnp.bfloat16 else 8
    g_pad = ((group + sub - 1) // sub) * sub
    qf = q.reshape(b, hkv, group, d)
    if g_pad != group:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    k2 = k_pool.reshape(k_pool.shape[0], n_pages, page_size, hkv * d)
    v2 = v_pool.reshape(v_pool.shape[0], n_pages, page_size, hkv * d)

    lastpb = jnp.maximum(kv_len.astype(jnp.int32) - 1, 0) // page_size
    lastsb = lastpb // p_sub
    pb_ids = jnp.minimum(jnp.arange(p_max)[None, :], lastpb[:, None])
    pt = jnp.take_along_axis(page_table.astype(jnp.int32), pb_ids, axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, hkv, n_super),
        in_specs=[
            pl.BlockSpec(
                (1, 1, g_pad, d),
                lambda bi, h, sb, lyr, tab, lsb, kl: (bi, h, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g_pad, d),
            lambda bi, h, sb, lyr, tab, lsb, kl: (bi, h, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, p_sub * page_size, d), q.dtype),
            pltpu.VMEM((2, p_sub * page_size, d), q.dtype),
            pltpu.VMEM((g_pad, d), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, p_sub)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_multi, scale=scale, page_size=page_size, p_sub=p_sub,
            head_dim=d, n_pages=n_pages,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        lay,
        pt,
        lastsb,
        kv_len.astype(jnp.int32),
        qf,
        k2,
        v2,
    )
    return out[:, :, :group, :].reshape(b, hq, d)


def _kernel_batched(
    # scalar prefetch (SMEM)
    lay_ref,  # (1,) int32
    pt_ref,  # (B, P_max) int32 physical page ids (pre-clamped)
    lastsb_ref,  # (B,) int32 last super-block each row needs
    kvlen_ref,  # (B,) int32
    # blocks
    q_ref,  # (1, B*G_pad, D) — this kv-head's queries, rows stacked
    kvrep_ref,  # (B*G_pad, 128) int32 — kv_len broadcast per query row
    k_pool_ref,  # (L, n_pages, page_size, Hkv*D) HBM
    v_pool_ref,  # HBM
    o_ref,  # (1, B*G_pad, D)
    # scratch
    kbuf,  # (2, B, W, D)   W = p_sub*page_size
    vbuf,
    sc_buf,  # (B*G_pad, W) f32 — stacked scores, then probabilities
    pv_buf,  # (B*G_pad, D) f32
    acc_ref,  # (B*G_pad, D) f32
    m_ref,  # (B*G_pad, 128) f32
    l_ref,  # (B*G_pad, 128) f32
    sems,  # DMA (2, 2, B) — ONE semaphore per (kv, slot, row): all of a
    #        row's page copies signal it and are all waited before the
    #        buffer is read (per-page semaphores blow the 2 KB sflag space
    #        at 2*2*16*8 = 512 of them)
    *,
    scale: float,
    page_size: int,
    p_sub: int,
    g_pad: int,
    head_dim: int,
    n_pages: int,
    batch: int,
):
    h = pl.program_id(0)
    s = pl.program_id(1)
    n_sb = pl.num_programs(1)
    lay = lay_ref[0]

    def dma(pool_ref, buf, kv, r, sb, slot, j):
        pid = pt_ref[r, jnp.minimum(sb * p_sub + j, pt_ref.shape[1] - 1)]
        pid = jnp.clip(pid, 0, n_pages - 1)
        return pltpu.make_async_copy(
            pool_ref.at[lay, pid, :, pl.ds(h * head_dim, head_dim)],
            buf.at[slot, r, pl.ds(j * page_size, page_size)],
            sems.at[kv, slot, r],
        )

    def start_super(sb, slot):
        # every row that still needs super-block sb fetches it; shorter
        # rows cost zero DMA traffic here
        for r in range(batch):
            @pl.when(sb <= lastsb_ref[r])
            def _():
                for j in range(p_sub):
                    dma(k_pool_ref, kbuf, 0, r, sb, slot, j).start()
                    dma(v_pool_ref, vbuf, 1, r, sb, slot, j).start()

    @pl.when(s == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        start_super(0, 0)

    @pl.when(s + 1 < n_sb)
    def _prefetch():
        start_super(s + 1, jax.lax.rem(s + 1, 2))

    slot = jax.lax.rem(s, 2)
    width = p_sub * page_size
    qa = q_ref[0]  # (B*G_pad, D)

    # Pass A (per row, MXU): raw scores into the stacked scratch. Rows past
    # their last super-block skip everything; their stale scratch rows are
    # fully masked below (col >= kv_len there by construction).
    for r in range(batch):
        @pl.when(s <= lastsb_ref[r])
        def _():
            for j in range(p_sub):
                dma(k_pool_ref, kbuf, 0, r, s, slot, j).wait()
                dma(v_pool_ref, vbuf, 1, r, s, slot, j).wait()
            sc_buf[r * g_pad : (r + 1) * g_pad, :] = jax.lax.dot_general(
                qa[r * g_pad : (r + 1) * g_pad], kbuf[slot, r],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # Vectorized online-softmax update across ALL rows at once (one VPU
    # pass instead of `batch` small ones — the per-row variant measured
    # VPU-serialization-bound, not bandwidth-bound).
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (batch * g_pad, width), 1)
        + s * width
    )
    valid = col < kvrep_ref[...][:, :1]
    sc = jnp.where(valid, sc_buf[...] * scale, NEG_INF)
    m_i = m_ref[...][:, :1]
    l_i = l_ref[...][:, :1]
    m_new = jnp.maximum(m_i, jnp.max(sc, axis=-1, keepdims=True))
    p = jnp.where(valid, jnp.exp(sc - m_new), 0.0)
    alpha = jnp.exp(m_i - m_new)
    l_ref[...] = jnp.broadcast_to(
        l_i * alpha + jnp.sum(p, axis=-1, keepdims=True),
        (batch * g_pad, 128),
    )
    m_ref[...] = jnp.broadcast_to(m_new, (batch * g_pad, 128))
    sc_buf[...] = p  # pass B reads the probabilities back per row

    # Pass B (per row, MXU): p @ v into pv_buf; zeroed first so skipped
    # rows contribute nothing (their alpha is 1, state must not move).
    pv_buf[...] = jnp.zeros_like(pv_buf)
    for r in range(batch):
        @pl.when(s <= lastsb_ref[r])
        def _():
            pv_buf[r * g_pad : (r + 1) * g_pad, :] = jax.lax.dot_general(
                sc_buf[r * g_pad : (r + 1) * g_pad].astype(vbuf.dtype),
                vbuf[slot, r],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc_ref[...] = acc_ref[...] * alpha + pv_buf[...]

    @pl.when(s == n_sb - 1)
    def _finish():
        l = l_ref[...][:, :1]
        out = acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = out.astype(o_ref.dtype)


def paged_decode_attention_batched(
    q: jnp.ndarray,  # (B, Hq, D)
    k_pool: jnp.ndarray,  # (n_pages, page_size, Hkv, D) or (L, ...)
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, P_max) int32
    kv_len: jnp.ndarray,  # (B,) int32
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    layer_idx: Optional[jnp.ndarray] = None,
    pages_per_step: int = 8,
) -> jnp.ndarray:
    """Row-batched multi-page paged decode attention.

    Third-generation paged kernel: the grid walks SUPER-BLOCKS only
    (``ceil(P_max/pages_per_step)`` steps total) and every grid step
    hand-gathers ``pages_per_step`` pages for ALL rows at once with
    double-buffered DMA, so the fixed per-grid-step Mosaic cost (the
    one-page kernel's ~4-8 us bound) amortizes over the whole batch's
    pages and the next super-block streams while the current one computes.
    Per-row VMEM: 2 slots x 2 (k,v) x pages_per_step x page_size x D."""
    b, hq, d = q.shape
    if layer_idx is None:
        assert k_pool.ndim == 4, k_pool.shape
        page_size, hkv = k_pool.shape[1], k_pool.shape[2]
        n_pages = k_pool.shape[0]
        lay = jnp.zeros((1,), jnp.int32)
        k_pool = k_pool[None]
        v_pool = v_pool[None]
    else:
        assert k_pool.ndim == 5, k_pool.shape
        page_size, hkv = k_pool.shape[2], k_pool.shape[3]
        n_pages = k_pool.shape[1]
        lay = jnp.reshape(layer_idx.astype(jnp.int32), (1,))
    p_max = page_table.shape[1]
    p_sub = min(pages_per_step, p_max)
    n_super = (p_max + p_sub - 1) // p_sub
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert page_size % 16 == 0, page_size
    assert d % 128 == 0, d

    sub = 16 if q.dtype == jnp.bfloat16 else 8
    g_pad = ((group + sub - 1) // sub) * sub
    qf = q.reshape(b, hkv, group, d)
    if g_pad != group:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))
    # (Hkv, B*G_pad, D): one block per kv head, rows stacked
    qh = qf.transpose(1, 0, 2, 3).reshape(hkv, b * g_pad, d)

    k2 = k_pool.reshape(k_pool.shape[0], n_pages, page_size, hkv * d)
    v2 = v_pool.reshape(v_pool.shape[0], n_pages, page_size, hkv * d)

    lastpb = jnp.maximum(kv_len.astype(jnp.int32) - 1, 0) // page_size
    lastsb = lastpb // p_sub
    pb_ids = jnp.minimum(jnp.arange(p_max)[None, :], lastpb[:, None])
    pt = jnp.take_along_axis(page_table.astype(jnp.int32), pb_ids, axis=1)

    width = p_sub * page_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv, n_super),
        in_specs=[
            pl.BlockSpec(
                (1, b * g_pad, d),
                lambda h, sb, lyr, tab, lsb, kl: (h, 0, 0),
            ),
            pl.BlockSpec(
                (b * g_pad, 128),
                lambda h, sb, lyr, tab, lsb, kl: (0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, b * g_pad, d),
            lambda h, sb, lyr, tab, lsb, kl: (h, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, b, width, d), q.dtype),
            pltpu.VMEM((2, b, width, d), q.dtype),
            pltpu.VMEM((b * g_pad, width), jnp.float32),
            pltpu.VMEM((b * g_pad, d), jnp.float32),
            pltpu.VMEM((b * g_pad, d), jnp.float32),
            pltpu.VMEM((b * g_pad, 128), jnp.float32),
            pltpu.VMEM((b * g_pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, b)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_batched, scale=scale, page_size=page_size, p_sub=p_sub,
            g_pad=g_pad, head_dim=d, n_pages=n_pages, batch=b,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hkv, b * g_pad, d), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        lay,
        pt,
        lastsb,
        kv_len.astype(jnp.int32),
        qh,
        jnp.broadcast_to(
            jnp.repeat(kv_len.astype(jnp.int32), g_pad)[:, None],
            (b * g_pad, 128),
        ),
        k2,
        v2,
    )
    out = out.reshape(hkv, b, g_pad, d).transpose(1, 0, 2, 3)
    return out[:, :, :group, :].reshape(b, hq, d)


def _kernel_runs(
    # scalar prefetch (SMEM)
    lay_ref,  # (1,) int32
    pt_ref,  # (B, P_max) int32 physical page ids (pre-clamped)
    start_ref,  # (B, n_super) int32: first physical page of the super-block
    contig_ref,  # (B, n_super) int32: 1 => the whole super-block is one
    #              physically-consecutive run starting at start_ref
    lastsb_ref,  # (B,) int32 last super-block each row needs
    kvlen_ref,  # (B,) int32
    # blocks
    q_ref,  # (1, B*G_pad, D) — this kv-head's queries, rows stacked
    kvrep_ref,  # (B*G_pad, 128) int32 — kv_len broadcast per query row
    k_pool_ref,  # (L, n_pages, page_size, Hkv*D) HBM
    v_pool_ref,  # HBM
    o_ref,  # (1, B*G_pad, D)
    # scratch
    kbuf,  # (2, B, P_SUB, page_size, D)
    vbuf,
    sc_buf,  # (B*G_pad, R*W) f32 — per-GROUP stacked scores/probabilities
    pv_buf,  # (B*G_pad, D) f32
    acc_ref,  # (B*G_pad, D) f32
    m_ref,  # (B*G_pad, 128) f32
    l_ref,  # (B*G_pad, 128) f32
    sems,  # DMA (2, 2, B) — one semaphore per (kv, slot, row); every copy
    #        of that row signals it and is waited individually
    *,
    scale: float,
    page_size: int,
    p_sub: int,
    g_pad: int,
    head_dim: int,
    n_pages: int,
    batch: int,
    rows_per_mm: int,
):
    h = pl.program_id(0)
    s = pl.program_id(1)
    n_sb = pl.num_programs(1)
    lay = lay_ref[0]
    width = p_sub * page_size

    def dma_run(pool_ref, buf, kv, r, sb, slot):
        # ONE copy for the whole super-block: p_sub physically-consecutive
        # pages -> (p_sub, page_size, D). This is the entire point of the
        # kernel: DMA *issue* cost (~0.4-0.7 us each on this toolchain) is
        # the page-walk bound, so the allocator hands out consecutive runs
        # (runtime/paged_cache.py) and the kernel fetches each run with a
        # single issue instead of p_sub of them.
        first = jnp.clip(start_ref[r, sb], 0, n_pages - p_sub)
        return pltpu.make_async_copy(
            pool_ref.at[lay, pl.ds(first, p_sub), :,
                        pl.ds(h * head_dim, head_dim)],
            buf.at[slot, r],
            sems.at[kv, slot, r],
        )

    def dma_page(pool_ref, buf, kv, r, sb, slot, j):
        pid = pt_ref[r, jnp.minimum(sb * p_sub + j, pt_ref.shape[1] - 1)]
        pid = jnp.clip(pid, 0, n_pages - 1)
        return pltpu.make_async_copy(
            pool_ref.at[lay, pid, :, pl.ds(h * head_dim, head_dim)],
            buf.at[slot, r, j],
            sems.at[kv, slot, r],
        )

    def start_super(sb, slot):
        for r in range(batch):
            @pl.when((sb <= lastsb_ref[r]) & (contig_ref[r, sb] == 1))
            def _fast():
                dma_run(k_pool_ref, kbuf, 0, r, sb, slot).start()
                dma_run(v_pool_ref, vbuf, 1, r, sb, slot).start()

            @pl.when((sb <= lastsb_ref[r]) & (contig_ref[r, sb] == 0))
            def _pages():
                for j in range(p_sub):
                    dma_page(k_pool_ref, kbuf, 0, r, sb, slot, j).start()
                    dma_page(v_pool_ref, vbuf, 1, r, sb, slot, j).start()

    def wait_super(sb, slot):
        for r in range(batch):
            @pl.when((sb <= lastsb_ref[r]) & (contig_ref[r, sb] == 1))
            def _fast():
                dma_run(k_pool_ref, kbuf, 0, r, sb, slot).wait()
                dma_run(v_pool_ref, vbuf, 1, r, sb, slot).wait()

            @pl.when((sb <= lastsb_ref[r]) & (contig_ref[r, sb] == 0))
            def _pages():
                for j in range(p_sub):
                    dma_page(k_pool_ref, kbuf, 0, r, sb, slot, j).wait()
                    dma_page(v_pool_ref, vbuf, 1, r, sb, slot, j).wait()

    @pl.when(s == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        # Rows that never reach super-block 1 never DMA into vbuf slot 1,
        # yet the STACKED pv matmul still contracts over their columns
        # when a sibling row in the group is alive: p is exactly 0 there,
        # but 0 x (uninitialized VMEM) = NaN if the stale bits decode to
        # NaN/inf (observed in interpret mode; arbitrary on hardware).
        # Zeroing V's slot-1 row once makes every later read finite —
        # after that, "stale" is always a previous super-block's real
        # pool bytes. K needs no init: NaN scores die in the where() mask
        # before they can reach a contraction.
        @pl.when(n_sb > 1)
        def _sanitize():
            for r in range(batch):
                @pl.when(lastsb_ref[r] < 1)
                def _z():
                    vbuf[1, r] = jnp.zeros_like(vbuf[1, r])

        start_super(0, 0)

    @pl.when(s + 1 < n_sb)
    def _prefetch():
        start_super(s + 1, jax.lax.rem(s + 1, 2))

    slot = jax.lax.rem(s, 2)
    wait_super(s, slot)
    qa = q_ref[0]  # (B*G_pad, D)

    # Pass A (MXU): ONE stacked matmul per ROW GROUP instead of one per row
    # — the per-row variant measured small-matmul-serialization-bound (~half
    # the kernel time at B=16). Group g's scores land block-diagonally in
    # (R*G_pad, R*W); the off-diagonal row pairs are wasted FLOPs (R x) but
    # decode attention has MXU headroom to burn and the mask kills them.
    n_groups = batch // rows_per_mm
    r_rows = rows_per_mm * g_pad
    for g in range(n_groups):
        gl = lastsb_ref[g * rows_per_mm]
        for rr in range(1, rows_per_mm):
            gl = jnp.maximum(gl, lastsb_ref[g * rows_per_mm + rr])

        @pl.when(s <= gl)
        def _scores():
            kg = kbuf[slot, g * rows_per_mm : (g + 1) * rows_per_mm]
            sc_buf[g * r_rows : (g + 1) * r_rows, :] = jax.lax.dot_general(
                qa[g * r_rows : (g + 1) * r_rows],
                kg.reshape(rows_per_mm * width, head_dim),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # Vectorized online-softmax across ALL rows/groups at once. Validity:
    # the key column must belong to the SAME local row (block diagonal)
    # AND lie under the row's kv_len. Rows past their last super-block have
    # s*width + w >= kv_len everywhere, so their stale scratch is fully
    # masked and their state (m, l, acc) provably does not move.
    q_idx = jax.lax.broadcasted_iota(
        jnp.int32, (batch * g_pad, rows_per_mm * width), 0
    )
    c_idx = jax.lax.broadcasted_iota(
        jnp.int32, (batch * g_pad, rows_per_mm * width), 1
    )
    same_row = (q_idx // g_pad) % rows_per_mm == c_idx // width
    col = c_idx % width + s * width
    valid = same_row & (col < kvrep_ref[...][:, :1])
    sc = jnp.where(valid, sc_buf[...] * scale, NEG_INF)
    m_i = m_ref[...][:, :1]
    l_i = l_ref[...][:, :1]
    m_new = jnp.maximum(m_i, jnp.max(sc, axis=-1, keepdims=True))
    p = jnp.where(valid, jnp.exp(sc - m_new), 0.0)
    alpha = jnp.exp(m_i - m_new)
    l_ref[...] = jnp.broadcast_to(
        l_i * alpha + jnp.sum(p, axis=-1, keepdims=True),
        (batch * g_pad, 128),
    )
    m_ref[...] = jnp.broadcast_to(m_new, (batch * g_pad, 128))
    sc_buf[...] = p

    # Pass B (MXU): stacked p @ v per group; off-diagonal p is exactly 0,
    # so each query row only accumulates its own row's values.
    pv_buf[...] = jnp.zeros_like(pv_buf)
    for g in range(n_groups):
        gl = lastsb_ref[g * rows_per_mm]
        for rr in range(1, rows_per_mm):
            gl = jnp.maximum(gl, lastsb_ref[g * rows_per_mm + rr])

        @pl.when(s <= gl)
        def _pv():
            vg = vbuf[slot, g * rows_per_mm : (g + 1) * rows_per_mm]
            pv_buf[g * r_rows : (g + 1) * r_rows, :] = jax.lax.dot_general(
                sc_buf[g * r_rows : (g + 1) * r_rows].astype(vbuf.dtype),
                vg.reshape(rows_per_mm * width, head_dim),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc_ref[...] = acc_ref[...] * alpha + pv_buf[...]

    @pl.when(s == n_sb - 1)
    def _finish():
        l = l_ref[...][:, :1]
        out = acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = out.astype(o_ref.dtype)


def paged_decode_attention_runs(
    q: jnp.ndarray,  # (B, Hq, D)
    k_pool: jnp.ndarray,  # (n_pages, page_size, Hkv, D) or (L, ...)
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, P_max) int32
    kv_len: jnp.ndarray,  # (B,) int32
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    layer_idx: Optional[jnp.ndarray] = None,
    pages_per_step: int = 8,
    rows_per_matmul: int = 8,
) -> jnp.ndarray:
    """Run-coalesced, row-grouped paged decode attention (4th generation).

    The page-walk kernels are bounded by two serial costs this toolchain
    charges (measured, docs/PERFORMANCE.md "Kernel note"):

    * ~0.4-0.7 us of DMA *issue* cost per copy — B x pages x 2 issues per
      call for any per-page gather;
    * small-matmul serialization — one (G_pad, W) score + one (G_pad, D)
      pv dot PER ROW per step, each paying fixed MXU latency.

    This kernel attacks both. The page allocator hands out physically
    CONSECUTIVE page runs whenever it can (runtime/paged_cache.py — a
    prompt's pages are allocated in one call, so runs are the common
    case); for a super-block that is one run, the kernel fetches all
    ``pages_per_step`` pages with ONE DMA issue (B x 2 issues per
    super-block instead of B x p_sub x 2), falling back to per-page
    copies for fragmented rows. Scores/pv are computed with one stacked
    block-diagonally-masked matmul per ``rows_per_matmul`` rows instead
    of per row — R x wasted FLOPs, but decode attention is bandwidth-
    bound with idle MXU, and it removes (R-1)/R of the fixed-latency
    dots. ``rows_per_matmul`` must divide B."""
    b, hq, d = q.shape
    if layer_idx is None:
        assert k_pool.ndim == 4, k_pool.shape
        page_size, hkv = k_pool.shape[1], k_pool.shape[2]
        n_pages = k_pool.shape[0]
        lay = jnp.zeros((1,), jnp.int32)
        k_pool = k_pool[None]
        v_pool = v_pool[None]
    else:
        assert k_pool.ndim == 5, k_pool.shape
        page_size, hkv = k_pool.shape[2], k_pool.shape[3]
        n_pages = k_pool.shape[1]
        lay = jnp.reshape(layer_idx.astype(jnp.int32), (1,))
    p_max = page_table.shape[1]
    p_sub = min(pages_per_step, p_max)
    n_super = (p_max + p_sub - 1) // p_sub
    group = hq // hkv
    rows_per_mm = min(rows_per_matmul, b)
    while b % rows_per_mm:
        rows_per_mm -= 1
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert page_size % 16 == 0, page_size
    assert d % 128 == 0, d
    assert n_pages > p_sub, (n_pages, p_sub)

    sub = 16 if q.dtype == jnp.bfloat16 else 8
    g_pad = ((group + sub - 1) // sub) * sub
    qf = q.reshape(b, hkv, group, d)
    if g_pad != group:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))
    qh = qf.transpose(1, 0, 2, 3).reshape(hkv, b * g_pad, d)

    k2 = k_pool.reshape(k_pool.shape[0], n_pages, page_size, hkv * d)
    v2 = v_pool.reshape(v_pool.shape[0], n_pages, page_size, hkv * d)

    lastpb = jnp.maximum(kv_len.astype(jnp.int32) - 1, 0) // page_size
    lastsb = lastpb // p_sub
    pb_ids = jnp.minimum(jnp.arange(p_max)[None, :], lastpb[:, None])
    pt = jnp.take_along_axis(page_table.astype(jnp.int32), pb_ids, axis=1)

    # Run metadata (XLA glue, trivially cheap): a super-block is "one run"
    # iff every VALID logical page in it sits at start+j physically; pages
    # past the row's last page are don't-care (the run DMA copies whatever
    # lives there and the kv_len mask kills it), but the run must stay in
    # the pool.
    padded = n_super * p_sub
    tbl = page_table.astype(jnp.int32)
    if padded != p_max:
        tbl = jnp.pad(tbl, ((0, 0), (0, padded - p_max)))
    tbl = tbl.reshape(b, n_super, p_sub)
    start = tbl[:, :, 0]
    expect = start[:, :, None] + jnp.arange(p_sub, dtype=jnp.int32)
    logical = (
        jnp.arange(padded, dtype=jnp.int32).reshape(n_super, p_sub)[None]
    )
    care = logical <= lastpb[:, None, None]
    contig = jnp.where(care, tbl == expect, True).all(axis=2)
    contig &= (start >= 0) & (start + p_sub <= n_pages)
    contig = contig.astype(jnp.int32)

    width = p_sub * page_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(hkv, n_super),
        in_specs=[
            pl.BlockSpec(
                (1, b * g_pad, d),
                lambda h, sb, lyr, tab, st, cg, lsb, kl: (h, 0, 0),
            ),
            pl.BlockSpec(
                (b * g_pad, 128),
                lambda h, sb, lyr, tab, st, cg, lsb, kl: (0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, b * g_pad, d),
            lambda h, sb, lyr, tab, st, cg, lsb, kl: (h, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, b, p_sub, page_size, d), q.dtype),
            pltpu.VMEM((2, b, p_sub, page_size, d), q.dtype),
            pltpu.VMEM((b * g_pad, rows_per_mm * width), jnp.float32),
            pltpu.VMEM((b * g_pad, d), jnp.float32),
            pltpu.VMEM((b * g_pad, d), jnp.float32),
            pltpu.VMEM((b * g_pad, 128), jnp.float32),
            pltpu.VMEM((b * g_pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, b)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_runs, scale=scale, page_size=page_size, p_sub=p_sub,
            g_pad=g_pad, head_dim=d, n_pages=n_pages, batch=b,
            rows_per_mm=rows_per_mm,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hkv, b * g_pad, d), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        lay,
        pt,
        start,
        contig,
        lastsb,
        kv_len.astype(jnp.int32),
        qh,
        jnp.broadcast_to(
            jnp.repeat(kv_len.astype(jnp.int32), g_pad)[:, None],
            (b * g_pad, 128),
        ),
        k2,
        v2,
    )
    out = out.reshape(hkv, b, g_pad, d).transpose(1, 0, 2, 3)
    return out[:, :, :group, :].reshape(b, hq, d)


def reference_paged_decode_attention(
    q, k_pool, v_pool, page_table, kv_len, scale=None, layer_idx=None
):
    """XLA-semantics reference (testing + CPU fallback): gather the pages
    into a dense (B, P_max*page_size, Hkv, D) view and run masked GQA.
    With ``layer_idx`` the pools are layer-stacked (L, n_pages, ...) and the
    gather indexes (layer, pages) in one expression — no full-layer slice."""
    from ..ops import attention as xla_attention

    if scale is None:
        scale = q.shape[-1] ** -0.5
    if layer_idx is not None:
        k_pool = k_pool[layer_idx, page_table]  # (B, P, ps, Hkv, D)
        v_pool = v_pool[layer_idx, page_table]
    else:
        k_pool = k_pool[page_table]
        v_pool = v_pool[page_table]
    b, p_max, page_size = k_pool.shape[:3]
    k = k_pool.reshape(b, p_max * page_size, *k_pool.shape[3:])
    v = v_pool.reshape(b, p_max * page_size, *v_pool.shape[3:])
    col = jnp.arange(p_max * page_size)[None, :]
    ok = col < kv_len[:, None]
    mask = jnp.where(ok[:, None, None, :], 0.0, xla_attention.NEG_INF)
    return xla_attention.gqa(q[:, None], k, v, mask, scale=scale)[:, 0]
