"""Tensor-parallel PAGED decode: per-layer Pallas kernels under shard_map.

Combines the two round-3 decode designs:

* kernels/decode_layer_tp.py — the mesh-sharded per-layer split (attention
  kernel on local q heads -> psum -> MLP kernel on local gate/up/down
  columns -> psum, Megatron-style, collectives in the XLA glue) the dense
  serving engine uses under a mesh;
* kernels/decode_layer_paged.py — the page-table window read (one DMA per
  physically-consecutive page run, per-page fallback for fragmented rows)
  the paged serving engine uses single-chip.

The result lets ``PagedServingEngine(mesh=...)`` run its lockstep tick
with sharded weights over a REPLICATED page pool: Gemma is MQA (one KV
head, ref: modeling_gemma.py num_key_value_heads=1), so every shard
computes the same K/V from the replicated kv projection and holds an
identical copy of the (L, n_pages, ps, D) pool; only the q heads, o/down
rows, and gate/up columns shard. Logits come from the vocab-sharded int8
head OUTSIDE the shard_map (GSPMD inserts the all-gather) because the
paged engine's state machine carries per-slot logits for top-p sampling.

The reference has no paging, no serving, and no tensor parallelism (its
only distribution is a 25-line DDP demo, ref: test.py:6-25); this path
exists so the paged engine is first-class under the BASELINE.md
"int8 continuous-batched serving sharded over 8 chips" config.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.norms import rms_norm
from ..ops.rope import rope_cos_sin
from . import decode_layer_tp, decode_mlp


def supported(cfg, mesh: Optional[Mesh], layers, batch: int) -> bool:
    """Static gate: the dense TP requirements. ``batch`` is the GLOBAL slot
    count; with a data axis the slots (and the page pool) shard over it
    (runtime/serving_paged.py DP mode), so each shard runs ``batch / data``
    lockstep rows — decode_layer_tp.supported enforces the per-shard
    bounds."""
    if mesh is None:
        return False
    return decode_layer_tp.supported(cfg, mesh, layers, batch=batch)


# ---------------------------------------------------------------------------
# Per-layer attention kernel: local q heads, paged window fetch
# ---------------------------------------------------------------------------
def _attn_kernel_paged(
    idx_ref,  # (1,) int32 scalar prefetch: layer index
    start_ref,  # (B,) int32 first physical page IF the window is one run
    contig_ref,  # (B,) int32 1 => whole window physically consecutive
    pt_ref,  # (B, pb) int32 physical page ids (pre-clamped)
    x_ref,  # (B, K) — raw hidden state (pre-norm)
    cos_ref,  # (B, D)
    sin_ref,  # (B, D)
    cos_rep_ref,  # (B*Hl, D)
    sin_rep_ref,  # (B*Hl, D)
    bias_ref,  # (B, W) f32 additive mask: 0 attendable, -inf not
    posmask_ref,  # (B, W) f32: 1.0 at the row's write slot, else 0.0
    in_norm_ref,  # (1, 1, K) block at layer l
    q_w8_ref,  # (L, K, NQl) int8 HBM — local q heads
    q_s_ref,  # (1, 1, NQl) block at l
    kv_w8_ref,  # (L, K, 2D) int8 HBM — replicated k|v
    kv_s_ref,  # (1, 1, 2D) block at l
    o_w8_ref,  # (L, NQl, K) int8 HBM — local o rows
    o_s_ref,  # (1, 1, K) block at l
    k_pool_ref,  # (L, n_pages, ps, D) HBM — replicated page pool
    v_pool_ref,  # (L, n_pages, ps, D) HBM
    part_ref,  # (B, K) f32 out — o-proj partial (scale applied, no resid)
    k_new_ref,  # (B, D) out
    v_new_ref,  # (B, D) out
    # scratch
    qw_buf,  # (K, NQl) int8
    kvw_buf,  # (K, 2D) int8
    o_buf,  # (NQl, K) int8
    kwin,  # (B, pb, ps, D)
    vwin,  # (B, pb, ps, D)
    a_buf,  # (B, NQl)
    sems,  # DMA (3,) weight streams
    kvsems,  # DMA (2, B) — one per (tensor, row); page copies share it
    *,
    pb: int,
    page_size: int,
    n_pages: int,
    n_heads: int,  # LOCAL head count
    head_dim: int,
    eps: float,
    scale: float,
    batch: int,
):
    l = idx_ref[0]
    window = pb * page_size
    pltpu.make_async_copy(q_w8_ref.at[l], qw_buf, sems.at[0]).start()
    pltpu.make_async_copy(kv_w8_ref.at[l], kvw_buf, sems.at[1]).start()
    pltpu.make_async_copy(o_w8_ref.at[l], o_buf, sems.at[2]).start()

    # paged window fetch: run fast path / per-page fallback (same DMA
    # schedule as kernels/decode_layer_paged, minus the layer ring — this
    # kernel is per-layer, the window loads synchronously at entry)
    def dma_run(pool_ref, buf, kv, r):
        first = jnp.clip(start_ref[r], 0, n_pages - pb)
        return pltpu.make_async_copy(
            pool_ref.at[l, pl.ds(first, pb)], buf.at[r], kvsems.at[kv, r]
        )

    def dma_page(pool_ref, buf, kv, r, j):
        pid = jnp.clip(pt_ref[r, j], 0, n_pages - 1)
        return pltpu.make_async_copy(
            pool_ref.at[l, pid], buf.at[r, j], kvsems.at[kv, r]
        )

    for r in range(batch):
        @pl.when(contig_ref[r] == 1)
        def _run():
            dma_run(k_pool_ref, kwin, 0, r).start()
            dma_run(v_pool_ref, vwin, 1, r).start()

        @pl.when(contig_ref[r] == 0)
        def _pages():
            for j in range(pb):
                dma_page(k_pool_ref, kwin, 0, r, j).start()
                dma_page(v_pool_ref, vwin, 1, r, j).start()

    x = x_ref[...]
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (
        xf * jax.lax.rsqrt(ms + eps)
        * (1.0 + in_norm_ref[0].astype(jnp.float32))
    ).astype(x.dtype)

    half = head_dim // 2

    def rope2(t, c, s):  # 2-D rows only (Mosaic-safe)
        rot = jnp.concatenate([-t[:, half:], t[:, :half]], axis=-1)
        return t * c + rot * s

    pltpu.make_async_copy(kv_w8_ref.at[l], kvw_buf, sems.at[1]).wait()
    kv = jax.lax.dot_general(
        y, kvw_buf[...].astype(y.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    kv = (kv * kv_s_ref[0]).astype(y.dtype)  # (B, 2D)
    k_new = rope2(kv[:, :head_dim], cos_ref[...], sin_ref[...])
    v_new = kv[:, head_dim:]
    k_new_ref[...] = k_new.astype(k_new_ref.dtype)
    v_new_ref[...] = v_new.astype(v_new_ref.dtype)

    pltpu.make_async_copy(q_w8_ref.at[l], qw_buf, sems.at[0]).wait()
    nq = n_heads * head_dim
    q = jax.lax.dot_general(
        y, qw_buf[...].astype(y.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q = (q * q_s_ref[0]).astype(y.dtype)  # (B, NQl)
    q_all = rope2(
        q.reshape(batch * n_heads, head_dim),
        cos_rep_ref[...], sin_rep_ref[...],
    )

    # wait the window copies (each row's pages share one semaphore per
    # tensor; fragmented rows wait once per page copy)
    for r in range(batch):
        @pl.when(contig_ref[r] == 1)
        def _runw():
            dma_run(k_pool_ref, kwin, 0, r).wait()
            dma_run(v_pool_ref, vwin, 1, r).wait()

        @pl.when(contig_ref[r] == 0)
        def _pagesw():
            for j in range(pb):
                dma_page(k_pool_ref, kwin, 0, r, j).wait()
                dma_page(v_pool_ref, vwin, 1, r, j).wait()

    # Per-row MQA attention over the paged window. The window copy
    # predates this step's cache write (the glue scatters k_new/v_new
    # after the kernel), so the fresh token enters arithmetically via the
    # f32 posmask — no bool where() ((1, W) BOOL broadcasts abort this
    # Mosaic build, and local Hl can be 1).
    for b in range(batch):
        q_b = q_all[b * n_heads : (b + 1) * n_heads]  # (Hl, D)
        k_b = k_new[b : b + 1]  # (1, D)
        pm = posmask_ref[b : b + 1]  # (1, W) f32
        k_win = kwin[b].reshape(window, head_dim)
        raw = jax.lax.dot_general(
            q_b, k_win.astype(q_b.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Hl, W)
        s_new = jnp.sum(
            q_b.astype(jnp.float32) * k_b.astype(jnp.float32),
            -1, keepdims=True,
        )  # (Hl, 1)
        raw = raw * (1.0 - pm) + s_new * pm
        scores = raw * scale + bias_ref[b : b + 1]
        mx = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - mx)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        p_pos = jnp.sum(
            probs.astype(jnp.float32) * pm, -1, keepdims=True
        ).astype(x.dtype)  # (Hl, 1)
        probs = probs * (1.0 - pm).astype(x.dtype)
        v_win = vwin[b].reshape(window, head_dim)
        attn_b = jax.lax.dot_general(
            probs, v_win.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + p_pos * v_new[b : b + 1].astype(x.dtype)
        a_buf[b : b + 1, :] = attn_b.reshape(1, nq)

    pltpu.make_async_copy(o_w8_ref.at[l], o_buf, sems.at[2]).wait()
    o = jax.lax.dot_general(
        a_buf[...], o_buf[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    part_ref[...] = o * o_s_ref[0]  # fp32 partial; caller psums then casts


def attn_decode_paged_tp(
    x: jnp.ndarray,  # (B, K) raw hidden
    packed: Dict[str, jnp.ndarray],  # repack_for_tp() LOCAL tree
    k_pool: jnp.ndarray,  # (L, n_pages, ps, D) flattened MQA pool
    v_pool: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    start: jnp.ndarray,  # (B,) int32 run-start page
    contig: jnp.ndarray,  # (B,) int32 1 => one physical run
    pt: jnp.ndarray,  # (B, pb) int32 pre-clamped page ids
    bias: jnp.ndarray,  # (B, W) f32 additive validity mask
    posmask: jnp.ndarray,  # (B, W) f32: 1.0 at each row's write slot
    cos: jnp.ndarray,  # (B, D)
    sin: jnp.ndarray,
    head_dim: int,
    eps: float,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder layer's attention half on one TP shard, window read
    through the page table. Returns (o-proj partial (B, K) f32,
    k_new (B, D), v_new (B, D)); the caller scatters k/v into the pool."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k = x.shape
    q_w8 = packed["q_w8"]
    L, _, nql = q_w8.shape
    hl = nql // head_dim
    n_pages, ps = k_pool.shape[1], k_pool.shape[2]
    pb = pt.shape[1]
    window = pb * ps
    assert bias.shape == (b, window), (bias.shape, (b, window))
    cdtype = k_pool.dtype
    cos2 = cos.astype(x.dtype).reshape(b, head_dim)
    sin2 = sin.astype(x.dtype).reshape(b, head_dim)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, k), lambda g, *s: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda g, *s: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda g, *s: (0, 0)),
            pl.BlockSpec((b * hl, head_dim), lambda g, *s: (0, 0)),
            pl.BlockSpec((b * hl, head_dim), lambda g, *s: (0, 0)),
            pl.BlockSpec((b, window), lambda g, *s: (0, 0)),
            pl.BlockSpec((b, window), lambda g, *s: (0, 0)),
            pl.BlockSpec((1, 1, k), lambda g, idx, *s: (idx[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, nql), lambda g, idx, *s: (idx[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, 2 * head_dim), lambda g, idx, *s: (idx[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, k), lambda g, idx, *s: (idx[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda g, *s: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda g, *s: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda g, *s: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, nql), jnp.int8),
            pltpu.VMEM((k, 2 * head_dim), jnp.int8),
            pltpu.VMEM((nql, k), jnp.int8),
            pltpu.VMEM((b, pb, ps, head_dim), cdtype),
            pltpu.VMEM((b, pb, ps, head_dim), cdtype),
            pltpu.VMEM((b, nql), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, b)),
        ],
    )
    part, k_new, v_new = pl.pallas_call(
        functools.partial(
            _attn_kernel_paged, pb=pb, page_size=ps, n_pages=n_pages,
            n_heads=hl, head_dim=head_dim, eps=eps, scale=head_dim**-0.5,
            batch=b,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, head_dim), cdtype),
            jax.ShapeDtypeStruct((b, head_dim), cdtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(start, jnp.int32),
        jnp.asarray(contig, jnp.int32),
        jnp.asarray(pt, jnp.int32),
        x,
        cos2,
        sin2,
        jnp.repeat(cos2, hl, axis=0),
        jnp.repeat(sin2, hl, axis=0),
        bias,
        posmask,
        packed["input_norm"],
        q_w8,
        packed["q_s"],
        packed["kv_w8"],
        packed["kv_s"],
        packed["o_w8"],
        packed["o_s"],
        k_pool,
        v_pool,
    )
    return part, k_new, v_new


# ---------------------------------------------------------------------------
# The full TP paged decode step (one shard_map region + GSPMD head)
# ---------------------------------------------------------------------------
def decode_step_paged_tp(
    packed: Dict[str, Any],  # decode_layer_tp.repack_for_tp() tree
    specs: Dict[str, Any],
    cfg,  # GemmaConfig (text config)
    token: jnp.ndarray,  # (B,) int32
    pool: Dict[str, jnp.ndarray],  # k/v (L, n_pages, ps, nkv, d) REPLICATED
    page_table: jnp.ndarray,  # (B, P_max) int32
    write_pos: jnp.ndarray,  # (B,) int32
    position_ids: jnp.ndarray,  # (B,) int32
    pages_bucket: int,
    mesh: Mesh,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One paged lockstep tick, per-layer kernels per shard, psums in the
    glue, fresh K/V scattered into the (replicated) pool. Returns the
    final HIDDEN state (B, K) — the caller projects it through the
    vocab-sharded head outside the shard_map (the paged engine's state
    machine needs full logits for top-p sampling)."""
    b = token.shape[0]
    L, n_pages, ps = pool["k"].shape[0], pool["k"].shape[1], pool["k"].shape[2]
    d = cfg.head_dim
    p_max = page_table.shape[1]
    pb = min(pages_bucket, p_max)
    window = pb * ps
    write_pos = jnp.asarray(write_pos, jnp.int32).reshape(b)

    k_flat = pool["k"].reshape(L, n_pages, ps, d)
    v_flat = pool["v"].reshape(L, n_pages, ps, d)

    # run metadata (same rules as kernels/decode_layer_paged): contiguous
    # iff every NEEDED page sits at start+j physically and the run fetch
    # stays inside the pool; don't-care fallback pages clamp to the last
    # needed page
    pt = page_table[:, :pb].astype(jnp.int32)
    lastpb = write_pos // ps
    start = pt[:, 0]
    expect = start[:, None] + jnp.arange(pb, dtype=jnp.int32)[None]
    care = jnp.arange(pb, dtype=jnp.int32)[None] <= lastpb[:, None]
    contig = jnp.where(care, pt == expect, True).all(axis=1)
    # page ids are LOCAL to a data shard (runtime/paged_cache.py n_shards):
    # the run fetch must stay inside the shard's local chunk of the pool
    n_local = n_pages // int(mesh.shape.get("data", 1))
    contig &= (start >= 0) & (start + pb <= n_local)
    contig = contig.astype(jnp.int32)
    pb_ids = jnp.minimum(jnp.arange(pb, dtype=jnp.int32)[None], lastpb[:, None])
    pt_clamped = jnp.take_along_axis(pt, pb_ids, axis=1)

    bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (b, window), 1)
        <= write_pos[:, None],
        0.0, -jnp.inf,
    ).astype(jnp.float32)
    posmask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, window), 1)
        == write_pos[:, None]
    ).astype(jnp.float32)

    # where the fresh K/V lands (pages shared across layers)
    page_of = jnp.take_along_axis(
        page_table.astype(jnp.int32), (write_pos[:, None] // ps), axis=1
    )[:, 0]
    off_of = write_pos % ps

    dtype = packed["input_norm"].dtype
    cos, sin = rope_cos_sin(position_ids[:, None], d, cfg.rope_theta, dtype)
    cos = cos[:, 0]
    sin = sin[:, 0]
    eps = cfg.rms_norm_eps
    normalizer = cfg.hidden_size**0.5

    def local_fn(emb, k_flat, v_flat, start, contig, pt, bias, posmask,
                 page_of, off_of, cos, sin, pk):
        bl = emb.shape[0]  # slots LOCAL to this data shard (== b when dp=1)
        x = (emb * jnp.asarray(normalizer, emb.dtype)).astype(emb.dtype)

        def layer_body(l, carry):
            x, kp, vp = carry
            li = jnp.asarray(l, jnp.int32)
            part, k_new, v_new = attn_decode_paged_tp(
                x, pk, kp, vp, li, start, contig, pt, bias, posmask,
                cos, sin, d, eps, interpret=interpret,
            )
            part = jax.lax.psum(part, "model")
            x = x + part.astype(x.dtype)
            # pool write: each row's fresh K/V into its current page (the
            # kv projection is replicated, so every shard writes the same
            # values — the pool stays replicated)
            zero = jnp.zeros((), jnp.int32)
            for r in range(bl):
                idx = (li, page_of[r], off_of[r], zero)
                kp = jax.lax.dynamic_update_slice(
                    kp, k_new[None, r : r + 1, None].astype(kp.dtype), idx
                )
                vp = jax.lax.dynamic_update_slice(
                    vp, v_new[None, r : r + 1, None].astype(vp.dtype), idx
                )
            y2 = rms_norm(x, pk["post_norm"][li, 0], eps)
            pm = decode_mlp.mlp_decode_fused(
                y2, pk["mlp"], li, interpret=interpret,
                out_dtype=jnp.float32,
            )
            pm = jax.lax.psum(pm, "model")
            x = x + pm.astype(x.dtype)
            return x, kp, vp

        x, k_flat, v_flat = jax.lax.fori_loop(
            0, L, layer_body, (x, k_flat, v_flat)
        )
        x = rms_norm(x, pk["final_norm"], eps)
        return x, k_flat, v_flat

    # embed lookup outside the shard_map: XLA turns the vocab-sharded
    # gather into its own collective
    emb = jnp.take(packed["embed"], token, axis=0).astype(dtype)

    # per-slot tensors shard over "data" (no-op at data=1); the pool shards
    # its PAGES over "data" — page-table entries are shard-local ids
    # (runtime/paged_cache.py n_shards) so each shard's reads/writes stay
    # inside its own chunk. Weight specs mention only "model" => replicated
    # over "data", which is what DP means for weights.
    row1 = P("data")
    row2 = P("data", None)
    pool_spec = P(None, "data", None, None)
    local_keys = [kk for kk in packed if kk not in ("embed", "head")]
    hidden, k_flat, v_flat = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(
            row2, pool_spec, pool_spec, row1, row1, row2, row2, row2,
            row1, row1, row2, row2,
            {kk: specs[kk] for kk in local_keys},
        ),
        out_specs=(row2, pool_spec, pool_spec),
        check_vma=False,
    )(
        emb, k_flat, v_flat, start, contig, pt_clamped, bias, posmask,
        page_of, off_of, cos, sin,
        {kk: packed[kk] for kk in local_keys},
    )
    new_pool = {
        "k": k_flat.reshape(pool["k"].shape),
        "v": v_flat.reshape(pool["v"].shape),
    }
    return hidden, new_pool
