"""Grid-over-layers fused decoder kernel reading K/V through a PAGE TABLE.

Why this exists: a pallas_call on this runtime costs ~217 us of fixed
launch overhead (measured, .bench/call_floor_probe.py), so the page-walk
serving tick — one paged-attention call per layer inside lax.scan — pays
~3.9 ms/tick in launch floors alone at 18 layers. The dense serving path
already amortizes the floor with ONE grid-over-layers kernel per tick
(kernels/decode_layer.layers_decode_fused); this module is that kernel
with the two contiguous (B, W, D) window DMAs per layer replaced by
per-row PAGED window fetches:

* the page allocator (runtime/paged_cache.PageAllocator) hands out
  physically-consecutive page runs, so the common case is ONE DMA issue
  per row per tensor per layer (`pool.at[l, ds(first, pb)]`);
* fragmented rows fall back to per-page copies (correctness path);
* the fresh token's K/V are returned to the caller, which scatters them
  into each row's current page (pages are shared across layers).

Numerics are identical to layers_decode_fused: fp32 norms/softmax, the
row's own write slot patched arithmetically (`at_pos`), f32 additive
bias mask. Every row fetches the full ``pages_bucket`` window every
layer (like the dense kernel fetches the full bucket window), so the
VMEM rings are always written before they are read — no stale-buffer
NaN hazard (contrast kernels/paged_attention._kernel_runs).

The reference serves B==1 from a torch.cat Python-list cache
(ref: modeling_gemma.py:8-64); neither paging nor fusion has an analog.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.activations import gelu_tanh


def supported(cfg, layers, batch: int, window_bytes_cap: int) -> bool:
    """Static gate (mirrors decode_layer.supported + the VMEM window cap
    the paged ring sizes must respect)."""
    return (
        1 <= batch <= 32
        and cfg.num_key_value_heads == 1
        and cfg.head_dim % 128 == 0
        and isinstance(layers.get("attn", {}).get("qkv"), dict)
        and "w8" in layers["attn"]["qkv"]
        and "gate_blk" in layers.get("mlp", {})
    )


def _kernel_paged(
    pos_ref,  # (B,) int32 per-row cache write position (logical slot)
    start_ref,  # (B,) int32 first physical page IF the window is one run
    contig_ref,  # (B,) int32 1 => whole window physically consecutive
    pt_ref,  # (B, pb) int32 physical page ids (pre-clamped)
    *refs,  # inputs, outputs, scratch — unpacked below
    n_layers: int,
    nc: int,
    bs: int,
    pb: int,
    page_size: int,
    n_pages: int,
    n_heads: int,
    head_dim: int,
    eps: float,
    scale: float,
    batch: int,
    lora: bool = False,
):
    # lora=True: concat-basis multi-LoRA operands ride the grid exactly
    # as in decode_layer._kernel_all (same repack_lora_bank_fused layout)
    refs = list(refs)
    idx = 20
    if lora:
        (
            m1_ref,  # (B, G) row block masks
            m2_ref,  # (B, 2G)
            m3_ref,  # (B, 3G)
            qa_ref,  # (1, K, 3G) block at l
            qb_ref,  # (1, 3G, NQ2)
            oa_ref,  # (1, NQ, G)
            ob_ref,  # (1, G, K)
            gua_ref,  # (1, K, 2G)
            gb_ref,  # (1, nc, G, bs)
            ub_ref,  # (1, nc, G, bs)
            da_ref,  # (1, nc, bs, G)
            db_ref,  # (1, G, K)
        ) = refs[idx : idx + 12]
        idx += 12
    outs = refs[idx : idx + 3]
    tail = len(refs)
    if lora:
        za_buf = refs[tail - 1]  # (B, G) f32 — down-delta accumulator
        tail -= 1
    refs = refs[:20] + outs + refs[tail - 12 : tail]
    (
        x_ref,  # (B, K)
        cos_ref,  # (B, D)
        sin_ref,  # (B, D)
        cos_rep_ref,  # (B*H, D)
        sin_rep_ref,  # (B*H, D)
        bias_ref,  # (B, W) f32 additive mask
        in_norm_ref,  # (1, 1, K) block at layer l
        post_norm_ref,  # (1, 1, K)
        qkv_w8_ref,  # (L, K, NQ) HBM
        qkv_s_ref,  # (1, 1, NQ) block at l
        o_w8_ref,  # (L, KO, K) HBM
        o_s_ref,  # (1, 1, K)
        gate_ref,  # (L, nc, K, bs) HBM
        up_ref,  # (L, nc, K, bs) HBM
        dn_ref,  # (L, I, K) HBM
        gs_ref,  # (1, nc, bs)
        us_ref,  # (1, nc, bs)
        ds_ref,  # (1, 1, K)
        k_pool_ref,  # (L, n_pages, ps, D) HBM
        v_pool_ref,  # (L, n_pages, ps, D) HBM
        out_ref,  # (B, K) — last grid step
        k_new_ref,  # (1, B, D) block at l
        v_new_ref,  # (1, B, D) block at l
        # scratch:
        a_buf,  # (B, NQ)
        h_state,  # (B, K)
        qkv_buf,  # (2, K, NQ) int8
        o_buf,  # (2, KO, K) int8
        kwin,  # (2, B, pb, ps, D)
        vwin,  # (2, B, pb, ps, D)
        gbuf,  # (2, K, bs) int8
        ubuf,
        dbuf,
        acc,  # (B, K) f32
        sems,  # DMA (5, 2) weight-stream semaphores
        kvsems,  # DMA (2, 2, B) — one per (tensor, slot, row); page copies
        #          of a row share it, waited copy-by-copy (sflag budget)
    ) = refs
    l = pl.program_id(0)
    lslot = jax.lax.rem(l, 2)
    nslot = jax.lax.rem(l + 1, 2)
    window = pb * page_size

    def dma_qkv(li, s):
        return pltpu.make_async_copy(qkv_w8_ref.at[li], qkv_buf.at[s],
                                     sems.at[3, s])

    def dma_o(li, s):
        return pltpu.make_async_copy(o_w8_ref.at[li], o_buf.at[s],
                                     sems.at[4, s])

    # -- paged window fetch: run fast path / per-page fallback ----------
    def dma_run(pool_ref, buf, kv, r, li, s):
        first = jnp.clip(start_ref[r], 0, n_pages - pb)
        return pltpu.make_async_copy(
            pool_ref.at[li, pl.ds(first, pb)],
            buf.at[s, r],
            kvsems.at[kv, s, r],
        )

    def dma_page(pool_ref, buf, kv, r, li, s, j):
        pid = jnp.clip(pt_ref[r, j], 0, n_pages - 1)
        return pltpu.make_async_copy(
            pool_ref.at[li, pid],
            buf.at[s, r, j],
            kvsems.at[kv, s, r],
        )

    def start_windows(li, s):
        for r in range(batch):
            @pl.when(contig_ref[r] == 1)
            def _run():
                dma_run(k_pool_ref, kwin, 0, r, li, s).start()
                dma_run(v_pool_ref, vwin, 1, r, li, s).start()

            @pl.when(contig_ref[r] == 0)
            def _pages():
                for j in range(pb):
                    dma_page(k_pool_ref, kwin, 0, r, li, s, j).start()
                    dma_page(v_pool_ref, vwin, 1, r, li, s, j).start()

    def wait_windows(li, s):
        for r in range(batch):
            @pl.when(contig_ref[r] == 1)
            def _run():
                dma_run(k_pool_ref, kwin, 0, r, li, s).wait()
                dma_run(v_pool_ref, vwin, 1, r, li, s).wait()

            @pl.when(contig_ref[r] == 0)
            def _pages():
                for j in range(pb):
                    dma_page(k_pool_ref, kwin, 0, r, li, s, j).wait()
                    dma_page(v_pool_ref, vwin, 1, r, li, s, j).wait()

    def cslot(li, c):
        return jax.lax.rem(li * nc + c, 2)

    def dma_g(li, c, s):
        return pltpu.make_async_copy(gate_ref.at[li, c], gbuf.at[s],
                                     sems.at[0, s])

    def dma_u(li, c, s):
        return pltpu.make_async_copy(up_ref.at[li, c], ubuf.at[s],
                                     sems.at[1, s])

    def dma_d(li, c, s):
        return pltpu.make_async_copy(dn_ref.at[li, pl.ds(c * bs, bs), :],
                                     dbuf.at[s], sems.at[2, s])

    @pl.when(l == 0)
    def _():
        dma_qkv(0, 0).start()
        start_windows(0, 0)
        dma_o(0, 0).start()
        dma_g(0, 0, 0).start()
        dma_u(0, 0, 0).start()
        dma_d(0, 0, 0).start()
        h_state[...] = x_ref[...]

    @pl.when(l + 1 < n_layers)
    def _():
        dma_qkv(l + 1, nslot).start()
        start_windows(l + 1, nslot)
        dma_o(l + 1, nslot).start()

    def rmsnorm(h, w_ref):
        hf = h.astype(jnp.float32)
        ms = jnp.mean(hf * hf, axis=-1, keepdims=True)
        n = hf * jax.lax.rsqrt(ms + eps)
        return (n * (1.0 + w_ref[0].astype(jnp.float32))).astype(h.dtype)

    x = h_state[...]
    y = rmsnorm(x, in_norm_ref)

    def lora_delta(inp, a_ref, mask_ref, b_ref):
        # (x @ A_cat) * row-block-mask @ B_cat — alpha pre-folded in B
        z = jax.lax.dot_general(
            inp, a_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(inp.dtype) * mask_ref[...]
        return jax.lax.dot_general(
            z, b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dma_qkv(l, lslot).wait()
    qkv = jax.lax.dot_general(
        y, qkv_buf[lslot].astype(y.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv * qkv_s_ref[0]).astype(y.dtype)  # (B, NQ)
    if lora:
        qkv = qkv + lora_delta(y, qa_ref, m3_ref, qb_ref).astype(y.dtype)
    nq = n_heads * head_dim
    k_new = qkv[:, nq : nq + head_dim]  # (B, D)
    v_new = qkv[:, nq + head_dim :]  # (B, D)

    cos = cos_ref[...]
    sin = sin_ref[...]
    half = head_dim // 2

    def rope2(t, c, s):
        rot = jnp.concatenate([-t[:, half:], t[:, :half]], axis=-1)
        return t * c + rot * s

    k_new = rope2(k_new, cos, sin)
    k_new_ref[...] = k_new[None].astype(k_new_ref.dtype)
    v_new_ref[...] = v_new[None].astype(v_new_ref.dtype)

    wait_windows(l, lslot)

    q_all = rope2(
        qkv[:, :nq].reshape(batch * n_heads, head_dim),
        cos_rep_ref[...], sin_rep_ref[...],
    )
    for b in range(batch):
        q_b = q_all[b * n_heads : (b + 1) * n_heads]  # (H, D)
        k_b = k_new[b : b + 1]  # (1, D)
        k_win = kwin[lslot, b].reshape(window, head_dim)
        scores = jax.lax.dot_general(
            q_b, k_win.astype(q_b.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, W)
        s_new = jnp.sum(
            q_b.astype(jnp.float32) * k_b.astype(jnp.float32),
            -1, keepdims=True,
        )  # (H, 1)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        at_pos = slot_ids == pos_ref[b]  # window copy predates row's write
        scores = jnp.where(at_pos, s_new, scores) * scale + bias_ref[b : b + 1]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        p_pos = jnp.sum(
            jnp.where(at_pos, probs.astype(jnp.float32), 0.0),
            -1, keepdims=True,
        ).astype(x.dtype)  # (H, 1)
        probs = jnp.where(at_pos, jnp.zeros_like(probs), probs)
        v_win = vwin[lslot, b].reshape(window, head_dim)
        attn_b = jax.lax.dot_general(
            probs, v_win.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + p_pos * v_new[b : b + 1].astype(x.dtype)
        a_buf[b : b + 1, :] = attn_b.reshape(1, nq)
    a = a_buf[...]  # (B, NQ)

    dma_o(l, lslot).wait()
    o = jax.lax.dot_general(
        a, o_buf[lslot].astype(a.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    x = x + (o * o_s_ref[0]).astype(x.dtype)
    if lora:
        x = x + lora_delta(a, oa_ref, m1_ref, ob_ref).astype(x.dtype)

    y2 = rmsnorm(x, post_norm_ref)
    acc[...] = jnp.zeros_like(acc)
    if lora:
        G = m1_ref.shape[1]
        z2 = jax.lax.dot_general(
            y2, gua_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y2.dtype) * m2_ref[...]  # (B, 2G) masked gate|up basis
        za_buf[...] = jnp.zeros_like(za_buf)

    def body(c, carry):
        s = cslot(l, c)

        @pl.when(c + 1 < nc)
        def _():
            ns = cslot(l, c + 1)
            dma_g(l, c + 1, ns).start()
            dma_u(l, c + 1, ns).start()
            dma_d(l, c + 1, ns).start()

        @pl.when((c + 1 == nc) & (l + 1 < n_layers))
        def _():
            ns = cslot(l + 1, 0)
            dma_g(l + 1, 0, ns).start()
            dma_u(l + 1, 0, ns).start()
            dma_d(l + 1, 0, ns).start()

        dma_g(l, c, s).wait()
        dma_u(l, c, s).wait()
        g = jax.lax.dot_general(
            y2, gbuf[s].astype(y2.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * gs_ref[0, c]
        u = jax.lax.dot_general(
            y2, ubuf[s].astype(y2.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * us_ref[0, c]
        if lora:
            g = g + jax.lax.dot_general(
                z2[:, :G], gb_ref[0, c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            u = u + jax.lax.dot_general(
                z2[:, G:], ub_ref[0, c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        t = (gelu_tanh(g) * u).astype(y2.dtype)
        dma_d(l, c, s).wait()
        acc[...] += jax.lax.dot_general(
            t, dbuf[s].astype(y2.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if lora:
            za_buf[...] += jax.lax.dot_general(
                t, da_ref[0, c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return carry

    jax.lax.fori_loop(0, nc, body, 0)
    x = x + (acc[...] * ds_ref[0]).astype(x.dtype)
    if lora:
        zd = za_buf[...].astype(x.dtype) * m1_ref[...]
        x = x + jax.lax.dot_general(
            zd, db_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    h_state[...] = x

    @pl.when(l == n_layers - 1)
    def _():
        out_ref[...] = x


def layers_decode_fused_paged(
    x: jnp.ndarray,  # (B, 1, K)
    packed: Dict,  # decode_layer.repack_layers() output
    k_pool: jnp.ndarray,  # (L, n_pages, ps, D) — MQA pool, kv-head folded
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, pb) int32 — pre-sliced to the bucket
    write_pos: jnp.ndarray,  # (B,) int32
    cos: jnp.ndarray,  # (B, D)
    sin: jnp.ndarray,
    n_heads: int,
    head_dim: int,
    eps: float,
    interpret: Optional[bool] = None,
    lora_pack: Optional[Dict] = None,  # decode_layer.repack_lora_bank_fused
    adapter_ids: Optional[jnp.ndarray] = None,  # (B,) int32 bank rows
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All L layers for B lockstep rows in ONE kernel, windows read through
    the page table. Returns (hidden (B,1,K), k_new (L,B,D), v_new (L,B,D));
    the caller scatters the fresh K/V into each row's current page.

    ``lora_pack`` + ``adapter_ids``: per-row concat-basis LoRA applies
    inside the kernel (same operands as decode_layer.layers_decode_fused),
    so multi-LoRA paged serving keeps the fused tick."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with_lora = lora_pack is not None
    if with_lora:
        assert adapter_ids is not None
    k = x.shape[-1]
    b = x.shape[0]
    x2 = x.reshape(b, k)
    mlp = packed["mlp"]
    L, nc, _, bs = mlp["gate_blk"].shape
    n_pages, ps = k_pool.shape[1], k_pool.shape[2]
    pb = page_table.shape[1]
    window = pb * ps
    qkv_w8 = packed["attn"]["qkv"]["w8"]
    o_w8 = packed["attn"]["o"]["w8"]
    nq2 = qkv_w8.shape[-1]
    ko = o_w8.shape[-2]
    cdtype = k_pool.dtype
    write_pos = jnp.asarray(write_pos, jnp.int32).reshape(b)

    # run metadata: the window is "one run" iff every page the row actually
    # NEEDS sits at start+j physically; don't-care pages beyond the row's
    # length may be anything (the bias masks them) but the run fetch
    # [start, start+pb) must stay inside the pool.
    pt = page_table.astype(jnp.int32)
    lastpb = write_pos // ps  # the write slot's page is always needed
    start = pt[:, 0]
    expect = start[:, None] + jnp.arange(pb, dtype=jnp.int32)[None]
    care = jnp.arange(pb, dtype=jnp.int32)[None] <= lastpb[:, None]
    contig = jnp.where(care, pt == expect, True).all(axis=1)
    contig &= (start >= 0) & (start + pb <= n_pages)
    contig = contig.astype(jnp.int32)
    # clamp don't-care fallback pages to the row's last needed page so the
    # per-page path never reads out of pool
    pb_ids = jnp.minimum(jnp.arange(pb, dtype=jnp.int32)[None], lastpb[:, None])
    pt_clamped = jnp.take_along_axis(pt, pb_ids, axis=1)

    # validity incl. this token's slot (patched arithmetically in-kernel)
    bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (b, window), 1)
        <= write_pos[:, None],
        0.0, -jnp.inf,
    ).astype(jnp.float32)

    in_specs = [
            pl.BlockSpec((b, k), lambda l, *s: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda l, *s: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda l, *s: (0, 0)),
            pl.BlockSpec((b * n_heads, head_dim), lambda l, *s: (0, 0)),
            pl.BlockSpec((b * n_heads, head_dim), lambda l, *s: (0, 0)),
            pl.BlockSpec((b, window), lambda l, *s: (0, 0)),
            pl.BlockSpec((1, 1, k), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, nq2), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, k), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, nc, bs), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec((1, nc, bs), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    scratch_shapes = [
            pltpu.VMEM((b, n_heads * head_dim), x.dtype),
            pltpu.VMEM((b, k), x.dtype),
            pltpu.VMEM((2, k, nq2), jnp.int8),
            pltpu.VMEM((2, ko, k), jnp.int8),
            pltpu.VMEM((2, b, pb, ps, head_dim), cdtype),
            pltpu.VMEM((2, b, pb, ps, head_dim), cdtype),
            pltpu.VMEM((2, k, bs), jnp.int8),
            pltpu.VMEM((2, k, bs), jnp.int8),
            pltpu.VMEM((2, bs, k), jnp.int8),
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.SemaphoreType.DMA((5, 2)),
            pltpu.SemaphoreType.DMA((2, 2, b)),
    ]
    operands = [
        x2,
        cos.astype(x.dtype).reshape(b, head_dim),
        sin.astype(x.dtype).reshape(b, head_dim),
        jnp.repeat(cos.astype(x.dtype).reshape(b, head_dim), n_heads, axis=0),
        jnp.repeat(sin.astype(x.dtype).reshape(b, head_dim), n_heads, axis=0),
        bias,
        packed["input_norm"],
        packed["post_norm"],
        qkv_w8,
        packed["qkv_s"],
        o_w8,
        packed["o_s"],
        mlp["gate_blk"],
        mlp["up_blk"],
        mlp["down_w8"],
        mlp["gs"],
        mlp["us"],
        mlp["ds"],
        k_pool,
        v_pool,
    ]
    if with_lora:
        from . import decode_layer as _dl

        lp = lora_pack
        G = lp["o_b"].shape[1]
        nq = n_heads * head_dim
        m1, m2, m3 = _dl.lora_row_masks(
            jnp.asarray(adapter_ids, jnp.int32).reshape(-1), G,
            lp["rank"], x.dtype,
        )
        in_specs += [
            pl.BlockSpec((b, G), lambda l, *s: (0, 0)),
            pl.BlockSpec((b, 2 * G), lambda l, *s: (0, 0)),
            pl.BlockSpec((b, 3 * G), lambda l, *s: (0, 0)),
            pl.BlockSpec((1, k, 3 * G), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec((1, 3 * G, nq2), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec((1, nq, G), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec((1, G, k), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec((1, k, 2 * G), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec((1, nc, G, bs), lambda l, *s: (l, 0, 0, 0)),
            pl.BlockSpec((1, nc, G, bs), lambda l, *s: (l, 0, 0, 0)),
            pl.BlockSpec((1, nc, bs, G), lambda l, *s: (l, 0, 0, 0)),
            pl.BlockSpec((1, G, k), lambda l, *s: (l, 0, 0)),
        ]
        scratch_shapes += [pltpu.VMEM((b, G), jnp.float32)]
        operands += [
            m1, m2, m3,
            lp["qkv_a"].astype(x.dtype), lp["qkv_b"].astype(x.dtype),
            lp["o_a"].astype(x.dtype), lp["o_b"].astype(x.dtype),
            lp["gu_a"].astype(x.dtype),
            lp["gate_b"].astype(x.dtype), lp["up_b"].astype(x.dtype),
            lp["down_a"].astype(x.dtype), lp["down_b"].astype(x.dtype),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(L,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k), lambda l, *s: (0, 0)),
            pl.BlockSpec((1, b, head_dim), lambda l, *s: (l, 0, 0)),
            pl.BlockSpec((1, b, head_dim), lambda l, *s: (l, 0, 0)),
        ],
        scratch_shapes=scratch_shapes,
    )
    out, k_new, v_new = pl.pallas_call(
        functools.partial(
            _kernel_paged, n_layers=L, nc=nc, bs=bs, pb=pb, page_size=ps,
            n_pages=n_pages, n_heads=n_heads, head_dim=head_dim, eps=eps,
            scale=head_dim**-0.5, batch=b, lora=with_lora,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), x.dtype),
            jax.ShapeDtypeStruct((L, b, head_dim), cdtype),
            jax.ShapeDtypeStruct((L, b, head_dim), cdtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        write_pos,
        start,
        contig,
        pt_clamped,
        *operands,
    )
    return out.reshape(b, 1, k), k_new, v_new
