"""Pallas flash attention for TPU (prefix-LM aware, GQA-native).

Replaces the materialized ``QK^T -> softmax -> @V`` the reference computes
eagerly (ref: modeling_gemma.py:314-339, modeling_siglip.py:96-136) with a
blockwise online-softmax kernel: logits never hit HBM, softmax runs in fp32
in VMEM, and GQA indexes the shared KV head directly instead of repeat_kv
copies (ref: modeling_gemma.py:185-196).

Mask rule (covers every PaliGemma phase with two scalars per row):
key ``j`` is attendable by query at absolute position ``i`` iff

    j < kv_len[b]  AND  (j < prefix_len[b]  OR  j <= i)

* prefill (bidirectional prefix, ref: modeling_paligemma.py:149-156):
  ``prefix_len == kv_len`` -> full attention over valid tokens.
* training (bidirectional prefix + causal suffix): ``prefix_len`` = image +
  prompt length, ``kv_len`` = total valid length.
* pure causal: ``prefix_len = 0``.

Backward pass: blockwise FlashAttention-2 Pallas kernels (``_bwd_dq_kernel``
+ ``_bwd_dkv_kernel``) that recompute the probabilities from (q, k, lse)
saved by the forward — neither direction ever materializes the
(rows, Skv) logits in HBM. GQA folding is shared with the forward, so dk/dv
accumulate over all query heads of a KV head inside one kernel instance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import attention as xla_attention

NEG_INF = -1e30


def _flash_kernel(
    prefix_ref,  # SMEM (B,) — indexed by the batch grid coordinate
    kvlen_ref,  # SMEM (B,)
    q_ref,  # VMEM (1, 1, block_q, D) — (B, H, S, D) layout
    k_ref,  # VMEM (1, 1, Skv, D)
    v_ref,  # VMEM (1, 1, Skv, D)
    o_ref,  # VMEM (1, 1, block_q, D)
    *maybe_lse_ref,  # optional VMEM (1, 1, block_q, 128) — logsumexp rows
    scale: float,
    block_k: int,
    q_offset: int,
    seq_p: int,
):
    block_q = q_ref.shape[2]
    d = q_ref.shape[-1]
    skv = k_ref.shape[2]
    bi = pl.program_id(0)
    qb = pl.program_id(2)

    # Keep q/k/v in their storage dtype (bf16) for the MXU — accumulation is
    # fp32 via preferred_element_type; only softmax math runs in fp32.
    q = q_ref[0, 0, :, :]  # (block_q, D)
    prefix_len = prefix_ref[bi]
    kv_len = kvlen_ref[bi]
    # Rows are (group, seq) flattened per KV head: all query heads sharing a
    # KV head are processed in ONE kernel instance so K/V stream from HBM
    # once per kv head, not once per q head (critical for Gemma's MQA).
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qb * block_q
    )
    row = flat % seq_p + q_offset  # position within the sequence

    num_kb = skv // block_k

    def body(kb, carry):
        acc, m_i, l_i = carry
        ks = kb * block_k
        k_blk = k_ref[0, 0, pl.ds(ks, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(ks, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (block_q, block_k) fp32
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ks
        allowed = (col < kv_len) & ((col < prefix_len) | (col <= row))
        s = jnp.where(allowed, s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_i = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc, m_i, l_i))

    out = acc / jnp.where(l_i == 0.0, 1.0, l_i)  # fully-masked rows -> 0
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)
    if maybe_lse_ref:
        # logsumexp per row for the backward pass; 0 for fully-masked rows
        # so exp(NEG_INF - lse) underflows to exactly 0 there
        lse = jnp.where(l_i == 0.0, 0.0, m_i + jnp.log(l_i))  # (block_q, 1)
        maybe_lse_ref[0][0, 0, :, :] = jnp.broadcast_to(
            lse, (block_q, maybe_lse_ref[0].shape[-1])
        )


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


def _fold_rows(x, block, d_pad):
    """(B, S, H, D) -> (B, H, S_pad, d_pad): transpose so (seq, head_dim)
    land in the tiled (sublane, lane) positions, pad both."""
    x = x.transpose(0, 2, 1, 3)
    if d_pad != x.shape[3]:
        x = _pad_to(x, 3, d_pad)
    return _pad_to(x, 2, ((x.shape[2] + block - 1) // block) * block)


def _prep(q, k, v, block_q, block_k):
    """Shared forward/backward layout. q is folded to
    (B, Hkv, group*Sq_p, Dp) — query heads sharing a KV head stack in the
    row dim so one kernel instance streams K/V once per KV head — and K/V
    pad to (B, Hkv, Skv_p, Dp). Returns (q_p, k_p, v_p, dims).

    Sq pads only to the 128-lane tile, NOT to block_q: q blocks may span
    head boundaries in the folded row dim (rows are independent and share
    the same KV head, and the in-kernel position map is ``flat % sq_p``),
    so padding per head to a large block_q would waste up to
    ``group * (block_q - 128)`` rows of MXU work. The rows axis is padded
    to a block_q multiple only at the very end if needed."""
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    d_pad = max(128, ((d + 127) // 128) * 128)
    q_p = _fold_rows(q, 128, d_pad)
    sq_p = q_p.shape[2]
    k_p = _fold_rows(k, block_k, d_pad)
    v_p = _fold_rows(v, block_k, d_pad)
    rows = group * sq_p
    q_p = q_p.reshape(b, hkv, rows, d_pad)
    rows_p = ((rows + block_q - 1) // block_q) * block_q
    if rows_p != rows:
        q_p = _pad_to(q_p, 2, block_q)
    dims = dict(b=b, sq=sq, hq=hq, d=d, hkv=hkv, group=group, sq_p=sq_p,
                d_pad=d_pad, skv_p=k_p.shape[2], rows=rows, rows_p=rows_p)
    return q_p, k_p, v_p, dims


def _auto_blocks(sq, hq, hkv, skv, block_q, block_k):
    """Pick forward block sizes when the caller didn't.

    block_k defaults to the whole (128-padded) KV when it fits a VMEM
    budget: the online-softmax loop then runs ONCE, so the per-k-block
    rescale (acc*alpha, running m/l updates) and its VPU traffic vanish
    and the QK/PV dots run at their widest. block_q prefers the largest
    of {1024, 512, 256, 128} whose end-of-rows padding stays under ~12%:
    fewer grid steps amortize this toolchain's ~4-8 us/step cost, but a
    big block over a short rows axis would waste more MXU work in padding
    than it saves in steps (the rows axis is padded to a block multiple
    by _prep, so any choice is *correct*)."""
    group = hq // hkv
    sq_p = ((sq + 127) // 128) * 128
    rows = group * sq_p
    skv_p = ((skv + 127) // 128) * 128
    if block_k is None:
        block_k = skv_p if skv_p <= 2048 else 512
    if block_q is None:
        block_q = 128
        for cand in (1024, 512, 256):
            rows_p = ((rows + cand - 1) // cand) * cand
            if rows_p - rows <= rows // 8:
                block_q = cand
                break
    return block_q, block_k


def _unfold_out(out, dims):
    """Folded (B, Hkv, rows_p, Dp) -> (B, Sq, Hq, D)."""
    out = out[:, :, : dims["rows"], :]
    out = out.reshape(dims["b"], dims["hq"], dims["sq_p"], dims["d_pad"])
    return out[:, :, : dims["sq"], : dims["d"]].transpose(0, 2, 1, 3)


def _flash_forward(
    q, k, v, prefix_len, kv_len, scale, q_offset, block_q, block_k, interpret,
    return_lse=False,
):
    q_p, k_p, v_p, dims = _prep(q, k, v, block_q, block_k)
    b, hkv, rows = dims["b"], dims["hkv"], dims["rows_p"]
    d_pad, skv_p, sq_p = dims["d_pad"], dims["skv_p"], dims["sq_p"]

    grid = (b, hkv, rows // block_q)
    out_shape = [jax.ShapeDtypeStruct((b, hkv, rows, d_pad), q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d_pad),
            lambda bi, h, qb: (bi, h, qb, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, hkv, rows, 128), jnp.float32))
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, 128),
                lambda bi, h, qb: (bi, h, qb, 0),
                memory_space=pltpu.VMEM,
            )
        )

    res = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, q_offset=q_offset,
            seq_p=sq_p,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b,), lambda bi, h, qb: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((b,), lambda bi, h, qb: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, block_q, d_pad),
                lambda bi, h, qb: (bi, h, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, skv_p, d_pad),
                lambda bi, h, qb: (bi, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, skv_p, d_pad),
                lambda bi, h, qb: (bi, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs if return_lse else out_specs[0],
        out_shape=out_shape if return_lse else out_shape[0],
        interpret=interpret,
    )(prefix_len.astype(jnp.int32), kv_len.astype(jnp.int32), q_p, k_p, v_p)

    if return_lse:
        out, lse = res
        return _unfold_out(out, dims), lse
    return _unfold_out(res, dims)


def _bwd_dq_kernel(
    prefix_ref, kvlen_ref,  # SMEM (B,)
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_k, D)
    v_ref,  # (1, 1, block_k, D)
    do_ref,  # (1, 1, block_q, D)
    lse_ref,  # (1, 1, block_q, 128)
    delta_ref,  # (1, 1, block_q, 128)
    dq_ref,  # (1, 1, block_q, D)
    acc_ref,  # scratch (block_q, D) f32
    *,
    scale: float,
    block_q: int,
    block_k: int,
    q_offset: int,
    seq_p: int,
):
    """dQ: grid (b, hkv, q_blocks, k_blocks), kv innermost; dq accumulates
    in VMEM scratch across the kv sweep (FlashAttention-2 backward)."""
    bi = pl.program_id(0)
    qb = pl.program_id(2)
    kb = pl.program_id(3)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)
    row = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        + qb * block_q
    ) % seq_p + q_offset
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kb * block_k
    allowed = (col < kvlen_ref[bi]) & ((col < prefix_ref[bi]) | (col <= row))
    s = jnp.where(allowed, s, NEG_INF)
    p = jnp.exp(s - lse)  # fp32; 0 at masked slots
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == pl.num_programs(3) - 1)
    def _finish():
        dq_ref[0, 0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    prefix_ref, kvlen_ref,  # SMEM (B,)
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_k, D)
    v_ref,  # (1, 1, block_k, D)
    do_ref,  # (1, 1, block_q, D)
    lse_ref,  # (1, 1, block_q, 128)
    delta_ref,  # (1, 1, block_q, 128)
    dk_ref,  # (1, 1, block_k, D)
    dv_ref,  # (1, 1, block_k, D)
    dk_acc_ref,  # scratch (block_k, D) f32
    dv_acc_ref,  # scratch (block_k, D) f32
    *,
    scale: float,
    block_q: int,
    block_k: int,
    q_offset: int,
    seq_p: int,
):
    """dK/dV: grid (b, hkv, k_blocks, q_blocks), q innermost; dk/dv
    accumulate across the q sweep. Zero-padded dO rows make padded /
    out-of-range query rows contribute exactly nothing."""
    bi = pl.program_id(0)
    kb = pl.program_id(2)
    qb = pl.program_id(3)

    @pl.when(qb == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)
    row = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        + qb * block_q
    ) % seq_p + q_offset
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kb * block_k
    allowed = (col < kvlen_ref[bi]) & ((col < prefix_ref[bi]) | (col <= row))
    s = jnp.where(allowed, s, NEG_INF)
    p = jnp.exp(s - lse)
    dv_acc_ref[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_k, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dk_acc_ref[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qb == pl.num_programs(3) - 1)
    def _finish():
        dk_ref[0, 0] = (dk_acc_ref[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[...].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, out, lse, g, prefix_len, kv_len, scale, q_offset,
    block_q, block_k, interpret,
):
    """Blockwise FA2 backward: recompute p from (q, k, lse); never
    materializes the (rows, Skv) logits in HBM."""
    q_p, k_p, v_p, dims = _prep(q, k, v, block_q, block_k)
    b, hkv, rows = dims["b"], dims["hkv"], dims["rows_p"]
    d_pad, skv_p, sq_p = dims["d_pad"], dims["skv_p"], dims["sq_p"]

    def fold_g(x):  # same 128-tile fold + tail rows pad as _prep's q path
        x = _fold_rows(x, 128, d_pad).reshape(b, hkv, dims["rows"], d_pad)
        return _pad_to(x, 2, block_q) if rows != dims["rows"] else x

    do_p = fold_g(g)
    out_p = fold_g(out)
    n_qb, n_kb = rows // block_q, skv_p // block_k

    # delta_i = sum_d dO_i * O_i, broadcast on the 128-lane minor dim like lse
    delta = jnp.sum(
        do_p.astype(jnp.float32) * out_p.astype(jnp.float32), axis=-1
    )  # (b, hkv, rows)
    delta = jnp.broadcast_to(delta[..., None], (b, hkv, rows, 128))

    smem = lambda: pl.BlockSpec(  # noqa: E731
        (b,), lambda bi, h, x, y: (0,), memory_space=pltpu.SMEM
    )
    q_spec = pl.BlockSpec((1, 1, block_q, d_pad),
                          lambda bi, h, qb, kb: (bi, h, qb, 0))
    k_spec = pl.BlockSpec((1, 1, block_k, d_pad),
                          lambda bi, h, qb, kb: (bi, h, kb, 0))
    lse_spec = pl.BlockSpec((1, 1, block_q, 128),
                            lambda bi, h, qb, kb: (bi, h, qb, 0))

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, block_q=block_q, block_k=block_k,
            q_offset=q_offset, seq_p=sq_p,
        ),
        grid=(b, hkv, n_qb, n_kb),
        in_specs=[smem(), smem(), q_spec, k_spec, k_spec, q_spec, lse_spec,
                  lse_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        interpret=interpret,
    )(prefix_len.astype(jnp.int32), kv_len.astype(jnp.int32), q_p, k_p, v_p,
      do_p, lse, delta)

    # swap the two inner grid axes: k blocks outer, q blocks inner
    q_spec_t = pl.BlockSpec((1, 1, block_q, d_pad),
                            lambda bi, h, kb, qb: (bi, h, qb, 0))
    k_spec_t = pl.BlockSpec((1, 1, block_k, d_pad),
                            lambda bi, h, kb, qb: (bi, h, kb, 0))
    lse_spec_t = pl.BlockSpec((1, 1, block_q, 128),
                              lambda bi, h, kb, qb: (bi, h, qb, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, block_q=block_q, block_k=block_k,
            q_offset=q_offset, seq_p=sq_p,
        ),
        grid=(b, hkv, n_kb, n_qb),
        in_specs=[smem(), smem(), q_spec_t, k_spec_t, k_spec_t, q_spec_t,
                  lse_spec_t, lse_spec_t],
        out_specs=[k_spec_t, k_spec_t],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv_p, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, skv_p, d_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(prefix_len.astype(jnp.int32), kv_len.astype(jnp.int32), q_p, k_p, v_p,
      do_p, lse, delta)

    dq = _unfold_out(dq, dims)  # (B, Sq, Hq, D)
    skv, d = k.shape[1], k.shape[3]
    dk = dk[:, :, :skv, :d].transpose(0, 2, 1, 3)  # (B, Skv, Hkv, D)
    dv = dv[:, :, :skv, :d].transpose(0, 2, 1, 3)
    return dq, dk, dv


def _reference(q, k, v, prefix_len, kv_len, scale, q_offset):
    """XLA-semantics reference (used for the VJP and for testing)."""
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    row = jnp.arange(sq)[None, :, None] + q_offset  # (1, Sq, 1)
    col = jnp.arange(skv)[None, None, :]  # (1, 1, Skv)
    allowed = (col < kv_len[:, None, None]) & (
        (col < prefix_len[:, None, None]) | (col <= row)
    )
    mask = jnp.where(allowed[:, None], 0.0, xla_attention.NEG_INF)
    return xla_attention.gqa(q, k, v, mask, scale=scale)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def _flash(q, k, v, prefix_len, kv_len, scale, q_offset, block_q, block_k, interpret):
    return _flash_forward(
        q, k, v, prefix_len, kv_len, scale, q_offset, block_q, block_k, interpret
    )


def _flash_fwd(q, k, v, prefix_len, kv_len, scale, q_offset, block_q, block_k, interpret):
    out, lse = _flash_forward(
        q, k, v, prefix_len, kv_len, scale, q_offset, block_q, block_k,
        interpret, return_lse=True,
    )
    return out, (q, k, v, out, lse, prefix_len, kv_len)


def _flash_bwd(scale, q_offset, block_q, block_k, interpret, res, g):
    q, k, v, out, lse, prefix_len, kv_len = res
    dq, dk, dv = _flash_backward(
        q, k, v, out, lse, g, prefix_len, kv_len, scale, q_offset,
        block_q, block_k, interpret,
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,  # (B, Sq, Hq, D)
    k: jnp.ndarray,  # (B, Skv, Hkv, D)
    v: jnp.ndarray,  # (B, Skv, Hkv, D)
    prefix_len: jnp.ndarray,  # (B,) int32 — bidirectional prefix length
    kv_len: jnp.ndarray,  # (B,) int32 — total valid key length
    scale: Optional[float] = None,
    q_offset: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Blockwise prefix-LM flash attention. See module docstring for the mask.

    block_q/block_k default to shape-dependent auto sizes (``_auto_blocks``):
    whole-KV k blocks when the KV fits VMEM (one-shot softmax, no online
    rescale) and 512-row q blocks over the folded rows axis. Both are
    resolved here, before the custom_vjp, so forward and backward agree."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q, block_k = _auto_blocks(
        q.shape[1], q.shape[2], k.shape[2], k.shape[1], block_q, block_k
    )
    return _flash(
        q, k, v, prefix_len, kv_len, scale, q_offset, block_q, block_k, interpret
    )


def reference_attention(q, k, v, prefix_len, kv_len, scale=None, q_offset=0):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _reference(q, k, v, prefix_len, kv_len, scale, q_offset)


def flash_attention_sharded(
    q, k, v, prefix_len, kv_len, mesh, scale=None, **kwargs
):
    """flash_attention under a Mesh("data","model"): batch shards on "data",
    query heads on "model" (heads are embarrassingly parallel).

    KV heads shard on "model" too when divisible by the axis size (grouped
    heads stay on one shard because groups are contiguous); MQA (1 KV head)
    replicates KV across "model". Other head counts fall back to replicated
    KV only when the query-head chunk covers whole groups.
    """
    from jax.sharding import PartitionSpec as P

    m = mesh.shape["model"]
    hq, hkv = q.shape[2], k.shape[2]
    assert hq % m == 0, (hq, m)
    if hkv % m == 0:
        kv_spec = P("data", None, "model", None)
    else:
        # replicated KV: each shard's local grouping must match the global
        # one — true iff every shard holds whole KV groups
        assert (hq // m) % hkv == 0, (
            f"cannot shard {hq} q heads / {hkv} kv heads over model={m}"
        )
        kv_spec = P("data", None, None, None)

    fn = jax.shard_map(
        lambda q, k, v, p, l: flash_attention(q, k, v, p, l, scale=scale, **kwargs),
        mesh=mesh,
        in_specs=(P("data", None, "model", None), kv_spec, kv_spec,
                  P("data"), P("data")),
        out_specs=P("data", None, "model", None),
        check_vma=False,
    )
    return fn(q, k, v, prefix_len, kv_len)
