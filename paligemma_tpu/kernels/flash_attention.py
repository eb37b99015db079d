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

Backward pass: ``jax.custom_vjp`` whose VJP is the XLA reference attention's
(numerically identical semantics) — training gets correct grads while the
forward runs the Pallas kernel.
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
    *,
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


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


def _flash_forward(
    q, k, v, prefix_len, kv_len, scale, q_offset, block_q, block_k, interpret
):
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    group = hq // hkv

    # (B, S, H, D) -> (B, H, S, D) so blocks put (seq, head_dim) in the
    # tiled (sublane, lane) positions.
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    d_pad = max(128, ((d + 127) // 128) * 128)
    if d_pad != d:
        q = _pad_to(q, 3, d_pad)
        k = _pad_to(k, 3, d_pad)
        v = _pad_to(v, 3, d_pad)
    sq_p = ((sq + block_q - 1) // block_q) * block_q
    q_p = _pad_to(q, 2, sq_p)
    k_p = _pad_to(k, 2, block_k)
    v_p = _pad_to(v, 2, block_k)
    skv_p = k_p.shape[2]

    # Fold the query heads that share a KV head into the row dim: one kernel
    # instance per (batch, kv head) streams K/V once for `group` q heads.
    rows = group * sq_p
    q_p = q_p.reshape(b, hkv, rows, d_pad)

    grid = (b, hkv, rows // block_q)

    out = pl.pallas_call(
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
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_pad),
            lambda bi, h, qb: (bi, h, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d_pad), q.dtype),
        interpret=interpret,
    )(prefix_len.astype(jnp.int32), kv_len.astype(jnp.int32), q_p, k_p, v_p)

    out = out.reshape(b, hq, sq_p, d_pad)
    return out[:, :, :sq, :d].transpose(0, 2, 1, 3)


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
    out = _flash_forward(
        q, k, v, prefix_len, kv_len, scale, q_offset, block_q, block_k, interpret
    )
    return out, (q, k, v, prefix_len, kv_len)


def _flash_bwd(scale, q_offset, block_q, block_k, interpret, res, g):
    q, k, v, prefix_len, kv_len = res
    _, vjp = jax.vjp(
        lambda q, k, v: _reference(q, k, v, prefix_len, kv_len, scale, q_offset),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
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
    block_q: int = 256,
    block_k: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Blockwise prefix-LM flash attention. See module docstring for the mask."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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
