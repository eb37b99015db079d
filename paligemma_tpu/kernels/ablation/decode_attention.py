"""Pallas decode attention: length-aware single-token attention over the
preallocated KV cache.

The XLA decode path (ops.attention.gqa over the full cache) reads every
``max_seq`` cache slot every step — at a 2048-slot cache that is ~38 MB/step
(b1) of dead HBM traffic once contexts are short relative to the cache, and
it scales with batch (continuous-batching slot pools pay it per slot). This
kernel streams only ``ceil(kv_len/block_k)`` key blocks per row:

* the kv-block grid dimension uses a scalar-prefetched per-row block bound
  (``last_kb``); blocks past the bound clamp their index map to the last
  valid block, so Mosaic's pipeline skips the DMA (same block index), and
  ``pl.when`` skips their compute;
* GQA/MQA query heads sharing a KV head are folded into the row dimension,
  so K/V stream once per KV head (same trick as kernels/flash_attention.py);
* online softmax in fp32 with m/l/acc carried in VMEM scratch across grid
  steps (the kv loop IS the grid, unlike prefill flash where it fits in one
  kernel instance).

Masking uses three scalars per row — no (B, max_seq) mask array:

    attendable(col) = col < seg0_end  OR  seg1_start <= col < kv_len

which expresses every decode phase of this framework:
* unpadded rows / serving slots: ``seg0_end == seg1_start`` -> contiguous
  ``[0, kv_len)`` (PaliGemma decode attends over everything valid; the
  reference materializes all-zero masks, ref: modeling_paligemma.py:158-169);
* right-padded batch rows: ``[0, n_valid)`` prompt tokens plus the decode
  window ``[prompt_len, kv_len)`` — the pad hole between them is skipped
  (the XLA path's kv_valid bitmap semantics, models/gemma.py).
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
    lastkb_ref,  # (B,) int32: last kv-block index each row needs
    seg0_ref,  # (B,) int32: end of the first attendable segment
    seg1_ref,  # (B,) int32: start of the second attendable segment
    kvlen_ref,  # (B,) int32: end of the second attendable segment
    # blocks (VMEM)
    q_ref,  # (1, 1, G_pad, D)
    k_ref,  # (1, block_k, D) — cache viewed as (B, S, Hkv*D), see launcher
    v_ref,  # (1, block_k, D)
    o_ref,  # (1, 1, G_pad, D)
    # scratch
    acc_ref,  # (G_pad, D) f32
    m_ref,  # (G_pad, 128) f32
    l_ref,  # (G_pad, 128) f32
    *,
    scale: float,
    block_k: int,
):
    b = pl.program_id(0)
    kb = pl.program_id(2)
    n_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb <= lastkb_ref[b])
    def _compute():
        g_pad = q_ref.shape[2]
        q = q_ref[0, 0]  # (G_pad, D)
        k = k_ref[0]  # (block_k, D)
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (G_pad, block_k) fp32

        col = (
            jax.lax.broadcasted_iota(jnp.int32, (g_pad, block_k), 1)
            + kb * block_k
        )
        ok = (col < seg0_ref[b]) | (
            (col >= seg1_ref[b]) & (col < kvlen_ref[b])
        )
        s = jnp.where(ok, s, NEG_INF)

        m_i = m_ref[...][:, :1]  # (G_pad, 1)
        l_i = l_ref[...][:, :1]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kb == n_kb - 1)
    def _finish():
        l = l_ref[...][:, :1]
        out = acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = out.astype(o_ref.dtype)


def _pick_block_k(s_max: int) -> Optional[int]:
    for bk in (512, 256, 128, 64):
        if s_max % bk == 0:
            return bk
    return None


def supported(s_max: int, head_dim: int) -> bool:
    """Cheap static check the engine uses to decide kernel vs XLA path."""
    return _pick_block_k(s_max) is not None and head_dim % 128 == 0


def decode_attention(
    q: jnp.ndarray,  # (B, Hq, D) — ONE query token per row
    k_cache: jnp.ndarray,  # (B, S_max, Hkv, D)
    v_cache: jnp.ndarray,  # (B, S_max, Hkv, D)
    seg0_end: jnp.ndarray,  # (B,) int32
    seg1_start: jnp.ndarray,  # (B,) int32
    kv_len: jnp.ndarray,  # (B,) int32 (= write_pos + 1: includes this token)
    scale: Optional[float] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Length-aware decode attention. Returns (B, Hq, D)."""
    b, hq, d = q.shape
    s_max, hkv = k_cache.shape[1], k_cache.shape[2]
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_k is None:
        block_k = _pick_block_k(s_max)
    assert block_k is not None and s_max % block_k == 0, (s_max, block_k)
    assert d % 128 == 0, d  # head_dim 256 for Gemma; pad upstream otherwise

    sub = 16 if q.dtype == jnp.bfloat16 else 8
    g_pad = ((group + sub - 1) // sub) * sub
    qf = q.reshape(b, hkv, group, d)
    if g_pad != group:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    # View the cache as (B, S, Hkv*D): a free reshape of contiguous memory
    # that puts (seq, head_dim) into the tiled (sublane, lane) positions —
    # blocking (B, S, Hkv, D) directly would tile on the size-1/Hkv dims.
    # Per-head column offset is expressed through the last block index (h).
    k2 = k_cache.reshape(b, s_max, hkv * d)
    v2 = v_cache.reshape(b, s_max, hkv * d)

    lastkb = jnp.maximum(kv_len.astype(jnp.int32) - 1, 0) // block_k

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, hkv, s_max // block_k),
        in_specs=[
            pl.BlockSpec(
                (1, 1, g_pad, d),
                lambda bi, h, kb, lkb, s0, s1, kl: (bi, h, 0, 0),
            ),
            pl.BlockSpec(
                (1, block_k, d),
                lambda bi, h, kb, lkb, s0, s1, kl: (
                    bi, jnp.minimum(kb, lkb[bi]), h
                ),
            ),
            pl.BlockSpec(
                (1, block_k, d),
                lambda bi, h, kb, lkb, s0, s1, kl: (
                    bi, jnp.minimum(kb, lkb[bi]), h
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g_pad, d),
            lambda bi, h, kb, lkb, s0, s1, kl: (bi, h, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((g_pad, d), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, block_k=block_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d), q.dtype),
        interpret=interpret,
    )(
        lastkb,
        seg0_end.astype(jnp.int32),
        seg1_start.astype(jnp.int32),
        kv_len.astype(jnp.int32),
        qf,
        k2,
        v2,
    )
    return out[:, :, :group, :].reshape(b, hq, d)


def reference_decode_attention(
    q, k_cache, v_cache, seg0_end, seg1_start, kv_len, scale=None
):
    """XLA-semantics reference (testing): same 3-scalar mask."""
    from ...ops import attention as xla_attention

    if scale is None:
        scale = q.shape[-1] ** -0.5
    s_max = k_cache.shape[1]
    col = jnp.arange(s_max)[None, :]  # (1, S)
    ok = (col < seg0_end[:, None]) | (
        (col >= seg1_start[:, None]) & (col < kv_len[:, None])
    )
    # (B, 1, Sq=1, Sk) additive mask for ops.attention.gqa
    mask = jnp.where(ok[:, None, None, :], 0.0, xla_attention.NEG_INF)
    return xla_attention.gqa(q[:, None], k_cache, v_cache, mask, scale=scale)[
        :, 0
    ]
