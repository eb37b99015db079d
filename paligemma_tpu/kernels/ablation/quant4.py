"""Int4 weight-only quantization (Pallas unpack-in-kernel matmul).

Halves decode weight traffic again vs int8 — the bandwidth-bound decode's
biggest remaining lever. ``jnp.int4`` is broken in this jax/libtpu build, so
nibbles are hand-packed into int8 storage and unpacked inside the kernel in
VMEM.

Packing layout ("K-halves"): for weights (K, N), the packed tensor is
(K/2, N) int8 where

    low  nibble of packed[k, n] = q[k, n]           (k in [0, K/2))
    high nibble of packed[k, n] = q[k + K/2, n]

Contracting over K then splits into two MXU calls per block —
``x[:, :K/2] @ low + x[:, K/2:] @ high`` — with both halves in their
original column order: no output permutation, no lane shuffles.

Quantization is symmetric per-output-channel with an fp32 scale per column
(like the int8 path). 4-bit per-channel is coarse; intended for serving
setups that tolerate it (the reference itself fine-tunes on a 4-bit NF4
base, ref: Paligemma_FT.ipynb cell 41). Group-wise scales are future work
(docs/ROADMAP.md).

STATUS: correct and tested, but EXPERIMENTAL — on the current jax/libtpu
build the int32-based nibble unpack is VPU-bound (Mosaic rejects int8
shifts; jnp.int4 is broken), so this measures *slower* than the int8 path
at decode shapes. It becomes profitable once the unpack can run at int8
width. See docs/ROADMAP.md.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., K, N) -> {"w4p": (..., K/2, N) int8 packed, "s": (..., N) fp32}."""
    *lead, k, n = w.shape
    assert k % 2 == 0, "K must be even for nibble packing"
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int8)
    low = q[..., : k // 2, :]
    high = q[..., k // 2 :, :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(low, 0xF), jnp.left_shift(high, 4)
    ).astype(jnp.int8)
    return {"w4p": packed, "s": scale[..., 0, :]}


def dequantize_int4(q: Dict[str, jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
    p = q["w4p"].astype(jnp.int32)
    low = jnp.right_shift(jnp.left_shift(p, 28), 28)  # sign-extended low nibble
    high = jnp.right_shift(jnp.left_shift(p, 24), 28)
    full = jnp.concatenate([low, high], axis=-2).astype(jnp.float32)
    return (full * q["s"][..., None, :]).astype(dtype)


def _int4_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, bk2: int):
    # Grid (M/bm, N/bn, (K/2)/bk2), K innermost. x block: (bm, 2, bk2) —
    # [:, 0, :] are the low-half K rows at this kk offset, [:, 1, :] the
    # high-half rows (the operand is pre-reshaped to (M, 2, K/2)).
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = w_ref[:].astype(jnp.int32)  # (bk2, bn)
    low = jnp.right_shift(jnp.left_shift(p, 28), 28)
    high = jnp.right_shift(jnp.left_shift(p, 24), 28)
    x1 = x_ref[:, 0, :]  # low-half rows
    x2 = x_ref[:, 1, :]  # high-half rows
    acc_ref[:] += jax.lax.dot_general(
        x1, low.astype(x1.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jax.lax.dot_general(
        x2, high.astype(x2.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0, :][None, :]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def int4_matmul(
    x: jnp.ndarray,  # (..., K)
    w4p: jnp.ndarray,  # (K/2, N) int8 packed
    s: jnp.ndarray,  # (N,) fp32
    block_m: int = 256,
    block_n: int = 2048,
    block_k2: int = 1024,  # in packed (K/2) rows
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``x @ dequant_int4(w4p, s)`` with in-kernel nibble unpacking."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, k = x.shape
    k2, n = w4p.shape
    assert k == 2 * k2, (k, k2)
    m = 1
    for d in lead:
        m *= d
    x2d = x.reshape(m, k)

    bm = min(block_m, _round_up(m, 16))
    bk2 = min(block_k2, _round_up(k2, 256))
    bn = min(block_n, _round_up(n, 128))
    m_pad = _round_up(m, bm)
    k2_pad = _round_up(k2, bk2)
    n_pad = _round_up(n, bn)
    if m_pad != m or k2_pad != k2:
        # pad both K halves consistently: x halves at [0,k2) and [k2, 2k2)
        x_lo = jnp.pad(x2d[:, :k2], ((0, m_pad - m), (0, k2_pad - k2)))
        x_hi = jnp.pad(x2d[:, k2:], ((0, m_pad - m), (0, k2_pad - k2)))
        x2d = jnp.concatenate([x_lo, x_hi], axis=1)
    if k2_pad != k2 or n_pad != n:
        w4p = jnp.pad(w4p, ((0, k2_pad - k2), (0, n_pad - n)))
    if n_pad != n:
        s = jnp.pad(s, (0, n_pad - n))

    def x_index(i, j, kk):
        # (bm, 2*bk2) block: columns [kk*bk2, +bk2) and [k2_pad + kk*bk2, +bk2)
        # delivered contiguously is impossible with one BlockSpec — instead
        # the x operand is pre-arranged as (m, 2, k2) so one block covers
        # both halves at the same kk offset.
        return (i, 0, kk)

    x3 = x2d.reshape(m_pad, 2, k2_pad)

    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, bk2=bk2),
        grid=(m_pad // bm, n_pad // bn, k2_pad // bk2),
        in_specs=[
            pl.BlockSpec((bm, 2, bk2), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((bk2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x3, w4p, s.reshape(1, -1).astype(jnp.float32))

    return out[:m, :n].reshape(*lead, n)
