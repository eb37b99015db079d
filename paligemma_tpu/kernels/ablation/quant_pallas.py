"""Pallas int8 dequant-in-kernel matmuls (ablation shelf).

These stream int8 weights into VMEM and dequantize inside the kernel.
Measured on v5e they only MATCH the XLA path (which fuses the int8->bf16
convert into the matmul weight stream) while adding per-block overhead, so
production uses kernels/quant.py::matmul_any. Kept for A/B reruns; the
custom-VJP wrappers make them drop-in for the QLoRA path.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import quantize_int8


def _int8_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    # Grid (M/bm, N/bn, K/bk), K innermost; fp32 accumulator persists in
    # VMEM scratch across the K sweep.
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)  # dequant int8 -> activation dtype in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0, :][None, :]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def int8_matmul(
    x: jnp.ndarray,  # (..., K)
    w8: jnp.ndarray,  # (K, N) int8
    s: jnp.ndarray,  # (N,) fp32
    block_m: int = 256,
    block_n: int = 2048,
    block_k: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``x @ dequant(w8, s)`` with in-kernel dequantization.

    Default 2048x2048 int8 blocks (4 MB) keep the per-grid-step fixed cost
    amortized — with small blocks the kernel becomes launch-overhead-bound
    and the bandwidth saving of int8 disappears.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, k = x.shape
    n = w8.shape[1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    bm = min(block_m, _round_up(m, 16))
    bk = min(block_k, _round_up(k, 256))
    bn = min(block_n, _round_up(n, 128))
    m_pad, k_pad, n_pad = _round_up(m, bm), _round_up(k, bk), _round_up(n, bn)
    if m_pad != m or k_pad != k:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, k_pad - k)))
    if k_pad != k or n_pad != n:
        w8 = jnp.pad(w8, ((0, k_pad - k), (0, n_pad - n)))
    if n_pad != n:
        s = jnp.pad(s, (0, n_pad - n))

    out = pl.pallas_call(
        _int8_matmul_kernel,
        grid=(m_pad // bm, n_pad // bn, k_pad // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x2, w8, s.reshape(1, -1).astype(jnp.float32))

    return out[:m, :n].reshape(*lead, n)


def quantize_int8_nmajor(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Quantize (..., K, N) weights stored N-major: {"w8t": (..., N, K) int8}.

    N-major storage makes each weight block a contiguous HBM slab (full-K
    rows), so the kernel's DMAs stream at full bandwidth instead of striding
    across a huge N dimension.
    """
    q = quantize_int8(w)
    return {"w8t": jnp.swapaxes(q["w8"], -1, -2), "s": q["s"]}


def _int8_matmul_nmajor_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    # Grid (M/bm, N/bn, K/bk); w block: (bn, bk) int8, rows are output chans.
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)  # (bn, bk)
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0, :][None, :]).astype(o_ref.dtype)


def int8_matmul_nmajor(
    x: jnp.ndarray,  # (..., K)
    w8t: jnp.ndarray,  # (N, K) int8
    s: jnp.ndarray,  # (N,) fp32
    block_m: int = 256,
    block_n: int = 2048,
    block_k: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, k = x.shape
    n = w8t.shape[0]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    bm = min(block_m, _round_up(m, 16))
    bk = min(block_k, _round_up(k, 256))
    bn = min(block_n, _round_up(n, 128))
    m_pad, k_pad, n_pad = _round_up(m, bm), _round_up(k, bk), _round_up(n, bn)
    if m_pad != m or k_pad != k:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, k_pad - k)))
    if k_pad != k or n_pad != n:
        w8t = jnp.pad(w8t, ((0, n_pad - n), (0, k_pad - k)))
    if n_pad != n:
        s = jnp.pad(s, (0, n_pad - n))

    out = pl.pallas_call(
        _int8_matmul_nmajor_kernel,
        grid=(m_pad // bm, n_pad // bn, k_pad // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x2, w8t, s.reshape(1, -1).astype(jnp.float32))

    return out[:m, :n].reshape(*lead, n)


@jax.custom_vjp
def _int8_matmul_diffable(x, w8, s):
    return int8_matmul(x, w8, s)


def _int8_mm_fwd(x, w8, s):
    return int8_matmul(x, w8, s), (w8, s)


def _int8_mm_bwd(res, g):
    # dx = g @ dequant(w).T = (g * s) @ w8.T. Weights are frozen in the
    # quantized-base (QLoRA-style) training path, so no dw is produced.
    w8, s = res
    gs = g.astype(jnp.float32) * s  # s broadcasts over the last (N) axis
    dx = jax.lax.dot_general(
        gs, w8.astype(jnp.float32), (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    return dx, None, None


_int8_matmul_diffable.defvjp(_int8_mm_fwd, _int8_mm_bwd)


@jax.custom_vjp
def _int8_matmul_nmajor_diffable(x, w8t, s):
    return int8_matmul_nmajor(x, w8t, s)


def _int8_nm_fwd(x, w8t, s):
    return int8_matmul_nmajor(x, w8t, s), (w8t, s)


def _int8_nm_bwd(res, g):
    w8t, s = res  # (N, K)
    gs = g.astype(jnp.float32) * s  # s broadcasts over the last (N) axis
    dx = jax.lax.dot_general(
        gs, w8t.astype(jnp.float32), (((g.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    return dx, None, None


_int8_matmul_nmajor_diffable.defvjp(_int8_nm_fwd, _int8_nm_bwd)


