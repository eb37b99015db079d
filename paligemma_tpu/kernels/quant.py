"""Int8 weight-only quantization (Pallas dequant-in-kernel matmul).

The reference's quantization story is bitsandbytes NF4 on the training side
only (ref: Paligemma_FT.ipynb cell 41); serving always runs full precision.
Here weights are stored int8 with per-output-channel fp32 scales and
dequantized *inside* the matmul kernel, in VMEM — HBM reads drop ~2x vs
bf16, which is the whole game for bandwidth-bound decode. A plain XLA
``x @ (w.astype(bf16) * s)`` would materialize the dequantized matrix in HBM
and forfeit the win; the kernel never does.

Layout: weights (K, N) int8, scales (N,) fp32; per-channel symmetric
(zero-point-free) quantization: ``w ≈ w8 * s[None, :]``.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quantize_int8_one(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, N)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w8": w8, "s": scale[..., 0, :]}


def quantize_int8(
    w: jnp.ndarray, chunk_elems: int = 64 * 1024 * 1024
) -> Dict[str, jnp.ndarray]:
    """(..., K, N) weights -> {"w8": int8, "s": fp32 per-N-channel scales}.

    Tensors above ``chunk_elems`` elements are quantized in pieces so the
    fp32 temporary never exceeds a fraction of the input: stacked (L, K, N)
    stacks go one layer at a time, and big 2-D matrices (e.g. a transposed
    LM head, 2048 x 257152 at 3B scale) go in output-column blocks —
    per-channel scales make column blocking exact. The un-chunked 2-D path
    OOMed a 16 GB chip during serving prep when the bf16 model was still
    resident (round-2 driver bench failure).
    """
    big = w.size > chunk_elems
    if w.ndim == 3 and big:
        outs = [jax.jit(_quantize_int8_one)(w[i]) for i in range(w.shape[0])]
        return {
            "w8": jnp.stack([o["w8"] for o in outs]),
            "s": jnp.stack([o["s"] for o in outs]),
        }
    if w.ndim == 2 and big:
        n = w.shape[1]
        step = max(128, (chunk_elems // max(w.shape[0], 1)) // 128 * 128)
        outs = [
            jax.jit(_quantize_int8_one)(
                jax.lax.slice_in_dim(w, i, min(i + step, n), axis=1)
            )
            for i in range(0, n, step)
        ]
        return {
            "w8": jnp.concatenate([o["w8"] for o in outs], axis=1),
            "s": jnp.concatenate([o["s"] for o in outs], axis=0),
        }
    # jitted like the chunked paths so chunked == unchunked bit-for-bit
    # (eager vs jit differ by 1 ulp in the scale division)
    return jax.jit(_quantize_int8_one)(w)


def dequantize(q: Dict[str, jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
    return (q["w8"].astype(jnp.float32) * q["s"][..., None, :]).astype(dtype)


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


def _xla_int8_matmul(x: jnp.ndarray, w8: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """``x @ dequant(w8, s)`` via XLA.

    Measured on v5e: XLA fuses the int8->bf16 convert into the matmul's
    weight stream (no dequantized copy hits HBM), so this reaches the int8
    bandwidth win with none of the Pallas kernel's per-block overhead and
    compiles fast. Differentiable (dw discarded by the caller's stop-grad
    structure; weights are frozen in the QLoRA-style path anyway).
    """
    out = jax.lax.dot_general(
        x, w8.astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (out * s).astype(x.dtype)


def matmul_any(x: jnp.ndarray, w, use_pallas: bool = False) -> jnp.ndarray:
    """Dispatch: dense ``x @ w`` or int8 dequant matmul for quantized dicts.

    Differentiable w.r.t. activations (weights frozen) so a LoRA fine-tune
    can run over an int8 base — the QLoRA-style setup of the reference
    (ref: Paligemma_FT.ipynb cell 41, NF4 base + adapters).
    """
    if isinstance(w, dict) and "w8t" in w:
        return _int8_matmul_nmajor_diffable(x, w["w8t"], w["s"])
    if isinstance(w, dict) and "w8" in w:
        if use_pallas:
            return _int8_matmul_diffable(x, w["w8"], w["s"])
        return _xla_int8_matmul(x, w["w8"], w["s"])
    return x @ w
