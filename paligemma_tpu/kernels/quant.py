"""Int8 weight-only quantization.

The reference's quantization story is bitsandbytes NF4 on the training side
only (ref: Paligemma_FT.ipynb cell 41); serving always runs full precision.
Here weights are stored int8 with per-output-channel fp32 scales — HBM
reads drop ~2x vs bf16, which is the whole game for bandwidth-bound
decode. The matmul path is XLA's ``dot(x, w8.astype(bf16)) * s``: measured
on v5e, XLA fuses the int8->bf16 convert into the matmul's weight stream
(no dequantized copy ever hits HBM), matching the Pallas dequant-in-kernel
variants (now in kernels/ablation/quant_pallas.py) without their per-block
overhead. The fused decode kernels (decode_layer/decode_mlp/decode_head)
consume the same int8 layout directly.

Layout: weights (K, N) int8, scales (N,) fp32; per-channel symmetric
(zero-point-free) quantization: ``w ≈ w8 * s[None, :]``.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


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


def matmul_any(x: jnp.ndarray, w) -> jnp.ndarray:
    """Dispatch: dense ``x @ w`` or int8 dequant matmul for quantized dicts.

    Differentiable w.r.t. activations (weights frozen) so a LoRA fine-tune
    can run over an int8 base — the QLoRA-style setup of the reference
    (ref: Paligemma_FT.ipynb cell 41, NF4 base + adapters). The Pallas
    dequant-matmul variants this dispatch once covered live in
    kernels/ablation/quant_pallas.py — XLA's fused weight-stream convert
    measured equal without the per-block overhead.
    """
    if isinstance(w, dict) and "w8" in w:
        return _xla_int8_matmul(x, w["w8"], w["s"])
    return x @ w
