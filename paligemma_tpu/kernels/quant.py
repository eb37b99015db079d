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


def _xla_w8a8_matmul(x: jnp.ndarray, w8: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """W8A8: dynamic per-row int8 activations x int8 weights on the MXU.

    ``dot_general(int8, int8, preferred=int32)`` runs ~1.5x FASTER than
    the bf16 dot at compute-bound prefill shapes on this chip
    (.bench/int8_prefill_probe.py: 1.50 vs 2.24 ms at
    (4096,2048)@(2048,16384) incl. the dynamic row quant, which costs
    ~4%) — the round-3 "int8 MXU is slower" verdict was measured at a
    DECODE shape where the dot is HBM-bound and MXU rate is irrelevant
    (docs/PERFORMANCE.md "int8 activation quant"). Numerics: symmetric
    per-row activation scales x per-output-channel weight scales; the
    int32 accumulation is exact, so the only new error is the activation
    rounding (bounded by amax/127 per element).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    a_s = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / a_s), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (out.astype(jnp.float32) * a_s * s).astype(x.dtype)


def matmul_any(x: jnp.ndarray, w, int8_act: bool = False) -> jnp.ndarray:
    """Dispatch: dense ``x @ w``, int8, or blockwise-4-bit dequant matmul.

    Differentiable w.r.t. activations (weights frozen) so a LoRA fine-tune
    can run over an int8 or 4-bit base — the QLoRA setup of the reference
    (ref: Paligemma_FT.ipynb cell 41, NF4 base + adapters). The Pallas
    dequant-matmul variants this dispatch once covered live in
    kernels/ablation/quant_pallas.py — XLA's fused weight-stream convert
    measured equal without the per-block overhead.

    ``int8_act=True`` (static) takes the W8A8 MXU path on int8 weights
    when the matmul is prefill-sized (>= 256 total rows; decode-sized
    calls keep the exact convert path so single-token numerics never
    change). Opt-in via the engines' ``int8_act_prefill`` flag.
    """
    if isinstance(w, dict) and "w8" in w:
        rows = 1
        for d in x.shape[:-1]:
            rows *= int(d)
        if int8_act and rows >= 256:
            return _xla_w8a8_matmul(x, w["w8"], w["s"])
        return _xla_int8_matmul(x, w["w8"], w["s"])
    if isinstance(w, dict) and "w4" in w:
        return _xla_4bit_matmul(x, w)
    return x @ w


# ---------------------------------------------------------------------------
# Blockwise 4-bit (NF4 / symmetric int4) — the TRAINING-side base format.
#
# The reference's headline PEFT recipe is LoRA r=8 over a 4-bit NF4 base
# (ref: Paligemma_FT.ipynb cell 41: BitsAndBytesConfig(load_in_4bit=True,
# bnb_4bit_quant_type="nf4"), 0.385% trainable). This is the JAX analog:
# absmax-scaled blocks of ``group`` consecutive input-dim weights snapped to
# the 16-value NF4 grid (the QLoRA paper's normal-distribution quantiles),
# two nibbles packed per uint8. The unpack + grid gather runs in plain XLA —
# training forwards are MXU-bound, so the VPU unpack rides for free — unlike
# the decode-side Pallas int4 kernel (kernels/ablation/quant4.py), which this
# toolchain's missing int8 shifts keep VPU-bound at decode shapes.
#
# Layout for (..., K, N) weights:
#   "w4":   (..., K/2, N) uint8 — packed[i] holds rows (2i | 2i+1 << 4)
#   "s4":   (..., K/group, N) fp32 absmax per block (grid spans [-1, 1])
#   "grid": (16,) fp32 codebook — NF4 or the symmetric int4 grid
# Effective bits/weight at group=64: 4 + 32/64 = 4.5 (vs int8's 8; vs
# bf16's 16), so a 4-bit fine-tune base halves the int8 base's HBM.
# ---------------------------------------------------------------------------

# QLoRA NF4 grid (Dettmers et al. 2023, public constant; matches
# bitsandbytes' bnb_4bit_quant_type="nf4" codebook)
NF4_GRID = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)
# symmetric int4: [-7..7]/7 padded to 16 entries (index 15 duplicates +1.0;
# the quantizer's nearest-midpoint search never emits it)
INT4_GRID = tuple(i / 7.0 for i in range(-7, 8)) + (1.0,)


def _quantize_4bit_one(w: jnp.ndarray, grid: jnp.ndarray, group: int):
    wf = w.astype(jnp.float32)
    k, n = wf.shape[-2], wf.shape[-1]
    lead = wf.shape[:-2]
    g = wf.reshape(lead + (k // group, group, n))
    scale = jnp.maximum(jnp.max(jnp.abs(g), axis=-2), 1e-8)  # (..., K/g, N)
    x = g / scale[..., None, :]
    mids = (grid[1:] + grid[:-1]) / 2.0
    idx = jnp.searchsorted(mids, x).astype(jnp.uint8).reshape(lead + (k, n))
    packed = (
        idx[..., 0::2, :] | (idx[..., 1::2, :] << jnp.uint8(4))
    ).astype(jnp.uint8)
    return {"w4": packed, "s4": scale, "grid": grid}


def quantize_4bit(
    w: jnp.ndarray, kind: str = "nf4", group: int = 64,
    chunk_elems: int = 64 * 1024 * 1024,
) -> Dict[str, jnp.ndarray]:
    """(..., K, N) weights -> blockwise 4-bit dict (see layout note above).

    ``kind``: "nf4" (reference parity) or "int4" (symmetric linear grid).
    Stacked (L, K, N) tensors above ``chunk_elems`` quantize one layer at a
    time so the fp32 temporary stays bounded (same policy as int8)."""
    grids = {"nf4": NF4_GRID, "int4": INT4_GRID}
    if kind not in grids:
        raise ValueError(f"unknown 4-bit kind {kind!r} (nf4|int4)")
    grid = jnp.asarray(grids[kind], jnp.float32)
    assert w.shape[-2] % group == 0 and w.shape[-2] % 2 == 0, (
        f"K={w.shape[-2]} must divide group={group} and be even"
    )
    fn = jax.jit(_quantize_4bit_one, static_argnames=("group",))
    if w.ndim == 3 and w.size > chunk_elems:
        outs = [fn(w[i], grid, group=group) for i in range(w.shape[0])]
        return {
            "w4": jnp.stack([o["w4"] for o in outs]),
            "s4": jnp.stack([o["s4"] for o in outs]),
            "grid": grid,
        }
    return fn(w, grid, group=group)


def dequantize_4bit(q: Dict[str, jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
    packed, scale, grid = q["w4"], q["s4"], q["grid"]
    if grid.ndim > 1:
        # stacked (L, 16) layout (every layer shares the codebook; the L
        # axis only exists so the layer-scan can slice the tree uniformly)
        grid = grid[(0,) * (grid.ndim - 1)]
    lead = packed.shape[:-2]
    k2, n = packed.shape[-2], packed.shape[-1]
    k = 2 * k2
    group = k // scale.shape[-2]
    lo = packed & jnp.uint8(0xF)
    hi = packed >> jnp.uint8(4)
    idx = jnp.stack([lo, hi], axis=-2).reshape(lead + (k, n))
    vals = grid[idx].reshape(lead + (k // group, group, n))
    return (vals * scale[..., None, :].astype(jnp.float32)).reshape(
        lead + (k, n)
    ).astype(dtype)


def _xla_4bit_matmul(x: jnp.ndarray, q: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """``x @ dequant4(q)`` via XLA. The dequantized weight is a transient
    (recomputed under remat); only packed nibbles + block scales live in
    HBM. MXU-bound at training shapes — the unpack is ~3% of the matmul's
    VPU budget; at decode shapes prefer the int8 path (docs/PERFORMANCE.md
    int4 probe)."""
    return x @ dequantize_4bit(q, x.dtype)
