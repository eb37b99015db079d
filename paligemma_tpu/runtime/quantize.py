"""Serving-side int8 weight-only quantization of a loaded model.

Converts the Gemma decoder's seven projection matrices per layer (stacked)
and the LM head to int8-with-scales. The embedding table stays bf16/fp32 for
the (single-row) lookups; the head gets a transposed int8 copy because the
full-vocab head matmul dominates decode HBM traffic.

Vision-tower weights are left as-is: they are touched only at prefill, which
is compute- not bandwidth-bound.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax.numpy as jnp

from ..kernels.quant import quantize_int8


def quantize_lm_for_serving(
    params: Dict[str, Any], fuse: bool = True
) -> Dict[str, Any]:
    """int8-quantize the decoder for serving.

    ``fuse=True`` additionally concatenates q/k/v into one "qkv" weight and
    gate/up into one "gateup" weight (decode is launch-overhead-sensitive:
    7 -> 4 weight streams per layer). Quantization happens per fused matrix
    with per-output-channel scales, so numerics equal the unfused path.
    """
    lm = params["lm"]
    layers = lm["layers"]
    attn, mlp = layers["attn"], layers["mlp"]
    if fuse:
        def fuse_quant(*ws):
            # quantize per matrix, then concatenate the int8 results — the
            # scales are per-output-channel so this equals quantizing the
            # fused matrix, without materializing a multi-GB bf16 concat
            qs = [quantize_int8(w) for w in ws]
            return {
                "w8": jnp.concatenate([q["w8"] for q in qs], axis=-1),
                "s": jnp.concatenate([q["s"] for q in qs], axis=-1),
            }

        q_attn = {"qkv": fuse_quant(attn["q"], attn["k"], attn["v"]),
                  "o": quantize_int8(attn["o"])}
        q_mlp = {"gateup": fuse_quant(mlp["gate"], mlp["up"]),
                 "down": quantize_int8(mlp["down"])}
    else:
        q_attn = {name: quantize_int8(w) for name, w in attn.items()}
        q_mlp = {name: quantize_int8(w) for name, w in mlp.items()}
    new_layers = {**layers, "attn": q_attn, "mlp": q_mlp}
    head_q = quantize_int8(jnp.swapaxes(lm["embed"], 0, 1))  # (H, V)
    new_lm = {**lm, "layers": new_layers, "head_q": head_q}
    return {**params, "lm": new_lm}


def quantize_lm_for_training(
    params: Dict[str, Any], kind: str = "nf4", group: int = 64,
    fuse: bool = True,
) -> Dict[str, Any]:
    """Blockwise-4-bit quantize the decoder as a FROZEN fine-tune base —
    QLoRA parity with the reference (ref: Paligemma_FT.ipynb cell 41:
    ``BitsAndBytesConfig(load_in_4bit=True, bnb_4bit_quant_type="nf4")``,
    LoRA r=8 over the 4-bit base, 0.385%% trainable).

    Same seven projections per layer as the int8 serving path, stored as
    packed nibbles + per-``group`` absmax scales (kernels/quant.quantize_4bit)
    — 4.5 bits/weight at group=64, half the int8 base's HBM. The training
    forward dequantizes per matmul in plain XLA (MXU-bound; the transient
    bf16 weight re-materializes under remat). Embedding/norms stay bf16 —
    bitsandbytes also quantizes Linear layers only. ``kind``: "nf4"
    (reference parity) or "int4" (symmetric grid).

    The result also SERVES (matmul_any dispatches "w4"), but decode should
    prefer int8: the XLA nibble unpack is VPU-bound at batch-1 shapes
    (docs/PERFORMANCE.md int4 probe) and the fused decode kernels are
    int8-only.
    """
    from ..kernels.quant import quantize_4bit

    lm = params["lm"]
    layers = lm["layers"]
    attn, mlp = layers["attn"], layers["mlp"]
    n_layers = layers["input_norm"].shape[0]

    def q4(w):
        # per-tensor group: the block axis must divide K, so small configs
        # (tiny-CLI hidden sizes) fall back to gcd(K, group) — still even
        # (K is even, group a power of two), still absmax-per-block
        g = group if w.shape[-2] % group == 0 else math.gcd(
            w.shape[-2], group
        )
        q = quantize_4bit(w, kind=kind, group=g)
        # stacked layer trees are lax.scan-sliced on a leading L axis, so
        # the shared (16,) codebook rides broadcast to (L, 16)
        q["grid"] = jnp.broadcast_to(q["grid"], (n_layers, 16))
        return q

    if fuse:
        def fuse_q4(*ws):
            # per-matrix quantize then concat along N: block scales are
            # per-(K-group, N-channel), so this equals quantizing the fused
            # matrix without the multi-GB bf16 concat temporary
            qs = [q4(w) for w in ws]
            return {
                "w4": jnp.concatenate([q["w4"] for q in qs], axis=-1),
                "s4": jnp.concatenate([q["s4"] for q in qs], axis=-1),
                "grid": qs[0]["grid"],
            }

        q_attn = {"qkv": fuse_q4(attn["q"], attn["k"], attn["v"]),
                  "o": q4(attn["o"])}
        q_mlp = {"gateup": fuse_q4(mlp["gate"], mlp["up"]),
                 "down": q4(mlp["down"])}
    else:
        q_attn = {name: q4(w) for name, w in attn.items()}
        q_mlp = {name: q4(w) for name, w in mlp.items()}
    new_layers = {**layers, "attn": q_attn, "mlp": q_mlp}
    return {**params, "lm": {**lm, "layers": new_layers}}


def quantized_bytes(params: Dict[str, Any]) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
