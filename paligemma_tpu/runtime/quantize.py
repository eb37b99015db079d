"""Serving-side int8 weight-only quantization of a loaded model.

Converts the Gemma decoder's seven projection matrices per layer (stacked)
and the LM head to int8-with-scales. The embedding table stays bf16/fp32 for
the (single-row) lookups; the head gets a transposed int8 copy because the
full-vocab head matmul dominates decode HBM traffic.

Vision-tower weights are left as-is: they are touched only at prefill, which
is compute- not bandwidth-bound.
"""

from __future__ import annotations

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


def quantized_bytes(params: Dict[str, Any]) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
