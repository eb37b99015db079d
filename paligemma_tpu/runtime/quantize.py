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


def quantize_lm_for_serving(params: Dict[str, Any]) -> Dict[str, Any]:
    lm = params["lm"]
    layers = lm["layers"]
    q_attn = {name: quantize_int8(w) for name, w in layers["attn"].items()}
    q_mlp = {name: quantize_int8(w) for name, w in layers["mlp"].items()}
    new_layers = {**layers, "attn": q_attn, "mlp": q_mlp}
    head_q = quantize_int8(jnp.swapaxes(lm["embed"], 0, 1))  # (H, V)
    new_lm = {**lm, "layers": new_layers, "head_q": head_q}
    return {**params, "lm": new_lm}


def quantized_bytes(params: Dict[str, Any]) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
