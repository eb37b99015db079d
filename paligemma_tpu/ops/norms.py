"""Normalization ops.

RMSNorm follows Gemma semantics: fp32 compute, ``x * (1 + weight)`` with
zero-initialized weight (ref: modeling_gemma.py:157-182) — NOT LLaMA's
``x * weight``. Divergence from the reference (documented): the reference
returns the fp32 result without casting back to the input dtype
(modeling_gemma.py:177-182); we cast back so the bf16 fast path stays bf16,
matching HF transformers' Gemma. In the fp32 parity path this is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Gemma RMSNorm: fp32 ``x * rsqrt(mean(x^2)+eps) * (1+w)``."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = normed * (1.0 + weight.astype(jnp.float32))
    return out.astype(dtype)


def layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Standard LayerNorm (SigLIP towers use LN, ref: modeling_siglip.py:199-204)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
