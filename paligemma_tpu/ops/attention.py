"""Attention ops (XLA path).

GQA is computed *without* materializing repeated KV heads: queries are
reshaped to (B, S, n_kv, group, d) and contracted against the raw KV heads
with einsum. The reference instead copies KV ``group_size`` times
(repeat_kv, ref: modeling_gemma.py:185-196, with a comment that the "custom
cuda kernel isn't available") — on TPU the einsum maps straight onto the MXU
and the copy never exists.

Softmax is computed in fp32 regardless of activation dtype
(ref: modeling_siglip.py:122, modeling_gemma.py:329).

A Pallas flash-attention kernel (kernels/flash_attention.py) replaces this
for long prefills; this XLA version is the reference semantics and the
fallback for CPU tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.3819763e38  # minimum bf16-representable; used for masking


def mha(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Sk, H, D)
    v: jnp.ndarray,  # (B, Sk, H, D)
    mask: Optional[jnp.ndarray] = None,  # (B, 1|H, Sq, Sk) additive, fp32
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain multi-head attention (SigLIP tower; non-causal)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def gqa(
    q: jnp.ndarray,  # (B, Sq, Hq, D)
    k: jnp.ndarray,  # (B, Sk, Hkv, D)
    v: jnp.ndarray,  # (B, Sk, Hkv, D)
    mask: Optional[jnp.ndarray] = None,  # (B, 1, Sq, Sk) additive, fp32
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query attention with native head grouping (no repeat_kv)."""
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    if scale is None:
        scale = d**-0.5
    qg = q.reshape(b, sq, hkv, g, d)
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)[:, :, None, :, :]
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, hq, d).astype(v.dtype)


def make_additive_mask(valid: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, Sq, Sk) bool "may attend" -> (B, 1, Sq, Sk) additive mask.

    PaliGemma uses prefix-LM masking: during prefill every valid token
    attends to every other valid token (the reference materializes an
    all-zeros mask, ref: modeling_paligemma.py:149-169); invalid (padding /
    not-yet-written cache) positions get -inf.
    """
    return jnp.where(valid[:, None, :, :], 0.0, NEG_INF).astype(dtype)
