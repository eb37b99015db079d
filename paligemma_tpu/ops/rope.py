"""Rotary position embeddings, TPU-style.

The reference recomputes identical cos/sin tables inside every decoder layer
on every forward (ref: modeling_gemma.py:103-135, per-layer module instances
at 238-242). Here the tables are a pure function of position ids, computed
once per step outside the layer scan and broadcast to all layers — XLA hoists
them and they cost nothing next to the matmuls.

Convention: HF "half-split" rotation (ref: modeling_gemma.py:138-151) —
``rotate_half(x) = concat(-x[d/2:], x[:d/2])`` over the last dim, NOT the
interleaved-pair layout of the original paper. This matches how HF permutes
the checkpoint's q/k weights.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(
    position_ids: jnp.ndarray,  # (B, S) int32
    head_dim: int,
    theta: float = 10000.0,
    dtype=jnp.float32,
):
    """cos/sin tables of shape (B, S, head_dim).

    ``inv_freq[i] = theta**(-2i/d)``, ``freqs = pos * inv_freq``, and the table
    is ``concat(freqs, freqs)`` so each half of the head dim sees the same
    frequency (ref: modeling_gemma.py:112,129-134). Computed in fp32 (the
    reference forces fp32 with autocast disabled) then cast to ``dtype``.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # (d/2,)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (B, S, d/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, S, d)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray,  # (B, S, H, d) — head axis *after* seq (TPU-friendly layout)
    cos: jnp.ndarray,  # (B, S, d)
    sin: jnp.ndarray,  # (B, S, d)
) -> jnp.ndarray:
    """Rotate q or k: ``x*cos + rotate_half(x)*sin`` (ref: modeling_gemma.py:145-151)."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return x * cos + rotate_half(x) * sin
