"""Activations and gated MLPs.

Both towers use tanh-approximated GELU (ref: modeling_siglip.py:184,
modeling_gemma.py:214). The Gemma MLP is GeGLU:
``down( gelu_tanh(gate(x)) * up(x) )`` (ref: modeling_gemma.py:198-218).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with tanh approximation, matching torch's ``approximate='tanh'``."""
    xf = x.astype(jnp.float32)
    c = np.sqrt(2.0 / np.pi).astype(np.float32)
    out = 0.5 * xf * (1.0 + jnp.tanh(c * (xf + 0.044715 * xf**3)))
    return out.astype(x.dtype)


def geglu(x: jnp.ndarray, gate_w: jnp.ndarray, up_w: jnp.ndarray, down_w: jnp.ndarray):
    """Gemma GeGLU MLP. Weights are (in, out) so ``x @ w`` hits the MXU directly."""
    gate = gelu_tanh(x @ gate_w)
    up = x @ up_w
    return (gate * up) @ down_w
