"""Training losses.

Causal-LM cross entropy with ``ignore_index=-100`` semantics — the label
convention used by the reference fine-tune (HF collate with suffix labels,
ref: Paligemma_FT.ipynb cells 27/38; ignore_index default from
modeling_paligemma.py:21).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def causal_lm_loss(
    logits: jnp.ndarray,  # (B, S, V) — fp32
    labels: jnp.ndarray,  # (B, S) int32; IGNORE_INDEX entries contribute 0
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Next-token cross entropy: logits[:, t] predict labels[:, t+1].

    Mean over non-ignored targets (HF reduction).
    """
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    token_loss = -jnp.where(valid, token_logp, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(token_loss) / denom
