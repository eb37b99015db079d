"""Token sampling, fully jittable.

Reproduces the reference decode-loop sampling semantics
(ref: inference.py:59-68, _sample_top_p at inference.py:90-106):

* greedy: ``argmax(logits[:, -1])``
* sampled: ``probs = softmax(logits / temperature)`` then top-p with the
  shift-by-one cumulative-sum mask (``cumsum - p_i > p`` keeps the first
  token that crosses the threshold), renormalize, draw.

The reference's ``torch.multinomial`` draw is replaced by a Gumbel-max draw
over the renormalized top-p distribution — identical distribution, but pure
and jittable with a threaded PRNG key (no host round-trip per step).
Everything runs in fp32: at Gemma's 257k vocab the sort dominates and fp32
keeps the cumsum exact enough for the boundary token.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax next token. ``logits``: (B, vocab) -> (B,) int32."""
    return jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)


def top_p_mask_probs(probs_sorted: jnp.ndarray, p: float) -> jnp.ndarray:
    """Zero out tokens outside the top-p nucleus, given descending-sorted probs.

    Keeps the first token whose inclusion crosses ``p`` (shift-by-one rule,
    ref: inference.py:94-99).
    """
    cumsum = jnp.cumsum(probs_sorted, axis=-1)
    mask = (cumsum - probs_sorted) > p
    return jnp.where(mask, 0.0, probs_sorted)


def sample_top_p(
    key: jax.Array,
    logits: jnp.ndarray,  # (B, vocab)
    temperature: float,
    top_p: float,
) -> jnp.ndarray:
    """Temperature + top-p sample. Returns (B,) int32 token ids."""
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)
    # Descending sort of the full vocab (matches torch.sort(descending=True)).
    sort_idx = jnp.argsort(-probs, axis=-1)
    probs_sorted = jnp.take_along_axis(probs, sort_idx, axis=-1)
    kept = top_p_mask_probs(probs_sorted, top_p)
    kept = kept / jnp.sum(kept, axis=-1, keepdims=True)
    # Gumbel-max over log-probs == categorical draw over `kept`.
    log_kept = jnp.log(jnp.where(kept > 0, kept, 1e-38))
    log_kept = jnp.where(kept > 0, log_kept, -jnp.inf)
    gumbel = jax.random.gumbel(key, kept.shape, dtype=jnp.float32)
    choice = jnp.argmax(log_kept + gumbel, axis=-1)  # index into sorted order
    return jnp.take_along_axis(sort_idx, choice[:, None], axis=-1)[:, 0].astype(
        jnp.int32
    )


def sample(
    key: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 0.8,
    top_p: float = 0.9,
    do_sample: bool = False,
) -> jnp.ndarray:
    """Dispatch matching the reference CLI defaults (ref: inference.py:113-116)."""
    if do_sample:
        return sample_top_p(key, logits, temperature, top_p)
    return greedy(logits)
