"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.kernels.flash_attention import (
    flash_attention,
    reference_attention,
)


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.parametrize(
    "b,sq,skv,hq,hkv,d",
    [
        (1, 16, 16, 2, 1, 64),     # MQA, tiny
        (2, 40, 40, 4, 2, 72),     # GQA, unaligned seq + head_dim (SigLIP-ish)
        (1, 300, 300, 8, 1, 256),  # Gemma-2B prefill shape
    ],
)
def test_flash_matches_reference_prefill(b, sq, skv, hq, hkv, d):
    q, k, v = _rand((b, sq, hq, d), 0), _rand((b, skv, hkv, d), 1), _rand((b, skv, hkv, d), 2)
    kv_len = jnp.asarray([skv - 3] * b, jnp.int32)  # some padding at the end
    prefix_len = kv_len  # prefill: fully bidirectional over valid tokens
    got = flash_attention(q, k, v, prefix_len, kv_len, block_q=128, block_k=128)
    want = reference_attention(q, k, v, prefix_len, kv_len)
    mask_rows = np.arange(sq) < int(kv_len[0])  # compare only valid queries
    np.testing.assert_allclose(
        np.asarray(got)[:, mask_rows], np.asarray(want)[:, mask_rows],
        rtol=2e-4, atol=2e-4,
    )


def test_flash_prefix_plus_causal_training_mask():
    """prefix bidirectional + suffix causal (the PaliGemma training mask)."""
    b, s, hq, hkv, d = 2, 64, 4, 2, 64
    q, k, v = _rand((b, s, hq, d), 3), _rand((b, s, hkv, d), 4), _rand((b, s, hkv, d), 5)
    prefix_len = jnp.asarray([20, 32], jnp.int32)
    kv_len = jnp.asarray([60, 64], jnp.int32)
    got = flash_attention(q, k, v, prefix_len, kv_len, block_q=128, block_k=128)
    want = reference_attention(q, k, v, prefix_len, kv_len)
    for i in range(b):
        rows = np.arange(s) < int(kv_len[i])
        np.testing.assert_allclose(
            np.asarray(got)[i][rows], np.asarray(want)[i][rows], rtol=2e-4, atol=2e-4
        )


def test_flash_pure_causal():
    b, s, h, d = 1, 48, 2, 64
    q, k, v = _rand((b, s, h, d), 6), _rand((b, s, h, d), 7), _rand((b, s, h, d), 8)
    zero = jnp.zeros((b,), jnp.int32)
    full = jnp.full((b,), s, jnp.int32)
    got = flash_attention(q, k, v, zero, full, block_q=128, block_k=128)
    want = reference_attention(q, k, v, zero, full)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_gradients_flow():
    """custom_vjp backward produces grads matching the XLA reference's."""
    b, s, hq, hkv, d = 1, 32, 2, 1, 64
    q, k, v = _rand((b, s, hq, d), 9), _rand((b, s, hkv, d), 10), _rand((b, s, hkv, d), 11)
    prefix = jnp.asarray([16], jnp.int32)
    kvl = jnp.asarray([32], jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, prefix, kvl, block_q=128, block_k=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, prefix, kvl) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "b,sq,skv,hq,hkv,d,prefix",
    [
        (1, 32, 32, 2, 1, 64, 16),    # MQA, prefix+causal
        (2, 80, 80, 4, 2, 72, 40),    # GQA, unaligned shapes, padded kv
        (1, 260, 260, 8, 1, 256, 260),  # Gemma prefill (bidirectional)
    ],
)
def test_flash_backward_kernel_matches_reference(b, sq, skv, hq, hkv, d, prefix):
    """The Pallas FA2 backward (dq/dk/dv blockwise, lse recompute) must match
    the XLA reference attention's VJP on every mask phase."""
    q, k, v = _rand((b, sq, hq, d), 20), _rand((b, skv, hkv, d), 21), _rand((b, skv, hkv, d), 22)
    kvl = jnp.asarray([skv - 5] * b, jnp.int32)
    pfx = jnp.asarray([min(prefix, skv - 5)] * b, jnp.int32)

    # cotangent with structure (not all-ones) to catch transposition bugs
    g = _rand((b, sq, hq, d), 23)

    def flash_fn(q, k, v):
        return flash_attention(q, k, v, pfx, kvl, block_q=128, block_k=128)

    def ref_fn(q, k, v):
        return reference_attention(q, k, v, pfx, kvl)

    # zero the cotangent at invalid query rows (their forward output is
    # garbage by contract in both implementations)
    valid_q = (np.arange(sq) < int(kvl[0]))[None, :, None, None]
    g = g * jnp.asarray(valid_q)

    _, vjp_flash = jax.vjp(flash_fn, q, k, v)
    _, vjp_ref = jax.vjp(ref_fn, q, k, v)
    got = vjp_flash(g)
    want = vjp_ref(g)
    for name, a, w in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=2e-3, atol=2e-3,
            err_msg=name,
        )


def test_flash_backward_bf16_close():
    b, s, hq, hkv, d = 1, 64, 4, 1, 128
    q = _rand((b, s, hq, d), 30).astype(jnp.bfloat16)
    k = _rand((b, s, hkv, d), 31).astype(jnp.bfloat16)
    v = _rand((b, s, hkv, d), 32).astype(jnp.bfloat16)
    pfx = jnp.asarray([32], jnp.int32)
    kvl = jnp.asarray([64], jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, pfx, kvl, block_q=128,
                                       block_k=128).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, pfx, kvl).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, w in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(w, np.float32),
            rtol=5e-2, atol=5e-2,
        )
