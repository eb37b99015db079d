"""Length-aware Pallas decode-attention kernel vs the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.kernels.ablation.decode_attention import (
    decode_attention,
    reference_decode_attention,
    supported,
)


def _mk(b, s_max, hq, hkv, d, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, hq, d), dtype)
    k = jax.random.normal(ks[1], (b, s_max, hkv, d), dtype)
    v = jax.random.normal(ks[2], (b, s_max, hkv, d), dtype)
    return q, k, v


@pytest.mark.parametrize("hq,hkv", [(8, 1), (8, 2), (4, 4)])
def test_matches_reference_contiguous(hq, hkv):
    b, s_max, d = 3, 256, 128
    q, k, v = _mk(b, s_max, hq, hkv, d)
    kv_len = jnp.asarray([5, 200, 256], jnp.int32)
    seg0 = kv_len  # contiguous: seg0_end == kv_len, no second segment needed
    out = decode_attention(q, k, v, seg0, kv_len, kv_len)
    want = reference_decode_attention(q, k, v, seg0, kv_len, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_matches_reference_with_pad_hole():
    """Right-padded rows: prompt [0, n_valid), pad hole, decode window
    [prompt_len, kv_len). Keys in the hole must not contribute."""
    b, s_max, hq, hkv, d = 2, 128, 8, 2, 128
    q, k, v = _mk(b, s_max, hq, hkv, d, seed=1)
    seg0 = jnp.asarray([10, 20], jnp.int32)  # per-row valid prompt length
    seg1 = jnp.asarray([20, 20], jnp.int32)  # shared padded prompt length
    kv_len = jnp.asarray([25, 25], jnp.int32)  # + 5 decoded tokens
    out = decode_attention(q, k, v, seg0, seg1, kv_len)
    want = reference_decode_attention(q, k, v, seg0, seg1, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # poison the hole: results must not change
    k2 = k.at[0, 10:20].set(1e4)
    v2 = v.at[0, 10:20].set(-1e4)
    out2 = decode_attention(q, k2, v2, seg0, seg1, kv_len)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               rtol=2e-5, atol=2e-5)


def test_blocks_past_length_are_skipped():
    """Whole kv blocks past each row's last needed block are never touched:
    NaN keys there must not contaminate the accumulator (0 * NaN = NaN would
    poison the output if the block were computed). In-block garbage past
    kv_len is covered by the masking tests above with finite poison."""
    b, s_max, hq, hkv, d = 2, 2048, 8, 1, 128
    q, k, v = _mk(b, s_max, hq, hkv, d, seed=2)
    kv_len = jnp.asarray([60, 500], jnp.int32)  # last_kb = 0 (block_k = 512)
    clean = decode_attention(q, k, v, kv_len, kv_len, kv_len)
    # NaNs in blocks 1..3 — skipped for both rows
    k_bad = k.at[:, 512:].set(jnp.nan)
    v_bad = v.at[:, 512:].set(jnp.nan)
    out = decode_attention(q, k_bad, v_bad, kv_len, kv_len, kv_len)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(clean),
                               rtol=2e-5, atol=2e-5)


def test_bf16_close():
    b, s_max, hq, hkv, d = 2, 256, 8, 1, 256
    q, k, v = _mk(b, s_max, hq, hkv, d, seed=3, dtype=jnp.bfloat16)
    kv_len = jnp.asarray([100, 256], jnp.int32)
    out = decode_attention(q, k, v, kv_len, kv_len, kv_len)
    want = reference_decode_attention(q, k, v, kv_len, kv_len, kv_len)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_supported_predicate():
    assert supported(2048, 256)
    assert supported(512, 128)
    assert not supported(100, 256)  # not divisible by any block size
    assert not supported(512, 96)  # head_dim not lane-aligned
