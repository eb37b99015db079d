"""Unit tests for core ops against independent (numpy / torch) references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.ops import activations, attention, norms, rope, sampling

torch = pytest.importorskip("torch")


def test_rope_matches_torch_convention():
    """RoPE must match the HF half-split convention computed independently."""
    b, s, h, d = 2, 5, 3, 8
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, s, h, d)).astype(np.float32)
    pos = np.array([[1, 2, 3, 4, 5], [1, 1, 2, 3, 4]], dtype=np.int32)

    cos, sin = rope.rope_cos_sin(jnp.asarray(pos), d, theta=10000.0)
    got = rope.apply_rope(jnp.asarray(x), cos, sin)

    # Independent numpy reference of formula (34), half-split layout.
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    freqs = pos[..., None] * inv_freq  # (b, s, d/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    c, si = np.cos(emb)[:, :, None, :], np.sin(emb)[:, :, None, :]
    half = d // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    want = x * c + rot * si
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_rms_norm_matches_gemma_semantics():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 16)).astype(np.float32) * 3
    w = rng.normal(size=(16,)).astype(np.float32) * 0.1
    got = norms.rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)

    xt = torch.tensor(x)
    var = xt.pow(2).mean(-1, keepdim=True) + 1e-6
    want = (xt * torch.rsqrt(var)) * (1.0 + torch.tensor(w))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 5, 12)).astype(np.float32)
    scale = rng.normal(size=(12,)).astype(np.float32)
    bias = rng.normal(size=(12,)).astype(np.float32)
    got = norms.layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 1e-6)
    want = torch.nn.functional.layer_norm(
        torch.tensor(x), (12,), torch.tensor(scale), torch.tensor(bias), 1e-6
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_gelu_tanh_matches_torch():
    x = np.linspace(-6, 6, 101).astype(np.float32)
    got = activations.gelu_tanh(jnp.asarray(x))
    want = torch.nn.functional.gelu(torch.tensor(x), approximate="tanh")
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_geglu_matches_torch():
    rng = np.random.default_rng(3)
    h, i = 8, 16
    x = rng.normal(size=(2, 4, h)).astype(np.float32)
    gw = rng.normal(size=(h, i)).astype(np.float32) * 0.1
    uw = rng.normal(size=(h, i)).astype(np.float32) * 0.1
    dw = rng.normal(size=(i, h)).astype(np.float32) * 0.1
    got = activations.geglu(jnp.asarray(x), jnp.asarray(gw), jnp.asarray(uw), jnp.asarray(dw))
    xt = torch.tensor(x)
    want = (
        torch.nn.functional.gelu(xt @ torch.tensor(gw), approximate="tanh")
        * (xt @ torch.tensor(uw))
    ) @ torch.tensor(dw)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-4)


def test_gqa_equals_repeat_kv_mha():
    """Native GQA grouping must equal the reference's repeat_kv expansion."""
    rng = np.random.default_rng(4)
    b, sq, sk, hq, hkv, d = 2, 6, 9, 8, 2, 16
    q = rng.normal(size=(b, sq, hq, d)).astype(np.float32)
    k = rng.normal(size=(b, sk, hkv, d)).astype(np.float32)
    v = rng.normal(size=(b, sk, hkv, d)).astype(np.float32)
    mask = np.where(rng.random((b, 1, sq, sk)) < 0.8, 0.0, attention.NEG_INF).astype(
        np.float32
    )
    # make sure no fully-masked row
    mask[..., 0] = 0.0

    got = attention.gqa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))

    g = hq // hkv
    k_rep = np.repeat(k, g, axis=2)
    v_rep = np.repeat(v, g, axis=2)
    want = attention.mha(
        jnp.asarray(q), jnp.asarray(k_rep), jnp.asarray(v_rep), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_mha_matches_torch_sdpa():
    rng = np.random.default_rng(5)
    b, s, h, d = 2, 7, 4, 8
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)
    got = attention.mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = torch.nn.functional.scaled_dot_product_attention(
        torch.tensor(q).transpose(1, 2),
        torch.tensor(k).transpose(1, 2),
        torch.tensor(v).transpose(1, 2),
    ).transpose(1, 2)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


class TestSampling:
    def test_greedy(self):
        logits = jnp.asarray([[0.1, 3.0, -1.0], [5.0, 0.0, 0.0]])
        np.testing.assert_array_equal(np.asarray(sampling.greedy(logits)), [1, 0])

    def test_top_p_mask_matches_torch_reference_rule(self):
        """shift-by-one rule: first token crossing p is kept (inference.py:94-99)."""
        probs = np.array([[0.5, 0.3, 0.15, 0.05]], dtype=np.float32)
        kept = np.asarray(sampling.top_p_mask_probs(jnp.asarray(probs), 0.7))
        # cumsum - probs = [0, .5, .8, .95]; mask where > 0.7 -> last two zeroed
        np.testing.assert_allclose(kept, [[0.5, 0.3, 0.0, 0.0]])

        kept = np.asarray(sampling.top_p_mask_probs(jnp.asarray(probs), 0.5))
        np.testing.assert_allclose(kept, [[0.5, 0.3, 0.0, 0.0]])

    def test_sample_top_p_distribution(self):
        """Empirical frequencies must match the renormalized nucleus."""
        logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
        keys = jax.random.split(jax.random.PRNGKey(0), 2000)
        draw = jax.jit(lambda k: sampling.sample_top_p(k, logits, 1.0, 0.7))
        samples = np.asarray(jax.vmap(draw)(keys)).ravel()
        assert set(np.unique(samples)) <= {0, 1}
        freq1 = (samples == 1).mean()
        assert abs(freq1 - 0.375) < 0.04  # 0.3/0.8

    def test_sample_greedy_dispatch(self):
        logits = jnp.asarray([[0.0, 2.0]])
        tok = sampling.sample(jax.random.PRNGKey(0), logits, do_sample=False)
        assert int(tok[0]) == 1

    def test_temperature_sharpening(self):
        logits = jnp.asarray([[1.0, 0.0]])
        keys = jax.random.split(jax.random.PRNGKey(1), 1000)
        cold = jax.vmap(lambda k: sampling.sample_top_p(k, logits, 0.1, 1.0))(keys)
        hot = jax.vmap(lambda k: sampling.sample_top_p(k, logits, 10.0, 1.0))(keys)
        assert (np.asarray(cold) == 0).mean() > 0.98
        assert 0.35 < (np.asarray(hot) == 0).mean() < 0.65
