"""Model-level tests: shapes, conv-equivalence of patchify, and KV-cache
incremental-decode consistency against a no-cache reference forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import gemma, paligemma, siglip
from paligemma_tpu.ops import attention
from paligemma_tpu.ops.activations import geglu
from paligemma_tpu.ops.norms import rms_norm
from paligemma_tpu.ops.rope import apply_rope, rope_cos_sin

torch = pytest.importorskip("torch")

CFG = tiny_test_config()


def test_siglip_output_shape():
    """Tiny analog of the reference smoke test (modeling_siglip.py:337-361)."""
    params = siglip.init_params(jax.random.PRNGKey(0), CFG.vision_config)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28))
    out = siglip.encode(params, CFG.vision_config, x)
    assert out.shape == (2, CFG.vision_config.num_patches, CFG.vision_config.hidden_size)


def test_patchify_matches_conv2d():
    """Reshape+matmul patch embed == strided Conv2d (modeling_siglip.py:258-263)."""
    p, c, d = 4, 3, 8
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, c, 12, 12)).astype(np.float32)
    w = rng.normal(size=(d, c, p, p)).astype(np.float32)
    b = rng.normal(size=(d,)).astype(np.float32)

    want = torch.nn.functional.conv2d(
        torch.tensor(img), torch.tensor(w), torch.tensor(b), stride=p
    )
    want = want.flatten(2).transpose(1, 2).numpy()  # (B, n_patches, D)

    patches = siglip.patchify(jnp.asarray(img.transpose(0, 2, 3, 1)), p)
    kernel = jnp.asarray(w.transpose(2, 3, 1, 0).reshape(p * p * c, d))
    got = patches @ kernel + jnp.asarray(b)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _naive_gemma_forward(params, cfg, embeds, position_ids, pairwise_valid):
    """No-cache reference decoder with an explicit (B, Sq, Sk) mask."""
    x = embeds * jnp.asarray(cfg.hidden_size**0.5, embeds.dtype)
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)
    mask = attention.make_additive_mask(pairwise_valid)
    L = cfg.num_hidden_layers
    for i in range(L):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        b, s, _ = x.shape
        res = x
        y = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        q = (y @ lp["attn"]["q"]).reshape(b, s, cfg.num_attention_heads, cfg.head_dim)
        k = (y @ lp["attn"]["k"]).reshape(b, s, cfg.num_key_value_heads, cfg.head_dim)
        v = (y @ lp["attn"]["v"]).reshape(b, s, cfg.num_key_value_heads, cfg.head_dim)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        a = attention.gqa(q, k, v, mask)
        x = res + a.reshape(b, s, -1) @ lp["attn"]["o"]
        res = x
        y = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
        x = res + geglu(y, lp["mlp"]["gate"], lp["mlp"]["up"], lp["mlp"]["down"])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return (x @ params["embed"].T).astype(jnp.float32)


def test_kv_cache_incremental_matches_full_forward():
    """prefill(S) + 2 single-token decodes == one forward over S+2 tokens with
    the exact prefix-LM incremental mask (rows i>=S attend [0, i])."""
    cfg = CFG.text_config
    params = gemma.init_params(jax.random.PRNGKey(0), cfg)
    B, S, EXTRA, MAX = 2, 5, 2, 16
    key = jax.random.PRNGKey(1)
    embeds = jax.random.normal(key, (B, S + EXTRA, cfg.hidden_size)) * 0.1
    positions = jnp.broadcast_to(jnp.arange(1, S + EXTRA + 1), (B, S + EXTRA))

    # --- incremental path
    cache = gemma.init_kv_cache(cfg, B, MAX)
    kv_valid = jnp.zeros((B, MAX), bool).at[:, :S].set(True)
    logits_prefill, cache = gemma.forward(
        params, cfg, embeds[:, :S], positions[:, :S], cache,
        cache_pos=jnp.zeros((), jnp.int32), kv_valid=kv_valid,
    )
    step_logits = []
    for t in range(EXTRA):
        kv_valid = kv_valid.at[:, S + t].set(True)
        lg, cache = gemma.forward(
            params, cfg, embeds[:, S + t : S + t + 1], positions[:, S + t : S + t + 1],
            cache, cache_pos=jnp.asarray(S + t, jnp.int32), kv_valid=kv_valid,
        )
        step_logits.append(lg[:, 0])

    # --- no-cache reference with per-row masks
    T = S + EXTRA
    valid = np.zeros((B, T, T), bool)
    valid[:, :S, :S] = True  # prefix-LM: prompt is bidirectional
    for i in range(S, T):
        valid[:, i, : i + 1] = True
    full_logits = _naive_gemma_forward(params, cfg, embeds, positions, jnp.asarray(valid))

    np.testing.assert_allclose(
        np.asarray(logits_prefill), np.asarray(full_logits[:, :S]), rtol=2e-4, atol=2e-4
    )
    for t in range(EXTRA):
        np.testing.assert_allclose(
            np.asarray(step_logits[t]), np.asarray(full_logits[:, S + t]),
            rtol=2e-4, atol=2e-4,
        )


def test_merge_embeddings_placement():
    cfg = CFG
    H = cfg.hidden_size
    img_tok, pad = cfg.image_token_index, cfg.pad_token_id
    ids = jnp.asarray([[img_tok, img_tok, 7, 8, pad]])
    text_embeds = jnp.ones((1, 5, H))
    image_embeds = jnp.stack(
        [jnp.full((H,), 10.0), jnp.full((H,), 20.0)]
    )[None]
    merged = paligemma.merge_embeddings(cfg, ids, text_embeds, image_embeds)
    scale = cfg.projection_dim**-0.5
    np.testing.assert_allclose(np.asarray(merged[0, 0]), 10.0 * scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(merged[0, 1]), 20.0 * scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(merged[0, 2]), 1.0)
    np.testing.assert_allclose(np.asarray(merged[0, 4]), 0.0)  # pad zeroed


def test_prefill_position_ids():
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    pos = paligemma.prefill_position_ids(mask)
    np.testing.assert_array_equal(np.asarray(pos), [[1, 2, 3, 1, 1], [1, 2, 3, 4, 5]])


def test_paligemma_prefill_decode_shapes():
    cfg = CFG
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg)
    B, MAX = 1, 16
    n_img = cfg.vision_config.num_patches
    ids = jnp.concatenate(
        [jnp.full((B, n_img), cfg.image_token_index, jnp.int32),
         jnp.asarray([[2, 10, 11]], jnp.int32)], axis=1,
    )
    S = ids.shape[1]
    mask = jnp.ones((B, S), jnp.int32)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 28, 28))
    cache = gemma.init_kv_cache(cfg.text_config, B, MAX)
    logits, cache = paligemma.prefill(params, cfg, pixels, ids, mask, cache)
    assert logits.shape == (B, S, cfg.vocab_size)

    kv_valid = jnp.zeros((B, MAX), bool).at[:, : S + 1].set(True)
    step_logits, cache = paligemma.decode_step(
        params, cfg, jnp.asarray([5], jnp.int32), cache,
        cache_pos=jnp.asarray(S, jnp.int32), kv_valid=kv_valid,
        position_ids=jnp.asarray([S + 1], jnp.int32),
    )
    assert step_logits.shape == (B, cfg.vocab_size)
