"""Flash-attention model integration: flash and XLA paths must agree."""

import numpy as np

import jax
import jax.numpy as jnp

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import gemma, paligemma, siglip

CFG = tiny_test_config()


def _inputs(batch=2):
    rng = np.random.default_rng(0)
    n_img = CFG.vision_config.num_patches
    s_txt = 6
    s = n_img + s_txt
    ids = np.concatenate(
        [np.full((batch, n_img), CFG.image_token_index),
         rng.integers(3, 100, (batch, s_txt))], axis=1,
    ).astype(np.int32)
    mask = np.ones((batch, s), np.int32)
    mask[1, -2:] = 0  # right padding on row 1
    ids[1, -2:] = CFG.pad_token_id
    pixels = rng.normal(size=(batch, 3, 28, 28)).astype(np.float32)
    return ids, mask, pixels


def test_prefill_flash_matches_xla():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    ids, mask, pixels = _inputs()
    cache = gemma.init_kv_cache(CFG.text_config, ids.shape[0], 32)
    lo_x, cache_x = paligemma.prefill(
        params, CFG, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
        cache, use_flash=False,
    )
    cache2 = gemma.init_kv_cache(CFG.text_config, ids.shape[0], 32)
    lo_f, cache_f = paligemma.prefill(
        params, CFG, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
        cache2, use_flash=True,
    )
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(lo_x)[valid], np.asarray(lo_f)[valid], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_x["k"]), np.asarray(cache_f["k"]), atol=1e-5
    )


def test_siglip_flash_matches_xla():
    params = siglip.init_params(jax.random.PRNGKey(1), CFG.vision_config)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 28, 28))
    a = siglip.encode(params, CFG.vision_config, x, use_flash=False)
    b = siglip.encode(params, CFG.vision_config, x, use_flash=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_forward_train_flash_matches_xla():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    ids, mask, pixels = _inputs()
    n_img = CFG.vision_config.num_patches
    ttype = np.zeros_like(ids)
    ttype[:, n_img + 3:] = 1  # last tokens are suffix (causal)
    ttype[mask == 0] = 1
    args = (jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(ttype))
    lo_x = paligemma.forward_train(params, CFG, *args, remat=False, use_flash=False)
    lo_f = paligemma.forward_train(params, CFG, *args, remat=False, use_flash=True)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(lo_x)[valid], np.asarray(lo_f)[valid], rtol=2e-4, atol=2e-4
    )
