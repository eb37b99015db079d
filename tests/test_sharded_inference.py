"""Sharded inference: TP / DP+TP engine must reproduce single-device tokens
(8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.core import mesh as mesh_lib
from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine

CFG = tiny_test_config()


def _inputs(batch=2):
    rng = np.random.default_rng(0)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((batch, n_img), CFG.image_token_index),
         rng.integers(3, 100, (batch, 6))], axis=1,
    ).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(batch, 3, 28, 28)).astype(np.float32)
    return jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.parametrize("data,model", [(1, 4), (2, 4), (8, 1)])
def test_sharded_generate_matches_unsharded(data, model):
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    pixels, ids, mask = _inputs(batch=max(2, data))

    plain = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=False)
    want = plain.generate(pixels, ids, mask, max_new_tokens=6, eos_token_id=-1)

    mesh = mesh_lib.make_mesh(data=data, model=model)
    sharded = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=False,
                              mesh=mesh)
    got = sharded.generate(pixels, ids, mask, max_new_tokens=6, eos_token_id=-1)
    np.testing.assert_array_equal(got, want)


def test_sharded_int8_generate():
    """int8-quantized serving over a TP mesh (the v5e-8 serving target)."""
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_lm_for_serving(params)
    pixels, ids, mask = _inputs()

    plain = PaliGemmaEngine(qparams, CFG, max_seq_len=32, use_flash=False)
    want = plain.generate(pixels, ids, mask, max_new_tokens=4, eos_token_id=-1)

    mesh = mesh_lib.make_mesh(data=2, model=1)
    sharded = PaliGemmaEngine(qparams, CFG, max_seq_len=32, use_flash=False,
                              mesh=mesh)
    got = sharded.generate(pixels, ids, mask, max_new_tokens=4, eos_token_id=-1)
    np.testing.assert_array_equal(got, want)


def test_sharded_flash_generate_matches_unsharded():
    """Flash attention under a TP mesh (shard_map, heads on "model")."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    pixels, ids, mask = _inputs(batch=2)

    plain = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=True)
    want = plain.generate(pixels, ids, mask, max_new_tokens=5, eos_token_id=-1)

    # tiny cfg: 4 LM q heads / 2 kv heads, 4 vision heads -> model axis of 2
    mesh = mesh_lib.make_mesh(data=2, model=2)
    sharded = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=True,
                              mesh=mesh)
    assert sharded.use_flash  # supported geometry must not silently fall back
    got = sharded.generate(pixels, ids, mask, max_new_tokens=5, eos_token_id=-1)
    np.testing.assert_array_equal(got, want)
