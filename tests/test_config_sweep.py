"""Property sweep: prefill+decode consistency across odd model geometries
(MQA/GQA/MHA, odd head dims, single layer, larger vocab) — catches shape
assumptions that the fixed tiny config would hide."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.core.config import GemmaConfig, PaliGemmaConfig, SiglipVisionConfig
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.models import paligemma


def _cfg(n_heads, n_kv, head_dim, layers, hidden):
    return PaliGemmaConfig(
        vision_config=SiglipVisionConfig(
            image_size=28, patch_size=14, hidden_size=24, intermediate_size=48,
            num_hidden_layers=1, num_attention_heads=2,
        ),
        text_config=GemmaConfig(
            vocab_size=256, hidden_size=hidden, intermediate_size=hidden * 2,
            num_hidden_layers=layers, num_attention_heads=n_heads,
            num_key_value_heads=n_kv, head_dim=head_dim,
        ),
        projection_dim=hidden, hidden_size=hidden,
        image_token_index=250, vocab_size=256,
    )


@pytest.mark.parametrize(
    "n_heads,n_kv,head_dim,layers,hidden",
    [
        (8, 1, 16, 1, 32),   # MQA, single layer
        (6, 2, 24, 2, 48),   # GQA group 3, odd head dim
        (4, 4, 16, 3, 64),   # MHA
        (2, 1, 64, 1, 40),   # wide heads, hidden != n_heads*head_dim
    ],
)
def test_generate_consistent_across_geometries(n_heads, n_kv, head_dim, layers, hidden):
    cfg = _cfg(n_heads, n_kv, head_dim, layers, hidden)
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n_img = cfg.vision_config.num_patches
    ids = np.concatenate(
        [np.full((1, n_img), cfg.image_token_index), rng.integers(3, 200, (1, 5))],
        axis=1,
    ).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    eng = PaliGemmaEngine(params, cfg, max_seq_len=32, use_flash=False)
    loop = eng.generate(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
                        max_new_tokens=5, eos_token_id=-1)
    fused = eng.generate_fused(jnp.asarray(pixels), jnp.asarray(ids),
                               jnp.asarray(mask), max_new_tokens=5, eos_token_id=-1)
    np.testing.assert_array_equal(loop, np.asarray(fused))
    assert ((loop >= 0) & (loop < cfg.vocab_size)).all()

    # flash path agrees at every geometry too (interpret mode)
    eng_f = PaliGemmaEngine(params, cfg, max_seq_len=32, use_flash=True)
    flash = eng_f.generate(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
                           max_new_tokens=5, eos_token_id=-1)
    np.testing.assert_array_equal(loop, flash)
