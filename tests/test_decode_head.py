"""Fused LM-head + running-argmax kernel (kernels/decode_head.py),
interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.kernels.decode_head import (
    head_argmax_fused,
    pick_block,
    reference_head_argmax,
    repack_head,
)


def _make(K=128, V=1024, seed=0, scale=0.05):
    kw, ky = jax.random.split(jax.random.PRNGKey(seed))
    w = jax.random.normal(kw, (K, V), jnp.float32) * scale
    absmax = jnp.max(jnp.abs(w), axis=0)
    s = jnp.maximum(absmax, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    y = (jax.random.normal(ky, (1, 1, K), jnp.float32) * 0.3).astype(
        jnp.bfloat16
    )
    return {"w8": w8, "s": s}, y


@pytest.mark.parametrize("bs", [256, 512, 1024])
def test_matches_reference_argmax(bs):
    head, y = _make()
    packed = repack_head(head, bs=bs)
    tok = head_argmax_fused(y, packed, interpret=True)
    ref = reference_head_argmax(y, head)
    assert int(tok[0]) == int(ref[0]), (bs, int(tok[0]), int(ref[0]))


def test_many_seeds_agree():
    for seed in range(8):
        head, y = _make(seed=seed)
        packed = repack_head(head, bs=256)
        tok = head_argmax_fused(y, packed, interpret=True)
        ref = reference_head_argmax(y, head)
        assert int(tok[0]) == int(ref[0]), seed


def test_tie_breaks_to_first_index():
    """Two identical columns -> jnp.argmax picks the first; the kernel's
    min-index-within-chunk + strictly-greater-across-chunks must agree,
    including when the duplicates span different chunks."""
    K, V = 128, 512
    head, y = _make(K=K, V=V, seed=3)
    w8 = np.asarray(head["w8"]).copy()
    s = np.asarray(head["s"]).copy()
    # clone column 70 into columns 300 and 450 (same scale -> same logit)
    for dup in (300, 450):
        w8[:, dup] = w8[:, 70]
        s[dup] = s[70]
    # force column 70 to be the global max: scale its logit way up
    s[70] *= 100.0
    s[300] *= 100.0  # duplicate of the max in a LATER chunk
    s[450] *= 100.0
    head2 = {"w8": jnp.asarray(w8), "s": jnp.asarray(s)}
    packed = repack_head(head2, bs=128)
    tok = head_argmax_fused(y, packed, interpret=True)
    ref = reference_head_argmax(y, head2)
    assert int(tok[0]) == int(ref[0]) == 70 or int(tok[0]) == int(ref[0])


def test_pick_block_gemma_vocab():
    # 257152 = 128 * 7^2 * 41 -> largest lane-aligned divisor <= 8192
    assert pick_block(257152) == 6272
    assert 257152 % pick_block(257152) == 0


def test_engine_greedy_fused_head_end_to_end():
    """Engine chunked greedy decode with the token-carry fast path equals
    the XLA logits path token for token."""
    from paligemma_tpu.core.config import (
        GemmaConfig,
        PaliGemmaConfig,
        SiglipVisionConfig,
    )
    from paligemma_tpu.models import paligemma
    from paligemma_tpu.runtime.engine import PaliGemmaEngine
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    cfg = PaliGemmaConfig(
        vision_config=SiglipVisionConfig(
            image_size=28, patch_size=14, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, projection_dim=128,
        ),
        text_config=GemmaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=1, head_dim=128,
            max_position_embeddings=256,
        ),
        projection_dim=128, hidden_size=128, image_token_index=250,
        vocab_size=256,
    )
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    q = quantize_lm_for_serving(params)

    rng = np.random.default_rng(0)
    n_img = cfg.vision_config.num_patches
    ids = np.concatenate(
        [np.full((1, n_img), 250), rng.integers(5, 240, (1, 4))], axis=1
    ).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    def run(fused):
        eng = PaliGemmaEngine(
            q, cfg, max_seq_len=64, eos_token_id=1, fused_layer=fused,
            use_flash=False,
        )
        assert eng._greedy_head_fused == fused
        return np.asarray(
            eng.generate(
                jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
                max_new_tokens=6, do_sample=False, sync_every=3,
            )
        )

    toks_ref = run(False)
    toks_fused = run(True)
    np.testing.assert_array_equal(toks_ref, toks_fused)
