"""Whole-layer fused decode kernel (kernels/decode_layer.py) vs the XLA
decode path, end to end through gemma.forward, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import GemmaConfig
from paligemma_tpu.kernels import decode_layer
from paligemma_tpu.models import gemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving


def _setup(seed=0):
    cfg = GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=128,
    )
    full = {"lm": gemma.init_params(jax.random.PRNGKey(seed), cfg, jnp.bfloat16)}
    lm = quantize_lm_for_serving(full)["lm"]
    return cfg, lm


def _prefill_then_decode(cfg, lm, fused: bool, n_prefill=5, n_decode=4):
    """XLA prefill of n_prefill random tokens, then n_decode greedy decode
    steps via gemma.forward with/without the fused layer kernel."""
    B, S = 1, 32
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 250, (B, n_prefill)), jnp.int32)
    cache = gemma.init_kv_cache(cfg, B, S, jnp.bfloat16)
    valid = jnp.zeros((B, S), bool).at[:, :n_prefill].set(True)
    embeds = jnp.take(lm["embed"], ids, axis=0).astype(jnp.bfloat16)
    pos = jnp.arange(1, n_prefill + 1, dtype=jnp.int32)[None]
    logits, cache = gemma.forward(
        lm, cfg, embeds, pos, cache,
        cache_pos=jnp.asarray(0, jnp.int32), kv_valid=valid,
    )
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    layers = lm
    if fused:
        layers = dict(lm)
        layers["layers"] = decode_layer.repack_layers(lm["layers"])

    outs = []
    write = n_prefill
    p = n_prefill + 1
    for _ in range(n_decode):
        valid = valid.at[:, write].set(True)
        emb = jnp.take(layers["embed"], tok, axis=0)[:, None].astype(jnp.bfloat16)
        logits, cache = gemma.forward(
            layers, cfg, emb, jnp.full((B, 1), p, jnp.int32), cache,
            cache_pos=jnp.asarray(write, jnp.int32), kv_valid=valid,
            kv_bucket=16, fused_layer=fused,
        )
        outs.append(np.asarray(logits[:, 0], np.float32))
        tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        write += 1
        p += 1
    return outs


def test_fused_layer_matches_xla_decode():
    cfg, lm = _setup()
    ref = _prefill_then_decode(cfg, lm, fused=False)
    fus = _prefill_then_decode(cfg, lm, fused=True)
    for step, (a, b) in enumerate(zip(ref, fus)):
        denom = np.max(np.abs(a)) + 1e-9
        rel = np.max(np.abs(a - b)) / denom
        assert rel < 0.05, (step, rel)
        # greedy tokens identical at every step
        assert np.argmax(a) == np.argmax(b), step


def test_fused_layer_cache_writes_match():
    """The kernel's in-kernel cache row writes must equal the XLA path's
    dynamic_update_slice writes (both the VMEM window copy and the HBM
    write-back feed later steps)."""
    cfg, lm = _setup(seed=1)
    B, S, n_prefill = 1, 32, 3
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, 250, (B, n_prefill)), jnp.int32)

    def run(fused):
        cache = gemma.init_kv_cache(cfg, B, S, jnp.bfloat16)
        valid = jnp.zeros((B, S), bool).at[:, :n_prefill].set(True)
        embeds = jnp.take(lm["embed"], ids, axis=0).astype(jnp.bfloat16)
        pos = jnp.arange(1, n_prefill + 1, dtype=jnp.int32)[None]
        _, cache = gemma.forward(
            lm, cfg, embeds, pos, cache,
            cache_pos=jnp.asarray(0, jnp.int32), kv_valid=valid,
        )
        layers = lm
        if fused:
            layers = dict(lm)
            layers["layers"] = decode_layer.repack_layers(lm["layers"])
        valid = valid.at[:, n_prefill].set(True)
        emb = jnp.take(lm["embed"], jnp.asarray([7], jnp.int32), axis=0)[
            :, None
        ].astype(jnp.bfloat16)
        _, cache = gemma.forward(
            layers, cfg, emb, jnp.full((B, 1), n_prefill + 1, jnp.int32),
            cache, cache_pos=jnp.asarray(n_prefill, jnp.int32),
            kv_valid=valid, kv_bucket=16, fused_layer=fused,
        )
        return cache

    c_ref = run(False)
    c_fus = run(True)
    for name in ("k", "v"):
        a = np.asarray(c_ref[name], np.float32)
        b = np.asarray(c_fus[name], np.float32)
        np.testing.assert_allclose(
            a[:, :, : n_prefill + 1], b[:, :, : n_prefill + 1],
            rtol=0, atol=2e-2,
        )


def test_supported_gating():
    cfg, lm = _setup()
    packed = decode_layer.repack_layers(lm["layers"])
    assert decode_layer.supported(cfg, packed, batch=1)
    # head_dim not a lane multiple -> unsupported
    bad_cfg = GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=64, max_position_embeddings=128,
    )
    assert not decode_layer.supported(bad_cfg, packed, batch=1)
    assert decode_layer.supported(cfg, packed, batch=8)
    assert not decode_layer.supported(cfg, packed, batch=64)


def test_engine_fused_layer_end_to_end():
    """Engine-level: repack at init + fused decode produce the same greedy
    tokens as the XLA engine (forced on under CPU interpret)."""
    import numpy as np

    from paligemma_tpu.core.config import (
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
        assert eng.fused_layer == fused
        return np.asarray(
            eng.generate(
                jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
                max_new_tokens=6, do_sample=False,
            )
        )

    toks_ref = run(False)
    toks_fused = run(True)
    np.testing.assert_array_equal(toks_ref, toks_fused)


def test_engine_fused_layer_batched_padded():
    """B=2 rows with DIFFERENT prompt lengths (right padding -> holes in
    kv_valid): the batched fused kernel must equal the XLA path token for
    token, proving the per-row validity-mask window is honored."""
    from paligemma_tpu.core.config import (
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
    params = paligemma.init_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    q = quantize_lm_for_serving(params)

    rng = np.random.default_rng(2)
    n_img = cfg.vision_config.num_patches
    # row 0: 6 text tokens; row 1: 2 text tokens + 4 pads
    img = np.full((2, n_img), 250)
    txt = rng.integers(5, 240, (2, 6))
    ids = np.concatenate([img, txt], axis=1).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, -4:] = 0
    ids[1, -4:] = 0
    pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)

    def run(fused):
        eng = PaliGemmaEngine(
            q, cfg, max_seq_len=64, eos_token_id=1, fused_layer=fused,
            use_flash=False,
        )
        return np.asarray(
            eng.generate(
                jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
                max_new_tokens=5, do_sample=False, sync_every=5,
            )
        )

    np.testing.assert_array_equal(run(False), run(True))


def test_fused_layer_gemma_geometry_ratios():
    """head_dim=256, 8 q heads / 1 kv head (the real Gemma-2B ratios, at
    reduced hidden size): logits + greedy parity vs the XLA path."""
    cfg = GemmaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=1,
        head_dim=256, max_position_embeddings=128,
    )
    full = {"lm": gemma.init_params(jax.random.PRNGKey(4), cfg, jnp.bfloat16)}
    lm = quantize_lm_for_serving(full)["lm"]
    ref = _prefill_then_decode(cfg, lm, fused=False)
    fus = _prefill_then_decode(cfg, lm, fused=True)
    for step, (a, b) in enumerate(zip(ref, fus)):
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert rel < 0.05, (step, rel)
        assert np.argmax(a) == np.argmax(b), step
