"""Merged-head fused decode: the grid-over-layers kernel with the final
norm + int8 head + running argmax folded in (kernels/decode_layer.py,
``head_blk=``) must emit tokens bit-identical to the two-kernel split
(layers kernel -> XLA final norm -> decode_head kernel), which is itself
pinned to the XLA logits path. Interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.core.config import (
    GemmaConfig,
    PaliGemmaConfig,
    SiglipVisionConfig,
)
from paligemma_tpu.kernels import decode_layer
from paligemma_tpu.models import gemma, paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving


def _cfg(vocab=384):
    return PaliGemmaConfig(
        vision_config=SiglipVisionConfig(
            image_size=28, patch_size=14, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, projection_dim=128,
        ),
        text_config=GemmaConfig(
            vocab_size=vocab, hidden_size=128, intermediate_size=512,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=1, head_dim=128,
            max_position_embeddings=256,
        ),
        projection_dim=128, hidden_size=128, image_token_index=vocab - 6,
        vocab_size=vocab,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = paligemma.init_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    q = quantize_lm_for_serving(params)
    from paligemma_tpu.kernels import decode_head as _dh
    from paligemma_tpu.kernels import decode_layer as _dl

    lm = dict(q["lm"])
    lm["layers"] = _dl.repack_layers(lm["layers"])
    lm["head_q"] = _dh.repack_head(lm["head_q"])
    q2 = dict(q)
    q2["lm"] = lm
    return cfg, q2


def _prep_cache(cfg, b, max_seq, n_prefill, seed=0):
    """Prefill a tiny random context so decode attends over real KV."""
    rng = np.random.default_rng(seed)
    cache = gemma.init_kv_cache(cfg.text_config, b, max_seq, jnp.float32)
    kv_valid = np.zeros((b, max_seq), bool)
    kv_valid[:, :n_prefill] = True
    k = cache["k"]
    cache = {
        "k": jnp.asarray(rng.normal(size=k.shape), jnp.float32) * 0.1,
        "v": jnp.asarray(rng.normal(size=k.shape), jnp.float32) * 0.1,
    }
    # slots beyond n_prefill hold garbage; the validity mask hides them
    return cache, jnp.asarray(kv_valid)


def _step(cfg, params, token, cache, pos, kv_valid, pos_ids, monkey=None):
    return paligemma.decode_step_greedy(
        params, cfg, token, cache, cache_pos=pos,
        kv_valid=kv_valid, position_ids=pos_ids, kv_bucket=64,
    )


@pytest.mark.parametrize("b", [1, 3])
def test_merged_matches_split(setup, b, monkeypatch):
    cfg, params = setup
    cache, kv_valid0 = _prep_cache(cfg, b, 128, 10, seed=b)
    token = jnp.asarray(np.arange(b) + 5, jnp.int32)
    pos = jnp.full((b,), 10, jnp.int32) + jnp.arange(b)  # per-row positions
    kv_valid = kv_valid0
    for r in range(b):  # mark each row's write slot valid
        kv_valid = kv_valid.at[r, int(pos[r])].set(True)
    pos_ids = pos + 1

    assert decode_layer.merged_head_fits(
        params["lm"]["layers"], params["lm"]["head_q"], b, 64, 128,
        cache_bytes=4,
    )
    tok_merged, cache_m = _step(
        cfg, params, token, jax.tree.map(jnp.copy, cache), pos, kv_valid,
        pos_ids,
    )

    monkeypatch.setattr(decode_layer, "merged_head_fits",
                        lambda *a, **k: False)
    tok_split, cache_s = _step(
        cfg, params, token, jax.tree.map(jnp.copy, cache), pos, kv_valid,
        pos_ids,
    )
    np.testing.assert_array_equal(np.asarray(tok_merged),
                                  np.asarray(tok_split))
    for a, bb in zip(jax.tree.leaves(cache_m), jax.tree.leaves(cache_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb))


def test_merged_multi_step_sequence(setup):
    """A short greedy rollout through the merged path equals the XLA
    (fused_layer=False) rollout token for token."""
    cfg, params = setup

    def rollout(fused):
        cache, kv_valid = _prep_cache(cfg, 1, 128, 8, seed=42)
        token = jnp.asarray([11], jnp.int32)
        pos = jnp.asarray([8], jnp.int32)
        toks = []
        for i in range(6):
            kv_valid = kv_valid.at[0, int(pos[0])].set(True)
            token, cache = paligemma.decode_step_greedy(
                params, cfg, token, cache, cache_pos=pos[0],
                kv_valid=kv_valid, position_ids=pos + 1, kv_bucket=64,
                fused_layer=fused,
            )
            toks.append(int(token[0]))
            pos = pos + 1
        return toks

    assert rollout(True) == rollout(False)


def test_merged_vocab_padding_never_wins(monkeypatch):
    """A vocab width with no lane-aligned divisor forces padded head
    chunks; padding columns must not win the argmax through the merged
    path either."""
    cfg = _cfg(vocab=392)  # 392 = 8*49 -> no multiple of 128 divides it
    params = paligemma.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    q = quantize_lm_for_serving(params)
    from paligemma_tpu.kernels import decode_head as _dh
    from paligemma_tpu.kernels import decode_layer as _dl

    lm = dict(q["lm"])
    lm["layers"] = _dl.repack_layers(lm["layers"])
    lm["head_q"] = _dh.repack_head(lm["head_q"])
    q = dict(q)
    q["lm"] = lm
    nch, _, bsh = lm["head_q"]["w8_blk"].shape
    assert nch * bsh > 392  # really padded

    cache, kv_valid = _prep_cache(cfg, 1, 64, 6, seed=9)
    kv_valid = kv_valid.at[0, 6].set(True)
    tok, _ = paligemma.decode_step_greedy(
        q, cfg, jnp.asarray([3], jnp.int32), cache, cache_pos=6,
        kv_valid=kv_valid, position_ids=jnp.asarray([7], jnp.int32),
        kv_bucket=64,
    )
    assert 0 <= int(tok[0]) < 392
    monkeypatch.setattr(decode_layer, "merged_head_fits",
                        lambda *a, **k: False)
    tok_split, _ = paligemma.decode_step_greedy(
        q, cfg, jnp.asarray([3], jnp.int32),
        jax.tree.map(jnp.copy, cache), cache_pos=6,
        kv_valid=kv_valid, position_ids=jnp.asarray([7], jnp.int32),
        kv_bucket=64,
    )
    assert int(tok[0]) == int(tok_split[0])
