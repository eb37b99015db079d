"""Tensor-parallel fused decode (kernels/decode_layer_tp.py) vs the XLA
decode path, on the 8-virtual-device CPU mesh, interpret-mode kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.core.config import GemmaConfig
from paligemma_tpu.core.mesh import make_mesh
from paligemma_tpu.kernels import decode_layer_tp
from paligemma_tpu.models import gemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving


def _setup(seed=0, vocab=256):
    cfg = GemmaConfig(
        vocab_size=vocab, hidden_size=256, intermediate_size=2048,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=1,
        head_dim=256, max_position_embeddings=128,
    )
    full = {"lm": gemma.init_params(jax.random.PRNGKey(seed), cfg, jnp.bfloat16)}
    lm = quantize_lm_for_serving(full)["lm"]
    return cfg, lm


def _xla_greedy_decode(cfg, lm, ids, n_decode, S=64):
    """XLA prefill + greedy decode; returns the decoded token ids."""
    B = ids.shape[0]
    n_prefill = ids.shape[1]
    cache = gemma.init_kv_cache(cfg, B, S, jnp.bfloat16)
    valid = jnp.zeros((B, S), bool).at[:, :n_prefill].set(True)
    embeds = jnp.take(lm["embed"], ids, axis=0).astype(jnp.bfloat16)
    pos = jnp.broadcast_to(
        jnp.arange(1, n_prefill + 1, dtype=jnp.int32)[None], ids.shape
    )
    logits, cache = gemma.forward(
        lm, cfg, embeds, pos, cache,
        cache_pos=jnp.asarray(0, jnp.int32), kv_valid=valid,
    )
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    toks = [np.asarray(tok)]
    write, p = n_prefill, n_prefill + 1
    for _ in range(n_decode):
        valid = valid.at[:, write].set(True)
        emb = jnp.take(lm["embed"], tok, axis=0)[:, None].astype(jnp.bfloat16)
        logits, cache = gemma.forward(
            lm, cfg, emb, jnp.full((B, 1), p, jnp.int32), cache,
            cache_pos=jnp.asarray(write, jnp.int32), kv_valid=valid,
            kv_bucket=64,
        )
        tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        toks.append(np.asarray(tok))
        write += 1
        p += 1
    return np.stack(toks, 1), cache  # (B, n_decode+1)


def _tp_greedy_decode(cfg, lm, ids, n_decode, mesh, S=64):
    B = ids.shape[0]
    n_prefill = ids.shape[1]
    cache = gemma.init_kv_cache(cfg, B, S, jnp.bfloat16)
    valid = jnp.zeros((B, S), bool).at[:, :n_prefill].set(True)
    embeds = jnp.take(lm["embed"], ids, axis=0).astype(jnp.bfloat16)
    pos = jnp.broadcast_to(
        jnp.arange(1, n_prefill + 1, dtype=jnp.int32)[None], ids.shape
    )
    logits, cache = gemma.forward(
        lm, cfg, embeds, pos, cache,
        cache_pos=jnp.asarray(0, jnp.int32), kv_valid=valid,
    )
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    packed, specs = decode_layer_tp.repack_for_tp(lm, cfg, mesh)
    toks = [np.asarray(tok)]
    write, p = n_prefill, n_prefill + 1
    for _ in range(n_decode):
        valid = valid.at[:, write].set(True)
        tok, cache = decode_layer_tp.decode_step_greedy_tp(
            packed, specs, cfg, tok, cache,
            cache_pos=jnp.asarray(write, jnp.int32), kv_valid=valid,
            position_ids=jnp.full((B,), p, jnp.int32),
            kv_bucket=64, mesh=mesh,
        )
        toks.append(np.asarray(tok))
        write += 1
        p += 1
    return np.stack(toks, 1), cache


@pytest.mark.parametrize("dp,tp", [(1, 2), (1, 4), (2, 2), (1, 8)])
def test_tp_fused_decode_matches_xla(dp, tp):
    cfg, lm = _setup()
    rng = np.random.default_rng(0)
    B = 2 * dp
    ids = jnp.asarray(rng.integers(5, 250, (B, 5)), jnp.int32)
    want, _ = _xla_greedy_decode(cfg, lm, ids, n_decode=4)
    mesh = make_mesh(dp, tp)
    got, _ = _tp_greedy_decode(cfg, lm, ids, n_decode=4, mesh=mesh)
    np.testing.assert_array_equal(want, got)


def test_tp_fused_decode_cache_matches_xla():
    cfg, lm = _setup(seed=1)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, 250, (2, 4)), jnp.int32)
    _, c_ref = _xla_greedy_decode(cfg, lm, ids, n_decode=2)
    mesh = make_mesh(1, 4)
    _, c_tp = _tp_greedy_decode(cfg, lm, ids, n_decode=2, mesh=mesh)
    for name in ("k", "v"):
        a = np.asarray(c_ref[name], np.float32)[:, :, :7]
        b = np.asarray(jax.device_get(c_tp[name]), np.float32)[:, :, :7]
        # bf16 cache entries; the sharded qkv matmul rounds differently by
        # a few ulp (tokens above are the exact contract)
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-2)


def test_tp_fused_decode_padded_vocab_shard():
    """Vocab 272 over 2 shards -> 136 per shard, padded to 256 inside
    repack_head: padding columns must never win the argmax."""
    cfg, lm = _setup(seed=2, vocab=272)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(5, 260, (1, 4)), jnp.int32)
    want, _ = _xla_greedy_decode(cfg, lm, ids, n_decode=3)
    mesh = make_mesh(1, 2)
    got, _ = _tp_greedy_decode(cfg, lm, ids, n_decode=3, mesh=mesh)
    np.testing.assert_array_equal(want, got)


def test_supported_gating():
    cfg, lm = _setup()
    layers = lm["layers"]
    assert decode_layer_tp.supported(cfg, make_mesh(1, 2), layers, batch=2)
    assert decode_layer_tp.supported(cfg, make_mesh(2, 2), layers, batch=2)
    assert not decode_layer_tp.supported(cfg, None, layers, batch=1)
    # batch not divisible by data axis
    assert not decode_layer_tp.supported(cfg, make_mesh(2, 2), layers, batch=3)
    # head count not divisible by model axis
    bad = GemmaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=2048,
        num_hidden_layers=2, num_attention_heads=6, num_key_value_heads=1,
        head_dim=256, max_position_embeddings=128,
    )
    assert not decode_layer_tp.supported(bad, make_mesh(1, 4), layers, batch=1)


def _pg_cfg(vocab=256):
    from paligemma_tpu.core.config import PaliGemmaConfig, SiglipVisionConfig

    return PaliGemmaConfig(
        vision_config=SiglipVisionConfig(
            image_size=28, patch_size=14, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, projection_dim=256,
        ),
        text_config=GemmaConfig(
            vocab_size=vocab, hidden_size=256, intermediate_size=2048,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=1, head_dim=256,
            max_position_embeddings=256,
        ),
        projection_dim=256, hidden_size=256, image_token_index=250,
        vocab_size=vocab,
    )


def test_engine_tp_fused_matches_xla():
    """Engine-level: a TP mesh engine with the fused path produces the same
    greedy tokens (chunked decode) as the XLA engine."""
    from paligemma_tpu.models import paligemma
    from paligemma_tpu.runtime.engine import PaliGemmaEngine

    cfg = _pg_cfg()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    q = quantize_lm_for_serving(params)
    rng = np.random.default_rng(0)
    n_img = cfg.vision_config.num_patches
    ids = np.concatenate(
        [np.full((1, n_img), 250), rng.integers(5, 240, (1, 4))], axis=1
    ).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    def run(mesh, fused):
        eng = PaliGemmaEngine(
            q, cfg, max_seq_len=64, eos_token_id=1, fused_layer=fused,
            use_flash=False, mesh=mesh,
        )
        if fused and mesh is not None:
            assert eng._tp_packed is not None
        return np.asarray(
            eng.generate(
                jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
                max_new_tokens=6, do_sample=False, sync_every=3,
            )
        )

    want = run(None, False)
    got = run(make_mesh(1, 2), True)
    np.testing.assert_array_equal(want, got)


def test_serving_tp_fused_matches_plain():
    """The BASELINE sharded-serving config on the fused TP tick: same
    tokens as the unsharded XLA serving engine."""
    from paligemma_tpu.models import paligemma
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
    from paligemma_tpu.runtime.serving import Request, ServingEngine

    cfg = _pg_cfg()
    params = paligemma.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    q = quantize_lm_for_serving(params)
    rng = np.random.default_rng(1)
    n_img = cfg.vision_config.num_patches

    def req(rid, seed, n_txt, n_new):
        r = np.random.default_rng(seed)
        ids = np.concatenate(
            [np.full((n_img,), 250), r.integers(3, 240, (n_txt,))]
        ).astype(np.int32)
        return Request(
            request_id=rid, input_ids=ids,
            pixel_values=r.normal(size=(3, 28, 28)).astype(np.float32),
            max_new_tokens=n_new, do_sample=False, eos_token_id=-1,
        )

    plain = ServingEngine(params, cfg, max_slots=2, max_seq_len=32,
                          use_flash=False, decode_params=q,
                          fused_decode=False)
    for i in range(3):
        plain.submit(req(i, i + 10, 3 + i, 3))
    want = {r.request_id: list(r.tokens) for r in plain.run_to_completion()}

    mesh = make_mesh(1, 2)
    tp = ServingEngine(params, cfg, max_slots=2, max_seq_len=32,
                       use_flash=False, decode_params=q, mesh=mesh,
                       fused_decode=True)
    assert tp.fused_decode and tp._tp_packed is not None
    for i in range(3):
        tp.submit(req(i, i + 10, 3 + i, 3))
    got = {r.request_id: list(r.tokens) for r in tp.run_to_completion()}
    assert got == want
