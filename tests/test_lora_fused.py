"""In-kernel multi-LoRA for the fused decode tick: a bank served through
the grid-over-layers kernel (concat-basis operands + per-row block masks,
kernels/decode_layer repack_lora_bank_fused) must emit the same tokens as
the XLA bank tick (per-row gathers) for every base/adapter mix.
Interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.core.config import (
    GemmaConfig,
    PaliGemmaConfig,
    SiglipVisionConfig,
)
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
from paligemma_tpu.runtime.serving import Request, ServingEngine
from paligemma_tpu.train.lora import init_lora

CFG = PaliGemmaConfig(
    vision_config=SiglipVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
    ),
    text_config=GemmaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=128,
    ),
    projection_dim=128, hidden_size=128, image_token_index=510,
    vocab_size=512,
)


def _adapter(seed, rank=4):
    lora = init_lora(jax.random.PRNGKey(seed), CFG.text_config, rank=rank)
    layers = {}
    for i, (name, p) in enumerate(sorted(lora["layers"].items())):
        k = jax.random.fold_in(jax.random.PRNGKey(seed + 100), i)
        layers[name] = {
            **p, "b": jax.random.normal(k, p["b"].shape, p["b"].dtype) * 0.05,
        }
    return {"layers": layers}


def _req(rid, seed, n_txt, max_new, lora=None):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((n_img,), CFG.image_token_index),
         rng.integers(3, 100, (n_txt,))]
    ).astype(np.int32)
    pixels = rng.normal(size=(3, 28, 28)).astype(np.float32)
    return Request(
        request_id=rid, input_ids=ids, pixel_values=pixels,
        max_new_tokens=max_new, do_sample=False, eos_token_id=-1, lora=lora,
    )


@pytest.fixture(scope="module")
def setup():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_lm_for_serving(params)
    adapters = {"x": _adapter(1), "y": _adapter(2)}
    return params, qparams, adapters


def _run(params, qparams, adapters, reqs, fused):
    eng = ServingEngine(
        params, CFG, max_slots=4, max_seq_len=64, use_flash=False,
        decode_params=qparams, fused_decode=fused, lora_bank=adapters,
        sync_every=2,
    )
    if fused:
        assert eng.fused_decode, "fused tick must survive a lora bank"
        assert eng._lora_fused_pack is not None
    for r in reqs:
        eng.submit(r)
    eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in reqs}


def test_fused_bank_matches_xla_bank_mixed_batch(setup):
    params, qparams, adapters = setup
    mk = lambda: [
        _req(0, 1, 6, 8, lora=None), _req(1, 2, 5, 8, lora="x"),
        _req(2, 3, 7, 8, lora="y"), _req(3, 4, 4, 8, lora="x"),
    ]
    got = _run(params, qparams, adapters, mk(), fused=True)
    want = _run(params, qparams, adapters, mk(), fused=False)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid], err_msg=str(rid))


def test_fused_bank_adapters_change_tokens(setup):
    params, qparams, adapters = setup
    base = _run(params, qparams, adapters, [_req(0, 1, 6, 10)], fused=True)
    wx = _run(params, qparams, adapters, [_req(0, 1, 6, 10, lora="x")],
              fused=True)
    assert list(base[0]) != list(wx[0])


def _run_paged(params, qparams, adapters, reqs, kernel):
    from paligemma_tpu.runtime.serving_paged import PagedServingEngine

    eng = PagedServingEngine(
        params, CFG, max_slots=4, max_seq_len=64, page_size=16, n_pages=24,
        use_flash=False, decode_params=qparams, paged_kernel=kernel,
        lora_bank=adapters, sync_every=2,
    )
    if kernel == "fused":
        assert eng.paged_kernel == "fused", eng.paged_kernel
        assert eng._lora_fused_pack is not None
    for r in reqs:
        eng.submit(r)
    eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in reqs}


def test_paged_fused_bank_matches_page_walk(setup):
    """The paged fused tick with in-kernel adapters equals the XLA
    page-walk bank tick row for row (mixed base/x/y batch)."""
    params, qparams, adapters = setup
    mk = lambda: [
        _req(0, 1, 6, 8, lora=None), _req(1, 2, 5, 8, lora="x"),
        _req(2, 3, 7, 8, lora="y"), _req(3, 4, 4, 8, lora="x"),
    ]
    got = _run_paged(params, qparams, adapters, mk(), "fused")
    want = _run_paged(params, qparams, adapters, mk(), "xla")
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid], err_msg=str(rid))


def test_fused_pack_shapes():
    from paligemma_tpu.kernels import decode_layer
    from paligemma_tpu.train.lora import stack_lora_bank

    bank = stack_lora_bank([_adapter(1, rank=4), _adapter(2, rank=4)])
    tc = CFG.text_config
    pack = decode_layer.repack_lora_bank_fused(
        bank["layers"], nc=2, bs=256, n_heads=tc.num_attention_heads,
        head_dim=tc.head_dim, hidden=tc.hidden_size,
    )
    G = pack["o_b"].shape[1]
    assert G % 8 == 0 and G >= 3 * 4  # (N+1)*r, sublane-padded
    nq = tc.num_attention_heads * tc.head_dim
    assert pack["qkv_a"].shape == (2, tc.hidden_size, 3 * G)
    assert pack["qkv_b"].shape == (2, 3 * G, nq + 2 * tc.head_dim)
    assert pack["gate_b"].shape == (2, 2, G, 256)
    assert pack["down_a"].shape == (2, 2, 256, G)
    # block-diagonal: q rows never write k/v columns
    qb = np.asarray(pack["qkv_b"])
    assert np.all(qb[:, :G, nq:] == 0)
    assert np.all(qb[:, G:, :nq] == 0)
