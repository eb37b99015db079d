"""Golden parity at REAL PaliGemma geometry (scaled in depth only).

The tiny-config parity tests (test_hf_parity.py, VOCAB=128) prove the
conventions; this module proves them at the reference checkpoint's actual
shapes — full 257,152-token vocab, hidden 2048, MQA (1 KV head), head_dim
256, GeGLU 16384, SigLIP-so400m width (1152/16 heads/4304), 224px -> 256
image tokens (ref: modeling_paligemma.py:21-23 + config.json of
google/paligemma-3b-pt-224) — with depth cut to 2 layers per tower so the
~780M-param model runs on the CPU backend. Real weights cannot be
downloaded in this environment (docs/ROADMAP.md); random weights at real
geometry exercise every shape/convention the real checkpoint would.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from paligemma_tpu.checkpoints.hf_loader import params_from_state_dict
from paligemma_tpu.core.config import PaliGemmaConfig
from paligemma_tpu.runtime.engine import PaliGemmaEngine

VOCAB = 257152
IMG_TOK = 257151  # one of the <image> slots at the top of the real vocab
PAD, EOS, BOS = 0, 1, 2
N_IMG = 256  # (224/14)^2


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.PaliGemmaConfig(
        vision_config=dict(
            image_size=224, patch_size=14, hidden_size=1152,
            intermediate_size=4304, num_hidden_layers=2,
            num_attention_heads=16, projection_dim=2048,
            vision_use_head=False,
        ),
        text_config=dict(
            vocab_size=VOCAB, hidden_size=2048, intermediate_size=16384,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=1, head_dim=256, model_type="gemma",
            bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        ),
        projection_dim=2048, image_token_index=IMG_TOK, pad_token_id=PAD,
        vocab_size=VOCAB,
    )
    torch.manual_seed(0)
    return transformers.PaliGemmaForConditionalGeneration(cfg).eval().float()


@pytest.fixture(scope="module")
def our_setup(hf_model):
    hf_cfg = hf_model.config
    cfg = PaliGemmaConfig.from_hf_dict(
        {
            "vision_config": hf_cfg.vision_config.to_dict(),
            "text_config": hf_cfg.text_config.to_dict(),
            "projection_dim": hf_cfg.projection_dim,
            "image_token_index": hf_cfg.image_token_index,
            "pad_token_id": PAD,
            "vocab_size": hf_cfg.text_config.vocab_size,
            "hidden_size": hf_cfg.text_config.hidden_size,
        }
    )
    params = params_from_state_dict(cfg, hf_model.state_dict(), jnp.float32)
    engine = PaliGemmaEngine(params, cfg, max_seq_len=512, eos_token_id=EOS,
                             use_flash=False)
    return engine, cfg, params


def _inputs():
    rng = np.random.default_rng(42)
    extra = (BOS, 1017, 223, 5042, 99, 3, 8)
    ids = np.concatenate(
        [np.full((1, N_IMG), IMG_TOK), np.asarray([extra])], axis=1
    ).astype(np.int64)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    return ids, mask, pixels


def test_midsize_greedy_token_parity(hf_model, our_setup):
    """The reference's functional baseline at real shapes: greedy decode must
    match HF token-for-token (ref: launch_inference.sh + inference.py:29-87)."""
    engine, cfg, _ = our_setup
    ids, mask, pixels = _inputs()
    n_new = 12

    with torch.no_grad():
        hf_tokens = hf_model.generate(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
            attention_mask=torch.tensor(mask),
            max_new_tokens=n_new, do_sample=False, eos_token_id=None,
        )
    hf_new = hf_tokens[0, ids.shape[1]:].numpy()

    ours = engine.generate(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        max_new_tokens=n_new, do_sample=False, eos_token_id=-1,
        sync_every=4,  # exercise the chunked production path at real shapes
    )
    np.testing.assert_array_equal(ours[0], hf_new)


def test_midsize_int8_token_agreement(our_setup):
    """int8 weight-only serving must reproduce the fp32 greedy tokens exactly
    at real geometry (the on-chip 96/96 spot check from docs/PERFORMANCE.md,
    asserted as a test)."""
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    engine, cfg, params = our_setup
    qparams = quantize_lm_for_serving(params)
    qengine = PaliGemmaEngine(qparams, cfg, max_seq_len=512,
                              eos_token_id=EOS, use_flash=False)
    ids, mask, pixels = _inputs()
    n_new = 12
    want = engine.generate(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        max_new_tokens=n_new, do_sample=False, eos_token_id=-1,
    )
    got = qengine.generate(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        max_new_tokens=n_new, do_sample=False, eos_token_id=-1,
    )
    np.testing.assert_array_equal(got, want)
