"""Golden parity vs HF transformers' PaliGemma on a tiny random-weight config.

This is the framework's equivalent of the reference's functional baseline
(greedy caption parity, ref: launch_inference.sh + inference.py): identical
weights are loaded into both implementations and logits + greedy decode
tokens must agree.
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

VOCAB = 128
IMG_TOK = 120
PAD = 0
BOS = 2
EOS = 1


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.PaliGemmaConfig(
        vision_config=dict(
            image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, projection_dim=48,
            vision_use_head=False,
        ),
        text_config=dict(
            vocab_size=VOCAB, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, model_type="gemma", bos_token_id=BOS, eos_token_id=EOS,
            pad_token_id=PAD,
        ),
        projection_dim=48, image_token_index=IMG_TOK, pad_token_id=PAD,
        vocab_size=VOCAB,
    )
    torch.manual_seed(0)
    model = transformers.PaliGemmaForConditionalGeneration(cfg)
    model = model.eval().float()
    return model


@pytest.fixture(scope="module")
def our_setup(hf_model):
    hf_cfg = hf_model.config
    cfg = PaliGemmaConfig.from_hf_dict(
        {
            "vision_config": hf_cfg.vision_config.to_dict(),
            "text_config": hf_cfg.text_config.to_dict(),
            "projection_dim": hf_cfg.projection_dim,
            "image_token_index": hf_cfg.image_token_index,
            "pad_token_id": 0,
            "vocab_size": hf_cfg.text_config.vocab_size,
            "hidden_size": hf_cfg.text_config.hidden_size,
        }
    )
    params = params_from_state_dict(cfg, hf_model.state_dict(), jnp.float32)
    engine = PaliGemmaEngine(params, cfg, max_seq_len=64, eos_token_id=EOS)
    return engine, cfg


def _inputs(batch=1, extra_ids=(BOS, 17, 23, 42, 9)):
    n_img = 4  # (28/14)^2
    rng = np.random.default_rng(42)
    ids = np.concatenate(
        [np.full((batch, n_img), IMG_TOK), np.tile(extra_ids, (batch, 1))], axis=1
    ).astype(np.int64)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(batch, 3, 28, 28)).astype(np.float32)
    return ids, mask, pixels


def test_prefill_logits_parity(hf_model, our_setup):
    engine, cfg = our_setup
    ids, mask, pixels = _inputs()

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
            attention_mask=torch.tensor(mask),
        )
    hf_logits = hf_out.logits.numpy()

    last_logits, _ = engine.prefill(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(last_logits[0]), hf_logits[0, -1], rtol=1e-3, atol=2e-4
    )


def test_greedy_decode_token_parity(hf_model, our_setup):
    engine, cfg = our_setup
    ids, mask, pixels = _inputs()
    n_new = 12

    with torch.no_grad():
        hf_tokens = hf_model.generate(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
            attention_mask=torch.tensor(mask),
            max_new_tokens=n_new,
            do_sample=False,
            eos_token_id=None,
        )
    hf_new = hf_tokens[0, ids.shape[1]:].numpy()

    ours = engine.generate(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        max_new_tokens=n_new, do_sample=False, eos_token_id=-1,
    )
    np.testing.assert_array_equal(ours[0], hf_new)


def test_fused_generate_matches_loop(our_setup):
    engine, cfg = our_setup
    ids, mask, pixels = _inputs()
    loop = engine.generate(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        max_new_tokens=8, do_sample=False, eos_token_id=-1,
    )
    fused = engine.generate_fused(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        max_new_tokens=8, do_sample=False, eos_token_id=-1,
    )
    np.testing.assert_array_equal(loop, np.asarray(fused))


def test_batched_padded_decode_parity(hf_model, our_setup):
    """Batch>1 with right padding — beyond the reference's B==1 assert."""
    engine, cfg = our_setup
    n_img = 4
    rng = np.random.default_rng(7)
    row0 = [IMG_TOK] * n_img + [BOS, 17, 23, 42, 9]
    row1 = [IMG_TOK] * n_img + [BOS, 5, 30, PAD, PAD]
    ids = np.asarray([row0, row1], dtype=np.int64)
    mask = (ids != PAD).astype(np.int64)
    pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    n_new = 6

    ours = engine.generate(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        max_new_tokens=n_new, do_sample=False, eos_token_id=-1,
    )

    # HF comparison per-row without padding (padding-free gold).
    for b in range(2):
        keep = mask[b].astype(bool)
        with torch.no_grad():
            hf_tokens = hf_model.generate(
                input_ids=torch.tensor(ids[b][keep][None]),
                pixel_values=torch.tensor(pixels[b : b + 1]),
                attention_mask=torch.ones((1, int(keep.sum())), dtype=torch.long),
                max_new_tokens=n_new, do_sample=False, eos_token_id=None,
            )
        hf_new = hf_tokens[0, int(keep.sum()):].numpy()
        np.testing.assert_array_equal(ours[b], hf_new)


def test_fused_generate_sampled_runs(our_setup):
    """Sampling path under jit (sort+cumsum top-p + Gumbel draw) executes and
    produces valid token ids."""
    engine, cfg = our_setup
    ids, mask, pixels = _inputs()
    toks = engine.generate_fused(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        max_new_tokens=6, do_sample=True, temperature=0.8, top_p=0.9,
        key=jax.random.PRNGKey(7), eos_token_id=-1,
    )
    toks = np.asarray(toks)
    assert toks.shape == (1, 6)
    assert ((toks >= 0) & (toks < VOCAB)).all()
    # different keys -> (almost surely) different samples
    toks2 = np.asarray(engine.generate_fused(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        max_new_tokens=6, do_sample=True, temperature=5.0, top_p=1.0,
        key=jax.random.PRNGKey(8), eos_token_id=-1,
    ))
    assert not np.array_equal(toks, toks2)


def test_generate_stops_at_eos(our_setup):
    """EOS termination semantics: rows stop and pad with EOS."""
    engine, cfg = our_setup
    ids, mask, pixels = _inputs()
    # discover the greedy continuation, use its 2nd token as EOS
    probe = np.asarray(engine.generate(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        max_new_tokens=8, do_sample=False, eos_token_id=-1,
    ))[0]
    # pick as EOS a token whose first occurrence is not at step 0 (fall back
    # to the first token if the tiny model repeats itself forever)
    idx = next(
        (i for i in range(1, len(probe)) if probe[i] not in probe[:i]), 0
    )
    eos = int(probe[idx])
    out = engine.generate(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        max_new_tokens=8, do_sample=False, eos_token_id=eos,
    )
    assert out.shape[1] == idx + 1  # stopped right after emitting EOS
    assert out[0, -1] == eos


def test_generate_streaming_callback(our_setup):
    engine, cfg = our_setup
    ids, mask, pixels = _inputs()
    seen = []
    out = engine.generate(
        jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        max_new_tokens=4, do_sample=False, eos_token_id=-1,
        on_token=lambda step, toks: seen.append((step, toks.copy())),
    )
    assert [s for s, _ in seen] == [0, 1, 2, 3]
    np.testing.assert_array_equal(np.stack([t for _, t in seen], 1), out)
