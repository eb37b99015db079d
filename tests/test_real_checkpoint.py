"""Weights-gated parity tests against a REAL PaliGemma checkpoint.

This environment cannot download ``google/paligemma-3b-pt-224``
(documented in docs/ROADMAP.md), so the reference's true functional
baseline — a real-weights greedy caption (ref: launch_inference.sh:3-10,
inference.py:29-87) — is executable only where the weights exist. These
tests auto-skip without them and run the full real baseline the moment
they appear:

    PALIGEMMA_CHECKPOINT=/path/to/paligemma-3b-pt-224 \
        python -m pytest tests/test_real_checkpoint.py -v

``PALIGEMMA_CHECKPOINT`` must point at the HF checkpoint directory
(config.json + safetensors + tokenizer files). The VQ-VAE test
additionally wants the official mask decoder at
``$PALIGEMMA_VAE_OID`` or ``$PALIGEMMA_CHECKPOINT/vae-oid.npz``.

Covers: (a) greedy token parity vs HF transformers, (b) tokenizer
fidelity against the real SentencePiece model, (c) int8-vs-bf16 greedy
agreement on real weights, (d) the official vae-oid.npz loading and
decoding through our pure-JAX decoder.
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("PALIGEMMA_CHECKPOINT")
VAE = os.environ.get(
    "PALIGEMMA_VAE_OID",
    os.path.join(CKPT, "vae-oid.npz") if CKPT else "",
)

pytestmark = pytest.mark.skipif(
    not (CKPT and os.path.isdir(CKPT)),
    reason="PALIGEMMA_CHECKPOINT not set (real weights unavailable here)",
)

_IMAGE = os.path.join(os.path.dirname(__file__), "..", "test_images", "pic1.png")
_PROMPT = "caption en"
_N_TOKENS = 20


@pytest.fixture(scope="module")
def loaded():
    import jax.numpy as jnp

    from paligemma_tpu.checkpoints.hf_loader import load_hf_model

    params, cfg = load_hf_model(CKPT, dtype=jnp.float32)
    return params, cfg


@pytest.fixture(scope="module")
def processor(loaded):
    from transformers import AutoTokenizer

    from paligemma_tpu.processing.processor import PaliGemmaProcessor

    _, cfg = loaded
    tok = AutoTokenizer.from_pretrained(CKPT, padding_side="right")
    return PaliGemmaProcessor(
        tok, cfg.vision_config.num_patches, cfg.vision_config.image_size
    )


def _our_greedy(params, cfg, processor, n_tokens, dtype=None):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from paligemma_tpu.runtime.engine import PaliGemmaEngine

    if dtype is not None:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    eng = PaliGemmaEngine(
        params, cfg, max_seq_len=1024,
        eos_token_id=processor.tokenizer.eos_token_id,
    )
    batch = processor(
        text=[_PROMPT], images=[Image.open(_IMAGE)], padding="longest"
    )
    toks = eng.generate(
        jnp.asarray(batch["pixel_values"]),
        jnp.asarray(np.asarray(batch["input_ids"])),
        jnp.asarray(np.asarray(batch["attention_mask"])),
        max_new_tokens=n_tokens, do_sample=False, sync_every=8,
    )
    return np.asarray(toks)[0]


def test_greedy_token_parity_vs_transformers(loaded, processor):
    """The reference baseline run: same image, same prompt, greedy — our
    fp32 decode must emit the transformers fp32 tokens exactly."""
    import torch
    import transformers
    from PIL import Image

    hf_proc = transformers.AutoProcessor.from_pretrained(CKPT)
    hf = transformers.PaliGemmaForConditionalGeneration.from_pretrained(
        CKPT, torch_dtype=torch.float32
    ).eval()
    inputs = hf_proc(
        text=_PROMPT, images=Image.open(_IMAGE).convert("RGB"),
        return_tensors="pt",
    )
    with torch.no_grad():
        out = hf.generate(
            **inputs, max_new_tokens=_N_TOKENS, do_sample=False
        )
    want = out[0, inputs["input_ids"].shape[1]:].numpy()

    params, cfg = loaded
    got = _our_greedy(params, cfg, processor, _N_TOKENS)
    n = min(len(want), len(got))
    np.testing.assert_array_equal(want[:n], got[:n])


def test_tokenizer_fidelity(processor):
    """Real SentencePiece model: the gemma-string prompt build, the
    1024 loc + 128 seg task tokens, and round-trip decode."""
    tok = processor.tokenizer
    # task tokens resolve to single ids and round-trip
    for t in ("<loc0000>", "<loc1023>", "<seg000>", "<seg127>"):
        ids = tok.convert_tokens_to_ids([t])
        assert ids[0] != tok.unk_token_id, t
        assert tok.convert_ids_to_tokens(ids)[0] == t
    # gemma string: image tokens + BOS + prompt + newline, no EOS appended
    batch = processor(text=[_PROMPT], images=[_fake_image()])
    ids = np.asarray(batch["input_ids"])[0]
    n_img = processor.image_seq_len
    assert (ids[:n_img] == tok.image_token_id).all()
    assert ids[n_img] == tok.bos_token_id
    assert ids[-1] != tok.eos_token_id
    text = tok.decode(ids[n_img + 1:], skip_special_tokens=False)
    assert text.startswith(_PROMPT)
    # plain-text round trip
    rt = tok.decode(tok.encode(_PROMPT, add_special_tokens=False))
    assert rt == _PROMPT


def _fake_image():
    from PIL import Image

    return Image.open(_IMAGE)


def test_int8_token_agreement_on_real_weights(loaded, processor):
    """int8 serving quality hook: greedy tokens from the int8 engine agree
    with bf16 on >= 90% of steps over a 50-token caption (the random-
    weights surrogate for this lives in tests/test_midsize_parity.py)."""
    import jax.numpy as jnp

    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    params, cfg = loaded
    import jax

    bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    want = _our_greedy(bf16, cfg, processor, 50)
    q = quantize_lm_for_serving(bf16)
    got = _our_greedy(q, cfg, processor, 50)
    n = min(len(want), len(got))
    agree = float(np.mean(want[:n] == got[:n]))
    assert agree >= 0.9, agree


@pytest.mark.skipif(not (VAE and os.path.isfile(VAE)),
                    reason="vae-oid.npz not present")
def test_vae_oid_mask_decoder():
    """The official big_vision VQ-VAE decoder weights load into our
    pure-JAX reimplementation and decode seg indices to sane 64x64
    masks (finite, varied, in [0,1] after to_unit_range)."""
    import jax.numpy as jnp

    from paligemma_tpu.processing import mask_vae

    params = mask_vae.load_vae_oid_npz(VAE)
    idx = jnp.asarray(
        np.arange(32, dtype=np.int32).reshape(2, 16) % 128
    )
    logits = np.asarray(mask_vae.reconstruct_masks(params, idx))
    assert logits.shape == (2, 64, 64, 1)
    assert np.isfinite(logits).all()
    unit = mask_vae.to_unit_range(logits)
    assert unit.min() >= 0.0 and unit.max() <= 1.0
    # two different codes decode to visibly different masks
    assert np.abs(logits[0] - logits[1]).max() > 1e-3
