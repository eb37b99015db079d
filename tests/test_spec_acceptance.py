"""Acceptance-controlled speculative decoding (corrupt_frac): emitted
tokens must stay bit-identical to plain greedy at EVERY corruption level
(the acceptance rule falls back to the model's own argmax), while the
mean accepted-per-cycle drops monotonically toward the floor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.core.config import (
    GemmaConfig,
    PaliGemmaConfig,
    SiglipVisionConfig,
)
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine


@pytest.fixture(scope="module")
def setup():
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
    rng = np.random.default_rng(0)
    n_img = cfg.vision_config.num_patches
    ids = np.concatenate(
        [np.full((1, n_img), 250), rng.integers(5, 240, (1, 6))], axis=1
    ).astype(np.int32)
    inputs = (
        jnp.asarray(rng.normal(size=(1, 3, 28, 28)).astype(np.float32)),
        jnp.asarray(ids), jnp.asarray(np.ones_like(ids)),
    )
    return cfg, params, inputs


def test_corrupt_frac_tokens_identical_acceptance_drops(setup):
    cfg, params, (px, ids, mask) = setup
    eng = PaliGemmaEngine(params, cfg, max_seq_len=128, eos_token_id=1,
                          use_flash=False)
    base = eng.generate(px, ids, mask, max_new_tokens=24, do_sample=False)
    accepted = {}
    for frac in (0.0, 0.5, 1.0):
        out = eng.generate_spec(
            px, ids, mask, max_new_tokens=24, eos_token_id=1,
            draft_k=4, match_n=2, corrupt_frac=frac,
        )
        n = out.shape[1]
        np.testing.assert_array_equal(out[0], np.asarray(base)[0, :n])
        # n includes the prefill seed token emitted before any cycle
        accepted[frac] = (n - 1) / eng.spec_cycles
    # full corruption -> every cycle emits exactly 1 (the model token)
    assert accepted[1.0] <= 1.0 + 1e-9
    assert accepted[0.0] >= accepted[0.5] >= accepted[1.0]


def test_serving_spec_corrupt_tokens_identical(setup):
    cfg, params, (px, ids, mask) = setup
    from paligemma_tpu.runtime.serving import Request, ServingEngine

    def run(frac):
        eng = ServingEngine(
            params, cfg, max_slots=2, max_seq_len=128, spec_decode=True,
            spec_draft_k=4, spec_match_n=2, spec_corrupt_frac=frac,
            use_flash=False, sync_every=2,
        )
        for i in range(2):
            eng.submit(Request(
                request_id=i, input_ids=np.asarray(ids[0]),
                pixel_values=np.asarray(px[0]), max_new_tokens=12,
                do_sample=False, eos_token_id=1,
            ))
        done = eng.run_to_completion()
        return {r.request_id: list(r.tokens) for r in done}

    clean = run(0.0)
    dirty = run(0.75)
    assert clean == dirty
