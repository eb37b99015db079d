"""n-gram speculative decoding (device-resident prompt lookup).

Contract: ``generate_spec`` emits a greedy sequence token-identical to
plain greedy ``generate`` (acceptance compares every draft position
against the model's own argmax, so a bad draft can never change the
output), stops at EOS, and respects the max_new_tokens budget. The
reference decodes strictly one token per forward (ref: inference.py:51-87)
— speculation is a TPU-native extra (see runtime/engine.generate_spec).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.ops.ngram import propose_ngram
from paligemma_tpu.runtime.engine import PaliGemmaEngine

CFG = tiny_test_config()


def _inputs(seed=0, n_txt=6):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((1, n_img), CFG.image_token_index),
         rng.integers(3, 100, (1, n_txt))], axis=1,
    ).astype(np.int32)
    mask = np.ones_like(ids)
    c = CFG.vision_config
    pixels = rng.normal(size=(1, 3, c.image_size, c.image_size)).astype(
        np.float32
    )
    return jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)


# ---------------------------------------------------------------------------
# proposer
# ---------------------------------------------------------------------------
def test_ngram_proposer_finds_most_recent_match():
    #            0  1  2  3  4  5  6  7  8
    hist = np.array([[5, 6, 7, 1, 5, 6, 9, 5, 6]], np.int32)
    hist = np.pad(hist, ((0, 0), (0, 7)))
    # trailing 2-gram (5,6): occurrences at 0 and 4; most recent is 4 ->
    # continuation history[6:9] = 9, 5, 6
    draft = np.asarray(propose_ngram(jnp.asarray(hist), jnp.asarray([9]), 2, 3))
    assert draft.tolist() == [[9, 5, 6]]


def test_ngram_proposer_wraps_periodic_continuation():
    """A RECENT match (repetition loop) has fewer than draft_k written
    continuation tokens; indices must wrap by the match period instead of
    reading unwritten buffer (the 2.00-tok/cycle bug)."""
    hist = np.array([[1, 2, 3, 1, 2, 3, 1, 2, 0, 0, 0, 0]], np.int32)
    # hl=8, suffix (1,2) matches at 0 and 3 -> p=3, period q=3
    draft = np.asarray(propose_ngram(jnp.asarray(hist), jnp.asarray([8]), 2, 5))
    assert draft.tolist() == [[3, 1, 2, 3, 1]]


def test_ngram_proposer_no_match_repeats_last():
    hist = np.array([[1, 2, 3, 4, 5, 0, 0, 0]], np.int32)
    draft = np.asarray(propose_ngram(jnp.asarray(hist), jnp.asarray([5]), 2, 4))
    assert draft.tolist() == [[5, 5, 5, 5]]


def test_ngram_proposer_ignores_stale_tail():
    # stale buffer contents past hist_len must not be matched
    hist = np.array([[1, 2, 9, 9, 1, 2, 7, 7]], np.int32)
    draft = np.asarray(propose_ngram(jnp.asarray(hist), jnp.asarray([6]), 2, 2))
    # history[:6] = 1 2 9 9 1 2; trailing (1,2) matches at 0 -> cont 9, 9
    assert draft.tolist() == [[9, 9]]


# ---------------------------------------------------------------------------
# verify forward
# ---------------------------------------------------------------------------
def test_decode_verify_matches_stepwise_decode():
    """Multi-token verify logits == running the same tokens one step at a
    time (same mask semantics, same cache writes for the accepted path)."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = PaliGemmaEngine(params, CFG, max_seq_len=64, use_flash=False)
    pixels, ids, mask = _inputs()
    logits, state = eng.prefill(pixels, ids, mask)

    toks = np.array([[7, 11, 23]], np.int32)
    v_logits, _ = paligemma.decode_verify(
        eng.decode_params, CFG, jnp.asarray(toks), state.cache,
        state.write_pos, state.valid, state.pos_ids,
    )

    logits_seq = []
    st = state
    for t in toks[0]:
        lg, st = eng.decode_step(jnp.asarray([t], np.int32), st)
        logits_seq.append(np.asarray(lg)[0])
    np.testing.assert_allclose(
        np.asarray(v_logits)[0], np.stack(logits_seq), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# end-to-end parity
# ---------------------------------------------------------------------------
def test_spec_matches_greedy_generate():
    params = paligemma.init_params(jax.random.PRNGKey(1), CFG)
    eng = PaliGemmaEngine(params, CFG, max_seq_len=64, use_flash=False)
    pixels, ids, mask = _inputs(seed=1)

    want = eng.generate(pixels, ids, mask, max_new_tokens=12,
                        do_sample=False, eos_token_id=-1)
    got = eng.generate_spec(pixels, ids, mask, max_new_tokens=12,
                            eos_token_id=-1, draft_k=4, match_n=2)
    assert got.shape == (1, 12)
    assert got.tolist() == want.tolist()
    # every cycle emits >= 1 token, so cycles <= tokens; with random
    # weights the output is usually repetitive enough to accept extras
    assert 1 <= eng.spec_cycles <= 12


def test_spec_stops_at_eos():
    params = paligemma.init_params(jax.random.PRNGKey(2), CFG)
    eng = PaliGemmaEngine(params, CFG, max_seq_len=64, use_flash=False)
    pixels, ids, mask = _inputs(seed=2)

    full = eng.generate(pixels, ids, mask, max_new_tokens=12,
                        do_sample=False, eos_token_id=-1)
    eos = int(full[0, 5])  # force an EOS the greedy path will emit
    got = eng.generate_spec(pixels, ids, mask, max_new_tokens=12,
                            eos_token_id=eos, draft_k=4, match_n=2)
    # emitted tokens match greedy up to and INCLUDING the first eos
    first = next(i for i, t in enumerate(full[0].tolist()) if t == eos)
    assert got[0].tolist() == full[0, : first + 1].tolist()
    assert got[0, -1] == eos


def test_spec_budget_and_batch_guards():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=False)
    pixels, ids, mask = _inputs()
    with pytest.raises(ValueError, match="single-request"):
        eng.generate_spec(
            jnp.concatenate([pixels, pixels]), jnp.concatenate([ids, ids]),
            jnp.concatenate([mask, mask]), max_new_tokens=4,
        )
    with pytest.raises(ValueError, match="max_seq_len"):
        eng.generate_spec(pixels, ids, mask, max_new_tokens=30, draft_k=8)


def test_spec_respects_budget_exactly():
    """n_out never exceeds max_new_tokens even when the last cycle accepts
    more drafts than the remaining budget."""
    params = paligemma.init_params(jax.random.PRNGKey(3), CFG)
    eng = PaliGemmaEngine(params, CFG, max_seq_len=64, use_flash=False)
    pixels, ids, mask = _inputs(seed=3)
    for n in (1, 2, 5):
        got = eng.generate_spec(pixels, ids, mask, max_new_tokens=n,
                                eos_token_id=-1, draft_k=4)
        want = eng.generate(pixels, ids, mask, max_new_tokens=n,
                            do_sample=False, eos_token_id=-1)
        assert got.tolist() == want.tolist()
