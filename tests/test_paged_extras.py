"""Round-3 composition coverage on the PAGED serving engine: grammar-
constrained decoding, multi-LoRA banks, and speculative decoding over the
prefix cache.

The paged tick materializes logits every step (unlike the dense fused
greedy tick, whose in-kernel argmax head cannot mask), so grammar
composes with every paged kernel; LoRA rides the page-walk variants'
XLA projections via the same per-row bank gather the dense XLA tick
uses (gemma._lora_delta); and a prefix-cache hit under spec_decode seeds
the n-gram proposer's device state from the request's own ids instead of
the skipped prefill. The reference has none of paging, constraints,
adapters, or speculation (ref: inference.py:51-87, modeling_gemma.py:8-64).
Contract throughout: token parity with the dense engine running the same
extras (tests/test_grammar.py, test_multilora.py tie THOSE to ground
truth), plus the engines' own invariants (live-prefix outputs, cache-hit
counts, adapter-keyed cache entries).
"""

import numpy as np
import pytest

import jax

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.processing.grammar import compile_regex, compile_token_dfa
from paligemma_tpu.runtime.serving import Request, ServingEngine
from paligemma_tpu.runtime.serving_paged import PagedServingEngine

from tests.test_grammar import TOKEN_STRS, _text
from tests.test_multilora import _adapter, _merged

CFG = tiny_test_config()
EOS = 1


def _req(rid, seed, n_txt, max_new, grammar=None, lora=None,
         do_sample=False, eos=-1):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((n_img,), CFG.image_token_index),
         rng.integers(3, 100, (n_txt,))]
    ).astype(np.int32)
    pixels = rng.normal(size=(3, 28, 28)).astype(np.float32)
    return Request(
        request_id=rid, input_ids=ids, pixel_values=pixels,
        max_new_tokens=max_new, do_sample=do_sample, eos_token_id=eos,
        grammar=grammar, lora=lora, temperature=1.0, top_p=0.9,
    )


def _run_paged(params, reqs, **kw):
    base = dict(max_slots=2, max_seq_len=64, page_size=16, n_pages=16,
                use_flash=False)
    base.update(kw)
    eng = PagedServingEngine(params, CFG, **base)
    for r in reqs:
        eng.submit(r)
    eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in reqs}, eng


def _run_dense(params, reqs, **kw):
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False, **kw)
    for r in reqs:
        eng.submit(r)
    eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in reqs}


@pytest.fixture(scope="module")
def params():
    return paligemma.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def gram():
    dfa = compile_regex("(ab)+c?")
    return dfa, compile_token_dfa(dfa, TOKEN_STRS, EOS)


# ---------------------------------------------------------------------------
# grammar on the paged engine
# ---------------------------------------------------------------------------
def test_paged_grammar_stays_in_grammar(params, gram):
    dfa, td = gram
    got, _ = _run_paged(
        params,
        [_req(0, 1, 6, 10, grammar="g", eos=EOS),
         _req(1, 2, 4, 8, grammar="g", eos=EOS)],
        grammars={"g": td},
    )
    for rid, toks in got.items():
        text = _text(toks)
        assert dfa.is_live_prefix(text), (rid, toks, text)
        if EOS in toks:
            assert dfa.matches(text), (rid, toks, text)


def test_paged_grammar_matches_dense(params, gram):
    """Same constrained requests, dense XLA tick vs paged walk: identical
    tokens (the DFA advance/selection logic is tick-level in both)."""
    _, td = gram
    mk = lambda: [_req(0, 1, 6, 8, grammar="g", eos=EOS),
                  _req(1, 2, 5, 6, eos=EOS),
                  _req(2, 3, 4, 8, grammar="g", eos=EOS)]
    want = _run_dense(params, mk(), grammars={"g": td})
    got, _ = _run_paged(params, mk(), grammars={"g": td}, max_slots=3)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid], err_msg=str(rid))


def test_paged_grammar_unconstrained_rows_unchanged(params, gram):
    _, td = gram
    plain, _ = _run_paged(params, [_req(0, 1, 6, 8), _req(1, 2, 5, 6)])
    mixed, _ = _run_paged(
        params,
        [_req(0, 1, 6, 8), _req(1, 2, 5, 6),
         _req(2, 3, 4, 8, grammar="g", eos=EOS)],
        grammars={"g": td}, max_slots=3,
    )
    np.testing.assert_array_equal(mixed[0], plain[0])
    np.testing.assert_array_equal(mixed[1], plain[1])


def test_paged_grammar_sampling_stays_in_grammar(params, gram):
    dfa, td = gram
    got, _ = _run_paged(
        params, [_req(0, 7, 5, 12, grammar="g", do_sample=True, eos=EOS)],
        grammars={"g": td},
    )
    assert dfa.is_live_prefix(_text(got[0])), got[0]


def test_paged_grammar_prefix_cache_hit_reconstrains(params, gram):
    """A cache hit seats without prefill but must still seed gid/dstate:
    three identical constrained requests through one slot — one prefill,
    two hits, all three outputs in-grammar and identical."""
    dfa, td = gram
    got, eng = _run_paged(
        params, [_req(i, 5, 6, 8, grammar="g", eos=EOS) for i in range(3)],
        grammars={"g": td}, max_slots=1, prefix_cache=True,
    )
    assert eng.cache_hits == 2, eng.cache_hits
    assert eng.prefill_calls == 1, eng.prefill_calls
    for rid in (1, 2):
        np.testing.assert_array_equal(got[rid], got[0])
    assert dfa.is_live_prefix(_text(got[0]))


# ---------------------------------------------------------------------------
# multi-LoRA on the paged engine
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def adapters():
    return {"x": _adapter(1), "y": _adapter(2)}


def test_paged_lora_matches_dense(params, adapters):
    mk = lambda: [_req(0, 1, 6, 8, lora="x"), _req(1, 2, 5, 8, lora="y"),
                  _req(2, 3, 4, 8)]
    want = _run_dense(params, mk(), lora_bank=adapters)
    got, eng = _run_paged(params, mk(), lora_bank=adapters, max_slots=3)
    assert eng.paged_kernel in ("multi", "xla"), eng.paged_kernel
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid], err_msg=str(rid))


def test_paged_lora_row_matches_merged_weights(params, adapters):
    """A bank row's tokens equal a plain paged engine over merge_lora'd
    weights — the fold-in path the export flow uses."""
    want, _ = _run_paged(_merged(params, adapters["x"]),
                         [_req(0, 4, 6, 8)])
    got, _ = _run_paged(params, [_req(0, 4, 6, 8, lora="x")],
                        lora_bank=adapters)
    np.testing.assert_array_equal(got[0], want[0])


def test_paged_lora_base_rows_unchanged(params, adapters):
    plain, _ = _run_paged(params, [_req(0, 1, 6, 8)])
    mixed, _ = _run_paged(
        params, [_req(0, 1, 6, 8), _req(1, 2, 5, 8, lora="y")],
        lora_bank=adapters,
    )
    np.testing.assert_array_equal(mixed[0], plain[0])


def test_paged_lora_prefix_cache_keyed_by_adapter(params, adapters):
    """Identical prompts under different adapters must NOT share prefix
    entries (the cached KV went through the adapter's prefill deltas)."""
    base = [_req(0, 6, 6, 6, lora="x"), _req(1, 6, 6, 6, lora="y"),
            _req(2, 6, 6, 6, lora="x")]
    want_x, _ = _run_paged(params, [_req(0, 6, 6, 6, lora="x")],
                           lora_bank=adapters)
    want_y, _ = _run_paged(params, [_req(0, 6, 6, 6, lora="y")],
                           lora_bank=adapters)
    got, eng = _run_paged(params, base, lora_bank=adapters, max_slots=1,
                          prefix_cache=True)
    # x and y prefill separately; the second x request hits x's entry
    assert eng.cache_hits == 1, eng.cache_hits
    assert eng.prefill_calls == 2, eng.prefill_calls
    np.testing.assert_array_equal(got[0], want_x[0])
    np.testing.assert_array_equal(got[1], want_y[0])
    np.testing.assert_array_equal(got[2], want_x[0])


def test_paged_grammar_composes_with_lora(params, gram, adapters):
    dfa, td = gram
    got, _ = _run_paged(
        params, [_req(0, 1, 5, 8, grammar="g", lora="x", eos=EOS)],
        grammars={"g": td}, lora_bank=adapters,
    )
    assert dfa.is_live_prefix(_text(got[0]))


# ---------------------------------------------------------------------------
# speculative decoding over the prefix cache
# ---------------------------------------------------------------------------
def test_spec_prefix_cache_hit_matches_miss(params):
    """Three identical requests through one slot under spec_decode +
    prefix_cache: one prefill, two hits, tokens identical to the
    cache-less spec engine (hit seating seeds the n-gram state)."""
    mk = lambda: [_req(i, 9, 6, 8) for i in range(3)]
    want, _ = _run_paged(params, mk(), max_slots=1, spec_decode=True,
                         spec_draft_k=4)
    got, eng = _run_paged(params, mk(), max_slots=1, spec_decode=True,
                          spec_draft_k=4, prefix_cache=True)
    assert eng.cache_hits == 2, eng.cache_hits
    assert eng.prefill_calls == 1, eng.prefill_calls
    for rid in range(3):
        np.testing.assert_array_equal(got[rid], want[rid], err_msg=str(rid))


def test_spec_prefix_cache_repetitive_prompt_accepts(params):
    """A repetitive prompt seated FROM THE CACHE must still speculate:
    the seeded history drives n-gram acceptance > 1 token/cycle."""
    n_img = CFG.vision_config.num_patches
    rng = np.random.default_rng(3)
    txt = np.tile(rng.integers(3, 100, (3,)), 4)[:9]
    ids = np.concatenate(
        [np.full((n_img,), CFG.image_token_index), txt]).astype(np.int32)
    pixels = rng.normal(size=(3, 28, 28)).astype(np.float32)
    mk = lambda rid: Request(
        request_id=rid, input_ids=ids.copy(), pixel_values=pixels.copy(),
        max_new_tokens=8, do_sample=False, eos_token_id=-1,
    )
    want, _ = _run_paged(params, [mk(0), mk(1)], max_slots=1,
                         spec_decode=True, spec_draft_k=4)
    got, eng = _run_paged(params, [mk(0), mk(1)], max_slots=1,
                          spec_decode=True, spec_draft_k=4,
                          prefix_cache=True)
    assert eng.cache_hits == 1
    np.testing.assert_array_equal(got[1], want[1])
