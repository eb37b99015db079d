"""Grammar-constrained decoding (processing/grammar.py + serving gtable).

Contract: a constrained row's emitted text is at every step a live
prefix of the grammar and the row can only STOP (emit EOS) on a complete
match; unconstrained rows in the same batch are bit-identical to a plain
engine. The reference takes the raw argmax/top-p token every step with
no constraint mechanism at all (ref: inference.py:51-87).
"""

import numpy as np
import pytest

import jax

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.processing.grammar import (
    ByteDFA,
    compile_choices,
    compile_regex,
    compile_token_dfa,
)
from paligemma_tpu.runtime.serving import Request, ServingEngine

CFG = tiny_test_config()
EOS = 1

# synthetic vocab surface strings: ids 10..17 are text pieces, everything
# else (specials, image token, filler) is unreachable-for-grammar ("")
TOKEN_STRS = [""] * CFG.vocab_size
_PIECES = {10: "a", 11: "b", 12: "ab", 13: "c", 14: "x", 15: "yz",
           16: "12", 17: "3"}
for i, s in _PIECES.items():
    TOKEN_STRS[i] = s


def _dfa(pattern) -> ByteDFA:
    return compile_regex(pattern)


# ---------------------------------------------------------------------------
# host compiler
# ---------------------------------------------------------------------------
def test_regex_dfa_matches():
    d = _dfa("(ab)+c?")
    assert d.matches("ab") and d.matches("ababc") and d.matches("abc")
    assert not d.matches("") and not d.matches("c") and not d.matches("abcc")
    d2 = _dfa(r"\d{2,3}(,\d{2,3})*")
    assert d2.matches("12") and d2.matches("123") and d2.matches("12,345")
    assert not d2.matches("1") and not d2.matches("1234")
    d3 = _dfa(r"[^b]+")
    assert d3.matches("ac") and not d3.matches("ab")
    d4 = _dfa(r"a{0,2}b")
    assert d4.matches("b") and d4.matches("aab") and not d4.matches("aaab")


def test_choices_dfa():
    d = compile_choices(["yes", "no"])
    assert d.matches("yes") and d.matches("no")
    assert not d.matches("ye") and not d.matches("yesno")


def test_token_closure_semantics():
    td = compile_token_dfa(_dfa("(ab)+c?"), TOKEN_STRS, EOS)
    allow0 = td.table[0] >= 0
    # start: "a" and "ab" are live prefixes; "b"/"c"/"x" are not; EOS is
    # not (empty string doesn't match); specials ("") never allowed
    assert allow0[10] and allow0[12]
    assert not allow0[11] and not allow0[13] and not allow0[EOS]
    assert not allow0[0] and not allow0[CFG.image_token_index]
    s_ab = int(td.table[0, 12])
    assert td.table[s_ab, EOS] == s_ab  # accepting: EOS self-loops
    s_a = int(td.table[0, 10])
    assert td.table[s_a, EOS] == -1 and td.table[s_a, 11] >= 0


def test_token_closure_deadend_allows_eos():
    # grammar needs a "q" the vocab can't spell: state 0 would have no
    # way out — the fail-safe must allow EOS instead of wedging
    td = compile_token_dfa(_dfa("q+"), TOKEN_STRS, EOS)
    assert td.table[0, EOS] == 0
    assert (td.table[0] >= 0).sum() == 1


# ---------------------------------------------------------------------------
# serving
# ---------------------------------------------------------------------------
def _req(rid, seed, n_txt, max_new, grammar=None, do_sample=False):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((n_img,), CFG.image_token_index),
         rng.integers(3, 100, (n_txt,))]
    ).astype(np.int32)
    pixels = rng.normal(size=(3, 28, 28)).astype(np.float32)
    return Request(
        request_id=rid, input_ids=ids, pixel_values=pixels,
        max_new_tokens=max_new, do_sample=do_sample, eos_token_id=EOS,
        grammar=grammar, temperature=1.0, top_p=0.9,
    )


def _run(params, reqs, **kw):
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False, **kw)
    for r in reqs:
        eng.submit(r)
    eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in reqs}


def _text(tokens):
    out = []
    for t in tokens:
        if t == EOS:
            break
        out.append(TOKEN_STRS[t])
        assert TOKEN_STRS[t], f"constrained row emitted special token {t}"
    return "".join(out)


@pytest.fixture(scope="module")
def params():
    return paligemma.init_params(jax.random.PRNGKey(0), CFG)


def test_constrained_greedy_stays_in_grammar(params):
    dfa = _dfa("(ab)+c?")
    td = compile_token_dfa(dfa, TOKEN_STRS, EOS)
    got = _run(params, [_req(0, 1, 6, 10, grammar="g"),
                        _req(1, 2, 4, 8, grammar="g")],
               grammars={"g": td})
    for rid, toks in got.items():
        text = _text(toks)
        assert dfa.is_live_prefix(text), (rid, toks, text)
        if EOS in toks:
            assert dfa.matches(text), (rid, toks, text)


def test_choices_grammar_forces_stop(params):
    """A finite grammar (literal choices) must retire via forced EOS the
    moment the match completes — no trailing junk, no budget exhaustion."""
    dfa = compile_choices(["ab", "abab"])
    td = compile_token_dfa(dfa, TOKEN_STRS, EOS)
    got = _run(params, [_req(0, 1, 6, 20, grammar="g")], grammars={"g": td})
    toks = got[0]
    assert EOS in toks, toks
    assert dfa.matches(_text(toks)), toks


def test_mixed_batch_unconstrained_rows_unchanged(params):
    td = compile_token_dfa(_dfa("(ab)+c?"), TOKEN_STRS, EOS)
    plain = _run(params, [_req(0, 1, 6, 8), _req(1, 2, 5, 6)])
    mixed = _run(params, [_req(0, 1, 6, 8), _req(1, 2, 5, 6),
                          _req(2, 3, 4, 8, grammar="g")],
                 grammars={"g": td})
    np.testing.assert_array_equal(mixed[0], plain[0])
    np.testing.assert_array_equal(mixed[1], plain[1])


def test_constrained_sampling_stays_in_grammar(params):
    dfa = _dfa("(ab|c)+")
    td = compile_token_dfa(dfa, TOKEN_STRS, EOS)
    got = _run(params, [_req(0, 7, 5, 12, grammar="g", do_sample=True)],
               grammars={"g": td})
    text = _text(got[0])
    assert dfa.is_live_prefix(text), (got[0], text)


def test_grammar_rejections(params):
    td = compile_token_dfa(_dfa("a+"), TOKEN_STRS, EOS)
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False, grammars={"g": td})
    with pytest.raises(ValueError, match="unknown grammar"):
        eng.submit(_req(0, 1, 4, 4, grammar="nope"))
    bad_eos = _req(0, 1, 4, 4, grammar="g")
    bad_eos.eos_token_id = -1
    with pytest.raises(ValueError, match="eos_token_id"):
        eng.submit(bad_eos)
    eng2 = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                         use_flash=False)
    with pytest.raises(ValueError, match="unknown grammar"):
        eng2.submit(_req(0, 1, 4, 4, grammar="g"))


def test_grammar_composes_with_lora(params):
    """Both extras thread the same tick: a constrained request decoding
    under a LoRA adapter stays in-grammar."""
    from tests.test_multilora import _adapter

    dfa = _dfa("(ab)+c?")
    td = compile_token_dfa(dfa, TOKEN_STRS, EOS)
    r = _req(0, 1, 5, 8, grammar="g")
    r.lora = "x"
    got = _run(params, [r], grammars={"g": td},
               lora_bank={"x": _adapter(1)})
    assert dfa.is_live_prefix(_text(got[0]))


def test_warmup_precompiles_grammar_tick(params):
    td = compile_token_dfa(_dfa("(ab)+c?"), TOKEN_STRS, EOS)
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False, grammars={"g": td})
    n_img = CFG.vision_config.num_patches
    eng.warmup([n_img + 6], batch_sizes=(1, 2))
    r = _req(0, 1, 6, 5, grammar="g")
    eng.submit(r)
    eng.run_to_completion()
    assert r.tokens


# ---------------------------------------------------------------------------
# speculative x grammar (round-4: constrained verify — VERDICT item 3)
# ---------------------------------------------------------------------------
def _run_engine(params, reqs, engine="dense", n_slots=3, **kw):
    if engine == "paged":
        from paligemma_tpu.runtime.serving_paged import PagedServingEngine

        eng = PagedServingEngine(
            params, CFG, max_slots=n_slots, max_seq_len=64, page_size=16,
            n_pages=16, use_flash=False, **kw,
        )
    else:
        eng = ServingEngine(params, CFG, max_slots=n_slots, max_seq_len=64,
                            use_flash=False, **kw)
    for r in reqs:
        eng.submit(r)
    eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in reqs}


def _mixed_reqs():
    # grammar'd + unconstrained rows in one wave; a periodic plain prompt
    # gives the n-gram proposer real matches on the unconstrained row
    rng = np.random.default_rng(5)
    n_img = CFG.vision_config.num_patches
    txt = np.tile(rng.integers(3, 100, (3,)), 4)[:9]
    plain = Request(
        request_id=1,
        input_ids=np.concatenate(
            [np.full((n_img,), CFG.image_token_index), txt]
        ).astype(np.int32),
        pixel_values=rng.normal(size=(3, 28, 28)).astype(np.float32),
        max_new_tokens=8, do_sample=False, eos_token_id=EOS,
    )
    return [_req(0, 1, 6, 10, grammar="g"), plain,
            _req(2, 3, 4, 12, grammar="g")]


@pytest.mark.parametrize("engine", ["dense", "paged"])
def test_spec_grammar_token_identity(params, engine):
    """Constrained speculative decoding is TOKEN-IDENTICAL to non-spec
    constrained decoding on a mixed batch: the verify argmax is masked
    with each position's post-prefix DFA state, so a disallowed draft is
    rejected exactly where plain constrained greedy would diverge."""
    td = compile_token_dfa(_dfa("(ab)+c?"), TOKEN_STRS, EOS)
    want = _run_engine(params, _mixed_reqs(), engine, grammars={"g": td})
    got = _run_engine(params, _mixed_reqs(), engine, grammars={"g": td},
                      spec_decode=True, spec_draft_k=3, spec_match_n=2)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid]), rid
    dfa = _dfa("(ab)+c?")
    for rid in (0, 2):
        assert dfa.is_live_prefix(_text(got[rid])), (rid, got[rid])


@pytest.mark.parametrize("engine", ["dense", "paged"])
def test_spec_grammar_forces_stop(params, engine):
    """A finite grammar retires via forced EOS under speculation too —
    the DFA's accepting-state EOS self-loop survives the verify mask."""
    dfa = compile_choices(["ab", "abab"])
    td = compile_token_dfa(dfa, TOKEN_STRS, EOS)
    got = _run_engine(params, [_req(0, 1, 6, 20, grammar="g")], engine,
                      grammars={"g": td}, spec_decode=True, spec_draft_k=4)
    toks = got[0]
    assert EOS in toks, toks
    assert dfa.matches(_text(toks)), toks
