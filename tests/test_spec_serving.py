"""Speculative continuous-batching serving (ServingEngine(spec_decode=True)).

Contract: per-request greedy tokens are bit-identical to the
non-speculative serving engine (and therefore to the single-request
engine — tests/test_serving.py ties those together); budgets are
respected exactly; EOS retires early; sampling requests are rejected at
submit. The reference serves one request at a time, one token per forward
(ref: processing_paligemma.py:174, inference.py:51-87) — speculative
batched serving is a TPU-native extra (runtime/serving.py _spec_window).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.serving import Request, ServingEngine

CFG = tiny_test_config()


def _req(rid, seed, n_txt, max_new, repeat_prompt=False):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    if repeat_prompt:
        # a periodic text suffix gives the n-gram proposer real matches
        txt = np.tile(rng.integers(3, 100, (3,)), n_txt // 3 + 1)[:n_txt]
    else:
        txt = rng.integers(3, 100, (n_txt,))
    ids = np.concatenate(
        [np.full((n_img,), CFG.image_token_index), txt]
    ).astype(np.int32)
    pixels = rng.normal(size=(3, 28, 28)).astype(np.float32)
    return Request(
        request_id=rid, input_ids=ids, pixel_values=pixels,
        max_new_tokens=max_new, do_sample=False, eos_token_id=-1,
    )


def _run(params, reqs, **kw):
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False, **kw)
    for r in reqs:
        eng.submit(r)
    eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in reqs}


def test_spec_serving_matches_plain_serving():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [
        _req(0, 1, 6, 8), _req(1, 2, 9, 5, repeat_prompt=True),
        _req(2, 3, 4, 7), _req(3, 4, 6, 3),
    ]
    want = _run(params, mk())
    got = _run(params, mk(), spec_decode=True, spec_draft_k=4,
               spec_match_n=2)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid]), rid


def test_spec_serving_budget_exact():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [_req(0, 5, 4, 11), _req(1, 6, 5, 2)]
    got = _run(params, reqs, spec_decode=True, spec_draft_k=3)
    assert len(got[0]) == 11 and len(got[1]) == 2


def test_spec_serving_eos_retires_early():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    single = PaliGemmaEngine(params, CFG, max_seq_len=64, use_flash=False)
    r0 = _req(0, 1, 6, 8)
    probe = single.generate(
        jnp.asarray(r0.pixel_values)[None], jnp.asarray(r0.input_ids)[None],
        jnp.ones((1, len(r0.input_ids)), jnp.int32),
        max_new_tokens=3, do_sample=False, eos_token_id=-1,
    )[0]
    eos = int(probe[2])

    r = _req(0, 1, 6, 12)
    r.eos_token_id = eos
    got = _run(params, [r], spec_decode=True, spec_draft_k=4)
    assert got[0][-1] == eos
    assert len(got[0]) <= 4  # EOS at step 3 + window overshoot discarded


def test_spec_serving_rejects_sampling():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False, spec_decode=True)
    r = _req(0, 1, 4, 4)
    r.do_sample = True
    with pytest.raises(ValueError, match="greedy-only"):
        eng.submit(r)


def test_spec_serving_clamps_budget_for_overshoot():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, max_slots=1, max_seq_len=64,
                        use_flash=False, spec_decode=True, spec_draft_k=4)
    n_img = CFG.vision_config.num_patches
    r = _req(0, 1, 40 - n_img, 1000)  # prompt 40 of 64
    eng.submit(r)
    # 64 - 40 - draft_k: rejected-draft KV overshoot stays in the cache
    assert r.max_new_tokens == 64 - 40 - 4
    done = eng.run_to_completion()
    assert len(done[0].tokens) == r.max_new_tokens


def test_spec_serving_slot_reuse_and_queueing():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [_req(i, 20 + i, 4 + i % 3, 3 + i % 4) for i in range(5)]
    want = _run(params, mk())
    got = _run(params, mk(), spec_decode=True, spec_draft_k=4)
    assert sorted(got) == sorted(want)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_spec_serving_pipelined_matches_stepwise():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [_req(0, 1, 6, 9), _req(1, 2, 5, 6, repeat_prompt=True)]
    a = _run(params, mk(), spec_decode=True, pipeline=False)
    b = _run(params, mk(), spec_decode=True, pipeline=True)
    for rid in a:
        np.testing.assert_array_equal(a[rid], b[rid])


def test_spec_serving_under_tp_mesh():
    """Speculative serving sharded over a TP mesh: decode_verify is plain
    XLA, so the Megatron weight shardings + GSPMD carry the whole verify
    cycle — no kernel variant needed (runtime/serving.py spec_decode)."""
    from paligemma_tpu.core import mesh as mesh_lib

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [_req(0, 1, 6, 7), _req(1, 2, 9, 5, repeat_prompt=True),
                  _req(2, 3, 4, 6)]
    want = _run(params, mk(), spec_decode=True, spec_draft_k=4)
    mesh = mesh_lib.make_mesh(data=1, model=4)
    got = _run(params, mk(), spec_decode=True, spec_draft_k=4, mesh=mesh)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_spec_serving_warmup_precompiles():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False, spec_decode=True, spec_draft_k=4)
    n_img = CFG.vision_config.num_patches
    eng.warmup([n_img + 6], batch_sizes=(1, 2))
    r = _req(0, 1, 6, 5)
    eng.submit(r)
    eng.run_to_completion()
    assert len(r.tokens) == 5
