"""Speculative decoding on the PAGED serving engine.

Contract: greedy tokens bit-identical to the non-speculative paged
engine (which test_paged.py ties to the dense engines); budgets exact;
EOS retires early; page growth covers the verify forward's cross-page
writes and draft_k rejected-KV overshoot; preemption/recompute still
works mid-speculation. The reference has neither paging nor speculation
(ref: modeling_gemma.py:8-64, inference.py:51-87); this is
runtime/serving_paged.py _spec_window_paged over
models/paligemma.decode_verify_paged.
"""

import numpy as np
import pytest

import jax

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.serving import Request
from paligemma_tpu.runtime.serving_paged import PagedServingEngine

CFG = tiny_test_config()


def _req(rid, seed, n_txt, max_new, repeat_prompt=False):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    if repeat_prompt:
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


def _run(params, reqs, n_pages=16, max_slots=2, **kw):
    eng = PagedServingEngine(
        params, CFG, max_slots=max_slots, max_seq_len=64, page_size=16,
        n_pages=n_pages, use_flash=False, **kw,
    )
    for r in reqs:
        eng.submit(r)
    eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in reqs}, eng


@pytest.fixture(scope="module")
def params():
    return paligemma.init_params(jax.random.PRNGKey(0), CFG)


def test_spec_paged_matches_plain_paged(params):
    mk = lambda: [
        _req(0, 1, 6, 8), _req(1, 2, 9, 5, repeat_prompt=True),
        _req(2, 3, 4, 7), _req(3, 4, 6, 3),
    ]
    want, _ = _run(params, mk())
    got, _ = _run(params, mk(), spec_decode=True, spec_draft_k=4,
                  spec_match_n=2)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_spec_paged_budget_exact(params):
    got, _ = _run(params, [_req(0, 5, 4, 11), _req(1, 6, 5, 2)],
                  spec_decode=True, spec_draft_k=3)
    assert len(got[0]) == 11 and len(got[1]) == 2


def test_spec_paged_eos_retires_early(params):
    plain, _ = _run(params, [_req(0, 1, 6, 3)])
    eos = int(plain[0][2])
    r = _req(0, 1, 6, 12)
    r.eos_token_id = eos
    got, _ = _run(params, [r], spec_decode=True, spec_draft_k=4)
    assert got[0][-1] == eos
    assert len(got[0]) <= 4


def test_spec_paged_pipelined_matches_stepwise(params):
    mk = lambda: [_req(0, 1, 6, 9), _req(1, 2, 5, 6, repeat_prompt=True)]
    a, _ = _run(params, mk(), spec_decode=True, pipeline=False)
    b, _ = _run(params, mk(), spec_decode=True, pipeline=True)
    for rid in a:
        np.testing.assert_array_equal(a[rid], b[rid])


def test_spec_paged_preemption_recompute(params):
    """A pool too small for both rows' speculative overshoot forces a
    preemption; the recompute path must reproduce exact tokens."""
    mk = lambda: [_req(0, 1, 4, 12), _req(1, 2, 5, 12)]
    want, _ = _run(params, mk(), n_pages=32)  # roomy: no preemption
    got, eng = _run(params, mk(), n_pages=7, spec_decode=True,
                    spec_draft_k=3)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_spec_paged_cross_page_verify(params):
    """Prompt length one below a page boundary: the very first verify
    block straddles two pages (write + attend across the seam)."""
    n_img = CFG.vision_config.num_patches
    r = _req(0, 9, 15 - n_img, 9)  # prompt 15 of page_size 16
    assert len(r.input_ids) == 15
    want, _ = _run(params, [_req(0, 9, 15 - n_img, 9)])
    got, _ = _run(params, [r], spec_decode=True, spec_draft_k=4)
    np.testing.assert_array_equal(got[0], want[0])


def test_spec_paged_under_tp_mesh_matches_single_chip(params):
    """Pure-TP paged speculation (round 3): the verify forward is plain
    XLA, so Megatron weight shardings + the replicated pool shard every
    cycle via GSPMD — tokens bit-identical to the single-chip engine."""
    from paligemma_tpu.core import mesh as mesh_lib

    mk = lambda: [_req(0, 5, 9, 9, repeat_prompt=True), _req(1, 6, 5, 7)]
    want, _ = _run(params, mk(), spec_decode=True, spec_draft_k=4)
    for model in (2, 4):
        mesh = mesh_lib.make_mesh(data=1, model=model)
        got, _ = _run(params, mk(), spec_decode=True, spec_draft_k=4,
                      mesh=mesh)
        for rid in want:
            np.testing.assert_array_equal(
                got[rid], want[rid], err_msg=f"model={model} rid={rid}"
            )


def test_spec_paged_under_dp_mesh_matches_single_chip(params):
    """Pure-DP paged speculation (round 4): each data shard runs the
    verify cycle on its own slots/pool chunk under shard_map (shard-local
    page ids); propose/accept bookkeeping rides the sharded state arrays.
    Tokens bit-identical to the single-chip spec engine."""
    from paligemma_tpu.core import mesh as mesh_lib

    mk = lambda: [
        _req(0, 5, 9, 9, repeat_prompt=True), _req(1, 6, 5, 7),
        _req(2, 7, 6, 8), _req(3, 8, 4, 5),
    ]
    want, _ = _run(params, mk(), n_pages=32, max_slots=4,
                   spec_decode=True, spec_draft_k=4)
    mesh = mesh_lib.make_mesh(data=2, model=1)
    got, _ = _run(params, mk(), n_pages=32, max_slots=4,
                  spec_decode=True, spec_draft_k=4, mesh=mesh)
    for rid in want:
        np.testing.assert_array_equal(
            got[rid], want[rid], err_msg=f"rid={rid}"
        )


def test_spec_paged_dp_preemption_recompute(params):
    """A per-shard pool too small for both of a shard's rows forces a
    shard-local preemption mid-speculation; recompute reproduces exact
    tokens."""
    from paligemma_tpu.core import mesh as mesh_lib

    mk = lambda: [_req(i, i + 1, 4, 10) for i in range(4)]
    want, _ = _run(params, mk(), n_pages=64, max_slots=4)
    mesh = mesh_lib.make_mesh(data=2, model=1)
    got, eng = _run(params, mk(), n_pages=14, max_slots=4,
                    spec_decode=True, spec_draft_k=3, mesh=mesh)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_spec_paged_under_dp_tp_mesh_matches_single_chip(params):
    """DP2 x TP2 paged speculation (round 4): the verify shard_map is
    manual over "data" only (jax.shard_map axis_names), so page ids stay
    shard-local while GSPMD partitions each shard's verify forward over
    "model" via the Megatron weight shardings — the last hole in the
    TP/DP x dense/paged x spec matrix. Tokens bit-identical to the
    single-chip spec engine."""
    from paligemma_tpu.core import mesh as mesh_lib

    mk = lambda: [
        _req(0, 5, 9, 9, repeat_prompt=True), _req(1, 6, 5, 7),
        _req(2, 7, 6, 8), _req(3, 8, 4, 5),
    ]
    want, _ = _run(params, mk(), n_pages=32, max_slots=4,
                   spec_decode=True, spec_draft_k=4)
    mesh = mesh_lib.make_mesh(data=2, model=2)
    got, _ = _run(params, mk(), n_pages=32, max_slots=4,
                  spec_decode=True, spec_draft_k=4, mesh=mesh)
    for rid in want:
        np.testing.assert_array_equal(
            got[rid], want[rid], err_msg=f"rid={rid}"
        )


def test_spec_paged_warmup_precompiles(params):
    eng = PagedServingEngine(
        params, CFG, max_slots=2, max_seq_len=64, page_size=16,
        n_pages=16, use_flash=False, spec_decode=True, spec_draft_k=4,
    )
    n_img = CFG.vision_config.num_patches
    eng.warmup([n_img + 6], batch_sizes=(1, 2))
    r = _req(0, 1, 6, 5)
    eng.submit(r)
    eng.run_to_completion()
    assert len(r.tokens) == 5
