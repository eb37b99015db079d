"""Multi-LoRA continuous-batching serving (ServingEngine(lora_bank=...)).

Contract: every batch row decodes under ITS OWN adapter (or the base
model) inside one compiled tick — per-row bank gathers in
gemma._lora_delta, ids threaded through prefill and the decode window.
Row tokens must match a single-adapter engine built from merge_lora'd
weights (the fold-in path the export flow uses). The reference serves
one model per process and has no adapter story at all (its fine-tune
pushes merged weights to the hub, ref: Paligemma_FT.ipynb cell 45).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.serving import Request, ServingEngine
from paligemma_tpu.train.lora import init_lora, merge_lora, stack_lora_bank

CFG = tiny_test_config()


def _adapter(seed, rank=4):
    """A LoRA tree with NONZERO deltas (standard init has b == 0)."""
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


def _run(params, reqs, **kw):
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
def adapters():
    return {"x": _adapter(1), "y": _adapter(2)}


def _merged(params, adapter):
    return {**params, "lm": merge_lora(params["lm"], adapter)}


def test_bank_rows_match_merged_single_adapter(params, adapters):
    mk = lambda lora: [_req(0, 1, 6, 8, lora=lora), _req(1, 2, 9, 5, lora=lora),
                       _req(2, 3, 4, 7, lora=lora)]
    want = _run(_merged(params, adapters["x"]), mk(None))
    got = _run(params, mk("x"), lora_bank=adapters)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_mixed_batch_each_row_uses_its_adapter(params, adapters):
    """One wave mixing base + two adapters: each request's tokens match the
    corresponding single-model run."""
    reqs = [_req(0, 1, 6, 6, lora=None), _req(1, 2, 5, 6, lora="x"),
            _req(2, 3, 7, 6, lora="y"), _req(3, 4, 4, 6, lora="x")]
    got = _run(params, reqs, lora_bank=adapters)

    base = _run(params, [_req(0, 1, 6, 6)])
    mx = _run(_merged(params, adapters["x"]),
              [_req(1, 2, 5, 6), _req(3, 4, 4, 6)])
    my = _run(_merged(params, adapters["y"]), [_req(2, 3, 7, 6)])
    np.testing.assert_array_equal(got[0], base[0])
    np.testing.assert_array_equal(got[1], mx[1])
    np.testing.assert_array_equal(got[3], mx[3])
    np.testing.assert_array_equal(got[2], my[2])


def test_adapters_change_tokens(params, adapters):
    """Sanity: the adapters actually alter generation (nonzero deltas), so
    the parity assertions above aren't vacuous."""
    base = _run(params, [_req(0, 1, 6, 8)])
    with_x = _run(params, [_req(0, 1, 6, 8, lora="x")], lora_bank=adapters)
    assert list(base[0]) != list(with_x[0])


def test_unknown_adapter_rejected(params, adapters):
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False, lora_bank=adapters)
    with pytest.raises(ValueError, match="unknown LoRA adapter"):
        eng.submit(_req(0, 1, 4, 4, lora="nope"))
    # ...and an engine WITHOUT a bank rejects any adapter name
    eng2 = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                         use_flash=False)
    with pytest.raises(ValueError, match="unknown LoRA adapter"):
        eng2.submit(_req(0, 1, 4, 4, lora="x"))


def test_rank_mismatch_rejected(adapters):
    with pytest.raises(ValueError, match="rank/shape"):
        stack_lora_bank([adapters["x"], _adapter(3, rank=2)])


def test_sampling_composes_with_lora(params, adapters):
    r = _req(0, 1, 5, 6, lora="x")
    r.do_sample = True
    got = _run(params, [r], lora_bank=adapters)
    assert len(got[0]) == 6


def test_warmup_precompiles_lora_tick(params, adapters):
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False, lora_bank=adapters)
    n_img = CFG.vision_config.num_patches
    eng.warmup([n_img + 6], batch_sizes=(1, 2))
    r = _req(0, 1, 6, 5, lora="y")
    eng.submit(r)
    eng.run_to_completion()
    assert len(r.tokens) == 5


# ---------------------------------------------------------------------------
# multi-LoRA under a mesh (round-4: VERDICT item 4)
# ---------------------------------------------------------------------------
def _run_paged(params, reqs, mesh=None, **kw):
    from paligemma_tpu.runtime.serving_paged import PagedServingEngine

    eng = PagedServingEngine(
        params, CFG, max_slots=2, max_seq_len=64, page_size=16, n_pages=16,
        use_flash=False, mesh=mesh, **kw,
    )
    if mesh is not None:
        assert eng.paged_kernel == "xla"
    for r in reqs:
        eng.submit(r)
    eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in reqs}


def _mixed_lora_reqs():
    return [_req(0, 1, 6, 6, lora=None), _req(1, 2, 5, 6, lora="x"),
            _req(2, 3, 7, 6, lora="y"), _req(3, 4, 4, 6, lora="x")]


@pytest.mark.parametrize("tp", [2, 4])
def test_multilora_under_tp_mesh_dense(params, adapters, tp):
    """Dense engine, pure-TP mesh: per-row adapter gathers ride the GSPMD
    XLA tick (Megatron weight shardings, bank replicated) — tokens match
    the single-chip multi-LoRA engine through the real scheduler."""
    from paligemma_tpu.core.mesh import make_mesh

    want = _run(params, _mixed_lora_reqs(), lora_bank=adapters)
    got = _run(params, _mixed_lora_reqs(), lora_bank=adapters,
               mesh=make_mesh(1, tp))
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


@pytest.mark.parametrize("tp", [2, 4])
def test_multilora_under_tp_mesh_paged(params, adapters, tp):
    """Paged engine, pure-TP mesh: the GSPMD-partitioned page-walk tick
    threads the per-row bank — single-chip restriction lifted (round 4)."""
    from paligemma_tpu.core.mesh import make_mesh

    want = _run_paged(params, _mixed_lora_reqs(), lora_bank=adapters)
    got = _run_paged(params, _mixed_lora_reqs(), lora_bank=adapters,
                     mesh=make_mesh(1, tp))
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_multilora_under_dp_mesh_paged(params, adapters):
    """Paged engine, pure-DP mesh (round 4): the bank replicates into each
    data shard's shard_map tick and per-row adapter ids shard with the
    slots — tokens match the single-chip multi-LoRA engine."""
    from paligemma_tpu.core.mesh import make_mesh
    from paligemma_tpu.runtime.serving_paged import PagedServingEngine

    def run(mesh=None):
        eng = PagedServingEngine(
            params, CFG, max_slots=4, max_seq_len=64, page_size=16,
            n_pages=32, use_flash=False, mesh=mesh, lora_bank=adapters,
        )
        reqs = _mixed_lora_reqs()
        for r in reqs:
            eng.submit(r)
        eng.run_to_completion()
        return {r.request_id: list(r.tokens) for r in reqs}

    want = run()
    got = run(mesh=make_mesh(2, 1))
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_multilora_under_dp_tp_mesh_paged(params, adapters):
    """Paged engine, DP2 x TP2 mesh (round 4): the DP tick's shard_map is
    manual over "data" only (axis_names), so inside each shard GSPMD
    partitions the XLA page-walk tick over "model" via the Megatron weight
    shardings while the replicated bank threads per-row adapters — tokens
    match the single-chip multi-LoRA engine."""
    from paligemma_tpu.core.mesh import make_mesh
    from paligemma_tpu.runtime.serving_paged import PagedServingEngine

    def run(mesh=None):
        eng = PagedServingEngine(
            params, CFG, max_slots=4, max_seq_len=64, page_size=16,
            n_pages=32, use_flash=False, mesh=mesh, lora_bank=adapters,
        )
        if mesh is not None:
            assert eng.paged_kernel == "xla"
        reqs = _mixed_lora_reqs()
        for r in reqs:
            eng.submit(r)
        eng.run_to_completion()
        return {r.request_id: list(r.tokens) for r in reqs}

    want = run()
    got = run(mesh=make_mesh(2, 2))
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])
