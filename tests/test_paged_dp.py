"""Data-parallel paged serving: slots + page pool sharded over "data".

Round-3 DP mode (runtime/serving_paged.py): each data shard owns
``max_slots/data`` slots and ``n_pages/data`` physical pages with its own
host-side allocator; page-table entries are shard-LOCAL ids; admission pins
requests to the shard whose budget covered them; preemption is per-shard.
Contract: identical greedy tokens to the single-chip paged engine.

The reference's only distribution is a 25-line gloo DDP demo
(ref: test.py:6-25); serving-side data parallelism has no analog there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.core.config import (
    GemmaConfig,
    PaliGemmaConfig,
    SiglipVisionConfig,
    tiny_test_config,
)
from paligemma_tpu.core.mesh import make_mesh
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.paged_cache import PagedKVCache
from paligemma_tpu.runtime.serving import Request
from paligemma_tpu.runtime.serving_paged import PagedServingEngine

CFG = tiny_test_config()


def _req(rid, seed, n_txt, max_new):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((n_img,), CFG.image_token_index),
         rng.integers(3, 100, (n_txt,))]
    ).astype(np.int32)
    pixels = rng.normal(size=(3, 28, 28)).astype(np.float32)
    return Request(
        request_id=rid, input_ids=ids, pixel_values=pixels,
        max_new_tokens=max_new, do_sample=False, eos_token_id=-1,
    )


# ---------------------------------------------------------------------------
# Sharded page cache bookkeeping
# ---------------------------------------------------------------------------
def test_paged_cache_shards_are_independent():
    cache = PagedKVCache(
        CFG.text_config, n_pages=16, page_size=16, max_slots=4,
        max_pages_per_slot=4, n_shards=2,
    )
    assert cache.slots_per_shard == 2 and cache.pages_per_shard == 8
    assert cache.shard_of(0) == 0 and cache.shard_of(3) == 1
    # each shard reserves its own local garbage page 0 -> 7 usable pages
    assert cache.free_pages(0) == 7 and cache.free_pages(1) == 7

    # slot 0 (shard 0) and slot 2 (shard 1) allocate independently and both
    # get LOCAL ids starting above their shard's garbage page
    assert cache.grow_to(0, 32)  # 2 pages on shard 0
    assert cache.grow_to(2, 48)  # 3 pages on shard 1
    assert cache.free_pages(0) == 5 and cache.free_pages(1) == 4
    assert all(0 < p < 8 for p in cache.slot_pages(0))
    assert all(0 < p < 8 for p in cache.slot_pages(2))

    # exhausting shard 1 leaves shard 0 untouched
    assert cache.grow_to(3, 4 * 16)
    assert not cache.grow_to(2, 4 * 16)  # shard 1 out of pages
    assert cache.grow_to(1, 4 * 16)  # shard 0 still has room
    cache.release(2)
    assert cache.free_pages(1) == 3  # slot 3 still holds its 4 pages
    assert np.all(cache._table_np[2] == 0)


def test_paged_cache_single_shard_unchanged():
    cache = PagedKVCache(
        CFG.text_config, n_pages=8, page_size=16, max_slots=2,
        max_pages_per_slot=4,
    )
    assert cache.alloc.free_pages == 7  # legacy accessor still works
    assert cache.free_pages() == 7
    assert cache.shard_of(1) == 0


# ---------------------------------------------------------------------------
# Pure-DP engine (model == 1): per-shard single-chip kernels
# ---------------------------------------------------------------------------
def _run_engine(params, mesh, max_slots, reqs, **kw):
    eng = PagedServingEngine(
        params, CFG, max_slots=max_slots, max_seq_len=32, page_size=16,
        use_flash=False, mesh=mesh, **kw,
    )
    for r in reqs:
        eng.submit(r)
    done = eng.run_to_completion()
    return eng, {r.request_id: list(r.tokens) for r in done}


def test_dp_paged_matches_single_chip():
    """DP2 over 4 slots: same greedy tokens as the single-chip paged
    engine, through the real scheduler (grouped prefills, slot churn:
    6 requests through 4 slots)."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [_req(i, 10 + i, 3 + (i % 4), 3 + (i % 3)) for i in range(6)]

    _, want = _run_engine(params, None, 4, mk())
    eng, got = _run_engine(params, make_mesh(2, 1), 4, mk())
    assert eng.dp == 2 and eng.paged.n_shards == 2
    assert got == want


def test_dp_admission_spreads_shards():
    """Admission pins requests to the shard whose budget covered them —
    with equal budgets, slots land on both shards."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = PagedServingEngine(
        params, CFG, max_slots=4, max_seq_len=32, page_size=16,
        use_flash=False, mesh=make_mesh(2, 1),
    )
    for i in range(4):
        eng.submit(_req(i, 20 + i, 3, 8))
    eng._fill_slots()  # admission only — slots retire within one window
    shards_used = {
        eng.paged.shard_of(s)
        for s, r in enumerate(eng.slots) if r is not None
    }
    assert shards_used == {0, 1}
    eng.run_to_completion()


def test_dp_preemption_stays_on_shard():
    """A shard running out of pages preempts its own youngest request
    (recompute re-queue); tokens still match the unconstrained single-chip
    run. Mirrors test_paged_engine_preemption_recompute per shard: 8-token
    prompts admit 2 slots/shard into 4 usable pages/shard, but 40 new
    tokens each need 3 pages -> the shards must evict."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [_req(i, 30 + i, 4, 40) for i in range(4)]
    ref = [_req(i, 30 + i, 4, 40) for i in range(4)]

    def run(mesh, n_pages):
        eng = PagedServingEngine(
            params, CFG, max_slots=4, max_seq_len=64, page_size=16,
            n_pages=n_pages, sync_every=4, use_flash=False, mesh=mesh,
        )
        rs = ref if mesh is None else reqs
        for r in rs:
            eng.submit(r)
        done = eng.run_to_completion()
        return eng, {r.request_id: list(r.tokens) for r in done}

    _, want = run(None, 32)  # roomy single-chip pool: no preemption
    eng, got = run(make_mesh(2, 1), 10)  # 5/shard, 4 usable
    assert got == want
    assert eng.preemptions >= 1


def test_dp_requires_divisible_slots():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    with pytest.raises(AssertionError):
        PagedServingEngine(
            params, CFG, max_slots=3, max_seq_len=32, page_size=16,
            mesh=make_mesh(2, 1), use_flash=False,
        )


# ---------------------------------------------------------------------------
# DP x TP (both axes > 1): fused TP paged kernels per shard
# ---------------------------------------------------------------------------
def _tp_cfg(vocab=256):
    return PaliGemmaConfig(
        vision_config=SiglipVisionConfig(
            image_size=28, patch_size=14, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, projection_dim=256,
        ),
        text_config=GemmaConfig(
            vocab_size=vocab, hidden_size=256, intermediate_size=2048,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=1, head_dim=256,
            max_position_embeddings=256,
        ),
        projection_dim=256, hidden_size=256, image_token_index=250,
        vocab_size=vocab,
    )


def _tp_req(cfg, rid, seed, n_txt, n_new):
    r = np.random.default_rng(seed)
    n_img = cfg.vision_config.num_patches
    ids = np.concatenate(
        [np.full((n_img,), cfg.image_token_index),
         r.integers(3, 240, (n_txt,))]
    ).astype(np.int32)
    return Request(
        request_id=rid, input_ids=ids,
        pixel_values=r.normal(size=(3, 28, 28)).astype(np.float32),
        max_new_tokens=n_new, do_sample=False, eos_token_id=-1,
    )


def test_dp_tp_paged_matches_single_chip():
    """DP2 x TP2 on the per-layer TP paged kernels: same greedy tokens as
    the single-chip paged engine."""
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    cfg = _tp_cfg()
    params = paligemma.init_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    q = quantize_lm_for_serving(params)

    def run(mesh, expect_kernel):
        eng = PagedServingEngine(
            q, cfg, max_slots=2, max_seq_len=64, page_size=16,
            use_flash=False, mesh=mesh,
        )
        assert eng.paged_kernel == expect_kernel
        for i in range(3):
            eng.submit(_tp_req(cfg, i, i + 50, 3 + i, 4))
        done = eng.run_to_completion()
        return {r.request_id: list(r.tokens) for r in done}

    want = run(None, "fused")
    got = run(make_mesh(2, 2), "fused_tp")
    assert got == want


def test_dp_tp_off_geometry_xla_fallback_matches_single_chip():
    """bf16 weights (no int8 qkv repack) can't run the fused TP paged
    kernels; DP x TP falls back to the XLA page-walk tick under a
    data-manual shard_map (axis_names) with GSPMD partitioning the model
    axis inside each shard — same greedy tokens as single-chip (round 4;
    previously a hard error)."""
    cfg = _tp_cfg()
    params = paligemma.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)

    def run(mesh, expect_kernel):
        eng = PagedServingEngine(
            params, cfg, max_slots=2, max_seq_len=64, page_size=16,
            use_flash=False, mesh=mesh,
        )
        assert eng.paged_kernel == expect_kernel
        for i in range(3):
            eng.submit(_tp_req(cfg, i, i + 50, 3 + i, 4))
        done = eng.run_to_completion()
        return {r.request_id: list(r.tokens) for r in done}

    want = run(None, "multi")  # bf16: fused degrades to the page walk
    got = run(make_mesh(2, 2), "xla")
    assert got == want
