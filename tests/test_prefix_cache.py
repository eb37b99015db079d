"""Exact-match prefix caching on the paged serving engine.

PaliGemma's prefix-LM mask makes the whole image+prompt prefix
bidirectional (ref: modeling_paligemma.py:149-169), so prefix KV reuse is
valid ONLY for byte-identical (input_ids, pixel_values) pairs — any edit
anywhere in the prefix changes every position's KV. The cache therefore
memoizes full prefixes: a hit seats with ZERO prefill work, borrowing the
entry's read-only pages and copying only the partial tail page.
Contract: tokens identical to the uncached engine, fewer prefill calls.
"""

import jax
import numpy as np
import pytest

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.serving import Request
from paligemma_tpu.runtime.serving_paged import PagedServingEngine

CFG = tiny_test_config()


def _req(rid, seed, n_txt, max_new, do_sample=False):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((n_img,), CFG.image_token_index),
         rng.integers(3, 100, (n_txt,))]
    ).astype(np.int32)
    pixels = rng.normal(size=(3, 28, 28)).astype(np.float32)
    return Request(
        request_id=rid, input_ids=ids, pixel_values=pixels,
        max_new_tokens=max_new, do_sample=do_sample, eos_token_id=-1,
    )


def _engine(params, **kw):
    base = dict(max_slots=2, max_seq_len=32, page_size=16, use_flash=False)
    base.update(kw)
    return PagedServingEngine(params, CFG, **base)


def _run(eng, reqs):
    for r in reqs:
        eng.submit(r)
    done = eng.run_to_completion()
    return {r.request_id: list(r.tokens) for r in done}


def test_hit_skips_prefill_same_tokens():
    """The SAME request three times through one slot (serialized, so the
    entry registered by request 1 is visible to 2 and 3): exactly one
    prefill, two hits, identical tokens. seed fixed => identical
    ids + pixels; prompt 8 tokens over page 16 => tail-page-only entry."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)

    plain = _engine(params, max_slots=1)
    want = _run(plain, [_req(i, 7, 4, 5) for i in range(3)])

    cached = _engine(params, max_slots=1, prefix_cache=True)
    got = _run(cached, [_req(i, 7, 4, 5) for i in range(3)])
    assert got == want
    assert cached.cache_hits == 2
    assert cached.prefill_calls == 1 and plain.prefill_calls == 3


def test_page_aligned_prefix_shares_pages():
    """prompt_len == k * page_size: full pages shared (no tail copy) and
    hits still decode correct tokens past the shared region."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    # 4 image + 12 text = 16 tokens = exactly one page
    mk = lambda: [_req(i, 11, 12, 6) for i in range(3)]

    want = _run(_engine(params, max_slots=1), mk())
    eng = _engine(params, max_slots=1, prefix_cache=True)
    got = _run(eng, mk())
    assert got == want
    assert eng.cache_hits == 2
    (entry,) = eng._pcache.values()
    assert entry["tail_page"] is None and len(entry["full_pages"]) == 1


def test_distinct_prompts_do_not_collide():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [_req(0, 1, 4, 5), _req(1, 2, 4, 5), _req(2, 1, 4, 5)]
    ref = [_req(0, 1, 4, 5), _req(1, 2, 4, 5), _req(2, 1, 4, 5)]

    want = _run(_engine(params), ref)
    eng = _engine(params, prefix_cache=True)
    got = _run(eng, reqs)
    assert got == want
    assert eng.cache_hits == 1  # only the seed-1 repeat hits


def test_eviction_under_pool_pressure():
    """A tiny pool: unreferenced entries are evicted so live requests can
    still grow; everything completes with the uncached engine's tokens."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [_req(0, 5, 4, 20), _req(1, 6, 4, 20), _req(2, 5, 4, 20)]
    ref = [_req(0, 5, 4, 20), _req(1, 6, 4, 20), _req(2, 5, 4, 20)]

    want = _run(_engine(params, max_seq_len=64, n_pages=32), ref)
    eng = _engine(
        params, prefix_cache=True, max_seq_len=64, n_pages=8, sync_every=4,
    )
    got = _run(eng, reqs)
    assert got == want


def test_sampling_hits_reuse_logits():
    """do_sample hits resume from the stored logits row: same RNG stream =>
    same tokens as the uncached engine."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [
        Request(
            request_id=i, input_ids=_req(0, 3, 4, 4).input_ids,
            pixel_values=_req(0, 3, 4, 4).pixel_values,
            max_new_tokens=4, do_sample=True, temperature=0.7, top_p=0.9,
            eos_token_id=-1,
        )
        for i in range(2)
    ]
    want = _run(_engine(params, max_slots=1), mk())
    eng = _engine(params, max_slots=1, prefix_cache=True)
    got = _run(eng, mk())
    assert got == want and eng.cache_hits == 1


def test_same_wave_duplicates_coalesce():
    """FOUR identical requests admitted in ONE wave: the leader prefills
    (a batch-1 call), the three followers defer a scheduler pass and seat
    from its freshly-registered entry — one prefill call, three hits,
    tokens identical to the uncached engine (serving.py _fill_slots /
    serving_paged._wave_key)."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [_req(i, 9, 4, 5) for i in range(4)]

    want = _run(_engine(params, max_slots=4, n_pages=16), mk())
    eng = _engine(params, max_slots=4, n_pages=16, prefix_cache=True)
    got = _run(eng, mk())
    assert got == want
    assert eng.prefill_calls == 1 and eng.cache_hits == 3


def test_same_wave_mixed_uniques_coalesce():
    """2 unique prompts x 2 copies in one wave: both uniques prefill in one
    grouped batch, each duplicate seats from its own leader's entry."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [_req(i, seed, 4, 5) for i, seed in enumerate((1, 2, 1, 2))]

    want = _run(_engine(params, max_slots=4, n_pages=16), mk())
    eng = _engine(params, max_slots=4, n_pages=16, prefix_cache=True)
    got = _run(eng, mk())
    assert got == want
    assert eng.prefill_calls == 1 and eng.cache_hits == 2


def test_prefix_cache_under_dp_mesh():
    """Round 4: prefix cache on a DP2 paged mesh. Entries are shard-local
    (their pages live in one shard's pool chunk), hits pin admission to
    the owning shard, tail-page copies run the DP read-modify-write.
    Tokens match the uncached DP engine; repeats of the same prompt hit."""
    from paligemma_tpu.core.mesh import make_mesh

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [_req(0, 7, 4, 5), _req(1, 9, 6, 4),
                  _req(2, 7, 4, 5), _req(3, 7, 4, 5)]

    plain = _engine(params, max_slots=2, n_pages=16, mesh=make_mesh(2, 1))
    want = _run(plain, mk())

    cached = _engine(params, max_slots=2, n_pages=16, mesh=make_mesh(2, 1),
                     prefix_cache=True)
    got = _run(cached, mk())
    assert got == want
    # requests 2 and 3 repeat request 0's (seed 7) prompt: at least one
    # must hit (both, unless same-wave coalescing already merged them)
    assert cached.cache_hits >= 1
    assert cached.prefill_calls < plain.prefill_calls
    # the entry's shard tag matches where its pages were allocated
    for e in cached._pcache.values():
        assert 0 <= e["shard"] < cached.paged.n_shards


def test_prefix_cache_under_dp_tp_mesh():
    """DP2 x TP2: the tail-page copy's shard_map goes manual over "data"
    only (axis_names), GSPMD partitions the model axis inside each shard.
    Request 1 outlives request 0 so the entry's shard (0) has the free
    slot when the repeat (request 2) admits — the hit pins there."""
    from paligemma_tpu.core.mesh import make_mesh

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [_req(0, 7, 4, 5), _req(1, 9, 6, 9), _req(2, 7, 4, 5)]

    plain = _engine(params, max_slots=2, n_pages=16)
    want = _run(plain, mk())

    cached = _engine(params, max_slots=2, n_pages=16, mesh=make_mesh(2, 2),
                     prefix_cache=True)
    got = _run(cached, mk())
    assert got == want
    assert cached.cache_hits >= 1


def test_prefix_cache_dp_spill_to_other_shard_still_correct():
    """When the entry's shard has NO free slot at admit time, the repeat
    spills to the other shard as a normal prefill (no stall, no
    cross-shard borrow) — a miss, but tokens stay correct."""
    from paligemma_tpu.core.mesh import make_mesh

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    # request 1 (shard 1) finishes FIRST, so the repeat of request 0's
    # prompt can only seat on shard 1 while the entry lives on shard 0
    mk = lambda: [_req(0, 7, 4, 5), _req(1, 9, 6, 4), _req(2, 7, 4, 5)]

    plain = _engine(params, max_slots=2, n_pages=16)
    want = _run(plain, mk())

    cached = _engine(params, max_slots=2, n_pages=16, mesh=make_mesh(2, 1),
                     prefix_cache=True)
    got = _run(cached, mk())
    assert got == want  # spilled hit degrades to a prefill, never corrupts


# ---------------------------------------------------------------------------
# DENSE engine prefix cache (round 4: VERDICT item 7 — the recommended TP
# configuration gets prefill reuse too; entries are standalone KV row
# copies seated by one dynamic_update_slice per slab)
# ---------------------------------------------------------------------------
from paligemma_tpu.runtime.serving import ServingEngine


def _dense_engine(params, **kw):
    base = dict(max_slots=2, max_seq_len=32, use_flash=False)
    base.update(kw)
    return ServingEngine(params, CFG, **base)


def test_dense_hit_skips_prefill_same_tokens():
    """The SAME request three times through one slot (serialized, so the
    entry registered by request 1 is visible to 2 and 3): exactly one
    prefill, two hits, identical tokens."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mk = lambda: [_req(i, 7, 8, 6) for i in range(3)]
    plain = _dense_engine(params, max_slots=1)
    want = _run(plain, mk())

    cached = _dense_engine(params, prefix_cache=True, max_slots=1)
    got = _run(cached, mk())
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])
    assert cached.cache_hits == 2
    assert cached.prefill_calls == 1


def test_dense_distinct_prompts_do_not_collide():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = _dense_engine(params, prefix_cache=True, max_slots=1)
    reqs = [_req(0, 1, 8, 5), _req(1, 2, 8, 5), _req(2, 1, 8, 5)]
    got = _run(eng, reqs)
    assert eng.cache_hits == 1  # only the seed-1 repeat hits
    # distinct prompts produce distinct (cached-correct) streams
    plain = _dense_engine(params, max_slots=1)
    want = _run(plain, [_req(0, 1, 8, 5), _req(1, 2, 8, 5),
                        _req(2, 1, 8, 5)])
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_dense_same_wave_duplicates_coalesce():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = _dense_engine(params, prefix_cache=True, max_slots=4)
    reqs = [_req(i, 9, 8, 5) for i in range(4)]  # byte-identical wave
    got = _run(eng, reqs)
    assert eng.prefill_calls == 1 and eng.cache_hits == 3
    vals = list(got.values())
    for v in vals[1:]:
        np.testing.assert_array_equal(v, vals[0])


def test_dense_lru_eviction_at_capacity():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = _dense_engine(params, prefix_cache=True, prefix_cache_entries=1,
                        max_slots=1)
    _run(eng, [_req(0, 1, 8, 4), _req(1, 2, 8, 4), _req(2, 1, 8, 4)])
    # seed-1 entry was evicted by seed-2 before request 2 arrived
    assert eng.cache_hits == 0
    assert len(eng._dense_pcache) == 1


def test_dense_prefix_cache_under_tp_mesh():
    """The recommended dense-TP serving config gets prefill reuse: hits
    seat sharded KV rows under GSPMD, tokens identical."""
    from paligemma_tpu.core.mesh import make_mesh

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(1, 2)
    plain = _dense_engine(params, max_slots=1, mesh=mesh)
    want = _run(plain, [_req(i, 5, 8, 5) for i in range(2)])
    eng = _dense_engine(params, prefix_cache=True, max_slots=1, mesh=mesh)
    got = _run(eng, [_req(i, 5, 8, 5) for i in range(2)])
    assert eng.cache_hits == 1 and eng.prefill_calls == 1
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_dense_spec_hit_keeps_speculating():
    """A dense hit seeds the n-gram history/budget device state from the
    request's own ids, so spec decoding continues across cache seats."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    plain = _dense_engine(params, max_slots=1)
    want = _run(plain, [_req(i, 3, 9, 6) for i in range(2)])
    eng = _dense_engine(params, prefix_cache=True, max_slots=1,
                        spec_decode=True, spec_draft_k=3)
    got = _run(eng, [_req(i, 3, 9, 6) for i in range(2)])
    assert eng.cache_hits == 1
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])
