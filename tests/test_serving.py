"""Continuous-batching engine tests: slot reuse, queueing, and per-request
token parity with the single-request engine."""

import numpy as np

import jax
import jax.numpy as jnp

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.serving import Request, ServingEngine
from paligemma_tpu.models import paligemma

CFG = tiny_test_config()


def _req(rid, seed, n_txt, max_new):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((n_img,), CFG.image_token_index), rng.integers(3, 100, (n_txt,))]
    ).astype(np.int32)
    pixels = rng.normal(size=(3, 28, 28)).astype(np.float32)
    return Request(
        request_id=rid, input_ids=ids, pixel_values=pixels,
        max_new_tokens=max_new, do_sample=False, eos_token_id=-1,
    )


def test_continuous_batching_matches_single_request():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    serving = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                            use_flash=False)
    reqs = [_req(0, 1, 4, 6), _req(1, 2, 7, 4), _req(2, 3, 4, 5)]
    for r in reqs:
        serving.submit(r)
    done = serving.run_to_completion()
    assert len(done) == 3 and all(r.done for r in done)

    single = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=False)
    for r in reqs:
        want = single.generate(
            jnp.asarray(r.pixel_values)[None],
            jnp.asarray(r.input_ids)[None],
            jnp.ones((1, len(r.input_ids)), jnp.int32),
            max_new_tokens=r.max_new_tokens, do_sample=False, eos_token_id=-1,
        )[0]
        np.testing.assert_array_equal(np.asarray(r.tokens), want)


def test_eos_retires_slot_early():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    single = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=False)
    r0 = _req(0, 1, 4, 8)
    # find what the 2nd greedy token is, then use it as the EOS id
    probe = single.generate(
        jnp.asarray(r0.pixel_values)[None], jnp.asarray(r0.input_ids)[None],
        jnp.ones((1, len(r0.input_ids)), jnp.int32),
        max_new_tokens=2, do_sample=False, eos_token_id=-1,
    )[0]
    eos = int(probe[1])

    serving = ServingEngine(params, CFG, max_slots=1, max_seq_len=32,
                            use_flash=False)
    r = _req(0, 1, 4, 8)
    r.eos_token_id = eos
    serving.submit(r)
    done = serving.run_to_completion()
    assert done[0].tokens[-1] == eos
    assert len(done[0].tokens) <= 3


def test_queueing_beyond_slots():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    serving = ServingEngine(params, CFG, max_slots=1, max_seq_len=32,
                            use_flash=False)
    for i in range(3):
        serving.submit(_req(i, 10 + i, 4, 3))
    done = serving.run_to_completion()
    assert sorted(r.request_id for r in done) == [0, 1, 2]
    assert all(len(r.tokens) == 3 for r in done)


def test_serving_with_int8_decode_params():
    """Split precision in the server: bf16 prefill + int8 decode."""
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_lm_for_serving(params)
    serving = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                            use_flash=False, decode_params=qparams)
    reqs = [_req(0, 1, 4, 4), _req(1, 2, 6, 4)]
    for r in reqs:
        serving.submit(r)
    done = serving.run_to_completion()
    assert len(done) == 2 and all(len(r.tokens) == 4 for r in done)


def test_timed_engine_metrics():
    from paligemma_tpu.runtime.metrics import TimedEngine

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = TimedEngine(PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=False))
    r = _req(0, 1, 4, 3)
    lo, st = eng.prefill(
        jnp.asarray(r.pixel_values)[None], jnp.asarray(r.input_ids)[None],
        jnp.ones((1, len(r.input_ids)), jnp.int32),
    )
    for _ in range(3):
        tok = jnp.argmax(lo, -1).astype(jnp.int32)
        lo, st = eng.decode_step(tok, st)
    s = eng.stats.summary()
    assert s["ttft_ms"] > 0 and s["steps"] == 3
    assert s["decode_tokens_per_sec"] > 0


def test_serving_under_tp_mesh():
    """int8 continuous-batched serving sharded over a TP mesh (the BASELINE
    v5e-8 serving configuration, tested on the virtual CPU mesh)."""
    from paligemma_tpu.core import mesh as mesh_lib
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_lm_for_serving(params)

    plain = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                          use_flash=False, decode_params=qparams)
    reqs = [_req(0, 1, 4, 4), _req(1, 2, 6, 4), _req(2, 3, 5, 3)]
    for r in reqs:
        plain.submit(r)
    want = {r.request_id: list(r.tokens) for r in plain.run_to_completion()}

    mesh = mesh_lib.make_mesh(data=1, model=4)
    sharded = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                            use_flash=False, decode_params=qparams, mesh=mesh)
    reqs2 = [_req(0, 1, 4, 4), _req(1, 2, 6, 4), _req(2, 3, 5, 3)]
    for r in reqs2:
        sharded.submit(r)
    got = {r.request_id: list(r.tokens) for r in sharded.run_to_completion()}
    assert got == want


def test_warmup_compiles_shapes():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                        use_flash=False)
    eng.warmup(prompt_lens=[10, 20], batch_sizes=(1, 2))
    r = _req(0, 1, 4, 3)
    eng.submit(r)
    done = eng.run_to_completion()
    assert len(done) == 1 and len(done[0].tokens) == 3


def test_warmup_precompiles_everything():
    """After warmup() covering the request's (batch, bucket) shape, the
    first real wave — prefill, insert, AND the decode tick — triggers
    zero new XLA compiles."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=64,
                        use_flash=False)
    # prompt is 4 image + 4 text = 8 tokens -> bucket 64 (rounded to 64 cap),
    # batch 1; warm exactly that shape
    eng.warmup(prompt_lens=[8], batch_sizes=(1,))
    sizes = {
        "prefill": eng._prefill_batch._cache_size(),
        "insert": eng._insert_batch._cache_size(),
        "decode": eng._decode_window._cache_size(),
    }
    assert all(v > 0 for v in sizes.values()), sizes

    eng.submit(_req(0, 1, 4, 3))
    done = eng.run_to_completion()
    assert len(done) == 1 and len(done[0].tokens) == 3
    after = {
        "prefill": eng._prefill_batch._cache_size(),
        "insert": eng._insert_batch._cache_size(),
        "decode": eng._decode_window._cache_size(),
    }
    assert after == sizes, (sizes, after)


def test_submit_rejects_overlong_prompt():
    import pytest

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, max_slots=1, max_seq_len=16,
                        use_flash=False)
    bad = _req(0, 1, 20, 2)  # 4 image + 20 text = 24 > 16-1
    with pytest.raises(ValueError, match="exceeds the per-slot budget"):
        eng.submit(bad)
    assert not eng.has_work  # scheduler never sees the bad request


def test_serving_tp_mesh_flash_prefill_parity():
    """Flash prefill runs under the serving TP mesh (no silent XLA-attention
    downgrade) and produces the same tokens as the unsharded XLA path."""
    from paligemma_tpu.core import mesh as mesh_lib
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_lm_for_serving(params)

    plain = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                          use_flash=False, decode_params=qparams)
    reqs = [_req(0, 1, 4, 4), _req(1, 2, 6, 4)]
    for r in reqs:
        plain.submit(r)
    want = {r.request_id: list(r.tokens) for r in plain.run_to_completion()}

    # tiny config: 4 q / 2 kv text heads, 4 vision heads -> model=2 shards
    mesh = mesh_lib.make_mesh(data=1, model=2)
    sharded = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                            use_flash=True, decode_params=qparams, mesh=mesh)
    assert sharded.use_flash, "mesh must not downgrade the flash prefill"
    reqs2 = [_req(0, 1, 4, 4), _req(1, 2, 6, 4)]
    for r in reqs2:
        sharded.submit(r)
    got = {r.request_id: list(r.tokens) for r in sharded.run_to_completion()}
    assert got == want


def test_serving_fused_decode_matches_xla():
    """fused_decode=True (grid-over-layers kernel + fused greedy head,
    interpret mode on CPU) must produce identical tokens to the XLA
    engine — including a sampling request mixed into the greedy slots
    (sampled rows read fresh logits; greedy rows ride the carried
    next-token ids)."""
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

    def reqs():
        rng = np.random.default_rng(7)
        n_img = cfg.vision_config.num_patches
        out = []
        for rid, (n_txt, max_new, sample) in enumerate(
            [(4, 6, False), (6, 5, True), (3, 6, False)]
        ):
            ids = np.concatenate(
                [np.full((n_img,), 250), rng.integers(3, 240, (n_txt,))]
            ).astype(np.int32)
            pixels = rng.normal(size=(3, 28, 28)).astype(np.float32)
            out.append(Request(
                request_id=rid, input_ids=ids, pixel_values=pixels,
                max_new_tokens=max_new, do_sample=sample,
                temperature=0.8, top_p=0.9, eos_token_id=-1,
            ))
        return out

    def run(fused):
        eng = ServingEngine(q, cfg, max_slots=2, max_seq_len=64,
                            use_flash=False, fused_decode=fused)
        assert eng.fused_decode == fused
        for r in reqs():
            eng.submit(r)
        done = sorted(eng.run_to_completion(), key=lambda r: r.request_id)
        return [np.asarray(r.tokens) for r in done]

    ref = run(False)
    fus = run(True)
    for a, b in zip(ref, fus):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Pipelined scheduling: dispatch window N+1 before syncing window N
# ---------------------------------------------------------------------------
def test_pipelined_matches_stepwise():
    """run_to_completion(pipeline=True) produces exactly the stepwise
    loop's per-request tokens — greedy tokens depend only on each request's
    own prompt, so the one-window readback lookahead must be invisible."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    reqs_a = [_req(i, 10 + i, 3 + (i % 4), 3 + (i % 5)) for i in range(6)]
    reqs_b = [_req(i, 10 + i, 3 + (i % 4), 3 + (i % 5)) for i in range(6)]

    step_eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                             use_flash=False, sync_every=4)
    for r in reqs_a:
        step_eng.submit(r)
    step_eng.run_to_completion(pipeline=False)

    pipe_eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                             use_flash=False, sync_every=4)
    for r in reqs_b:
        pipe_eng.submit(r)
    done = pipe_eng.run_to_completion(pipeline=True)
    assert len(done) == 6 and all(r.done for r in done)
    for ra, rb in zip(reqs_a, reqs_b):
        np.testing.assert_array_equal(np.asarray(ra.tokens),
                                      np.asarray(rb.tokens))


def test_pipelined_eos_early_stop():
    """EOS hit mid-window under pipelining: the in-flight lookahead
    window's overshoot tokens for the retired request are discarded and the
    final token list still ends exactly at the EOS token."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    single = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=False)
    r0 = _req(0, 1, 4, 12)
    probe = single.generate(
        jnp.asarray(r0.pixel_values)[None], jnp.asarray(r0.input_ids)[None],
        jnp.ones((1, len(r0.input_ids)), jnp.int32),
        max_new_tokens=3, do_sample=False, eos_token_id=-1,
    )[0]
    eos = int(probe[2])

    reqs = [_req(0, 1, 4, 12), _req(1, 2, 5, 6)]
    for r in reqs:
        r.eos_token_id = eos
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                        use_flash=False, sync_every=4)
    for r in reqs:
        eng.submit(r)
    done = eng.run_to_completion(pipeline=True)
    assert len(done) == 2
    r0_done = next(r for r in done if r.request_id == 0)
    assert r0_done.tokens[-1] == eos
    assert eos not in r0_done.tokens[:-1]
    assert len(r0_done.tokens) <= 12


def test_pipelined_budget_never_overruns():
    """Budget exhaustion under pipelining: dispatched-count window sizing
    must stop rows exactly at max_new_tokens — no request ever receives
    more tokens than its budget even with a lookahead window in flight."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    # staggered budgets so rows exhaust at different windows
    reqs = [_req(i, 20 + i, 4, 2 + 3 * i) for i in range(4)]
    eng = ServingEngine(params, CFG, max_slots=4, max_seq_len=32,
                        use_flash=False, sync_every=4)
    for r in reqs:
        eng.submit(r)
    done = eng.run_to_completion(pipeline=True)
    assert len(done) == 4
    for r in reqs:
        assert len(r.tokens) == min(r.max_new_tokens,
                                    32 - len(r.input_ids)), r.request_id


def test_cancel_pending_and_seated():
    """cancel(): a queued request never runs; a seated request stops, its
    slot frees for the queue, and its in-flight tokens are kept."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=32,
                        use_flash=False, sync_every=2)
    reqs = [_req(0, 1, 4, 8), _req(1, 2, 5, 8), _req(2, 3, 4, 5)]
    for r in reqs:
        eng.submit(r)
    assert eng.cancel(2)  # still pending — never seated
    assert reqs[2].done and reqs[2].tokens == []

    eng.step()  # seats 0 and 1, decodes one window
    partial = len(reqs[0].tokens)
    assert eng.cancel(0)
    assert reqs[0].done
    done = eng.run_to_completion()
    ids = {r.request_id for r in done}
    assert ids == {1}  # cancelled requests never appear as finished
    assert len(reqs[1].tokens) == 8
    assert len(reqs[0].tokens) == partial  # nothing accepted post-cancel

    assert not eng.cancel(0)  # already cancelled
    assert not eng.cancel(99)  # unknown


def test_cancel_frees_slot_for_queue():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, max_slots=1, max_seq_len=32,
                        use_flash=False)
    long_req = _req(0, 1, 4, 12)
    queued = _req(1, 2, 5, 4)
    eng.submit(long_req)
    eng.submit(queued)
    eng.step()
    assert eng.cancel(0)
    done = eng.run_to_completion()
    assert {r.request_id for r in done} == {1}
    assert len(queued.tokens) == 4


def test_request_metrics_stamped():
    """Engine stamps submit/seated/first-token/finished; metrics() derives
    client-visible latency numbers."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, max_slots=1, max_seq_len=32,
                        use_flash=False, sync_every=2)
    r = _req(0, 1, 4, 5)
    eng.submit(r)
    eng.run_to_completion()
    m = r.metrics()
    assert set(m) == {"queue_ms", "ttft_ms", "total_ms",
                      "decode_tokens_per_sec"}
    assert 0 <= m["queue_ms"] <= m["ttft_ms"] <= m["total_ms"]
    assert r.t_first_token is not None and r.t_finished is not None
