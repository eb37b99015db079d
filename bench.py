"""Benchmark: PaliGemma-3B-pt-224 (random weights) on the local chip.

Prints ONE JSON line. Headline: int8 batch-1 KV-cached greedy decode
tokens/sec — the reference's core workload (ref: inference.py:51-87, which
runs it on CPU fp32 with a torch.cat cache and a re-run vision tower every
step). ``extra`` carries bf16 decode, batch-8, 448px (1024 image tokens),
continuous-batching serving aggregate, TTFT, and the kernel smoke tier.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
fraction of the chip's memory-bandwidth speed-of-light: decode is HBM-bound,
SoL tokens/s = HBM_BW / bytes(params touched per token).

Structure: phases run in a fixed order chosen for HBM headroom (the bf16
engine is torn down before the 448px phase re-inits weights), and every
phase is wrapped so one failure never suppresses the headline JSON —
whatever succeeded is reported, failures land in ``extra["failures"]``.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the remote compiler charges 30-300 s per 3B
# executable and ~5 min for the kernel smoke tier; cached executables
# verified to deserialize + run correctly on this tunneled backend. Keyed
# on HLO hash, so code changes miss naturally (never stale).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _sync(x):
    """Force execution of the async chain ending in ``x``.

    On this platform ``block_until_ready`` does not actually synchronize
    (tunneled device); a host readback of one element does.
    """
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


CHUNK = 64


def time_decode(eng, pixels, ids, mask, n_chunks=6, reps=3):
    """Steady-state decode rate over a realistic window: prompt prefill
    (untimed) + n_chunks*CHUNK generated tokens, length-bucketed cache
    windows, one host sync per rep. Every rep replays the same positions;
    rep 0 doubles as the bucket-compile warmer."""
    prompt_len = ids.shape[1]
    best = None
    for rep in range(reps + 1):  # rep 0 warms compiles, untimed
        lg, st = eng.prefill(pixels, ids, mask)
        _sync(lg)
        pos = prompt_len
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            lg, st, toks, done = eng.decode_chunk(
                lg, st, CHUNK, do_sample=False, eos_token_id=-1,
                kv_bucket=eng.kv_bucket_for(pos + CHUNK),
            )
            pos += CHUNK
        _sync(toks)
        dt = time.perf_counter() - t0
        if rep > 0:
            best = dt if best is None else min(best, dt)
    return n_chunks * CHUNK * ids.shape[0] / best


def time_decode_per_step(eng, lg, st, n_steps=100):
    """Round-1 methodology: argmax dispatch + decode dispatch per token
    (kept for comparability; the tunnel adds ~0.3 ms/step here)."""
    l2, s2 = eng.decode_step(jnp.argmax(lg, -1).astype(jnp.int32), st)
    _sync(l2)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            tok = jnp.argmax(l2, axis=-1).astype(jnp.int32)
            l2, s2 = eng.decode_step(tok, s2)
        _sync(l2)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return n_steps * lg.shape[0] / best


def make_inputs(cfg, b):
    n_img = cfg.vision_config.num_patches
    s_txt = 10
    px = cfg.vision_config.image_size
    ids = np.concatenate(
        [np.full((b, n_img), cfg.image_token_index), np.full((b, s_txt), 5)],
        axis=1,
    ).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = np.random.default_rng(0).normal(size=(b, 3, px, px)).astype(
        np.float32
    )
    return jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)


def main():
    from paligemma_tpu.core.config import paligemma_3b_224, paligemma_3b_448
    from paligemma_tpu.models import paligemma
    from paligemma_tpu.runtime.engine import PaliGemmaEngine
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    extra = {"device": str(jax.devices()[0]), "decode_chunk": CHUNK}
    failures = {}

    def attempt(name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            print(f"[bench] {name}: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
            return out
        except Exception as e:  # noqa: BLE001 — recorded, bench continues
            msg = str(e).splitlines()[0][:200] if str(e) else repr(e)[:200]
            failures[name] = f"{type(e).__name__}: {msg}"
            print(f"[bench] {name} FAILED: {failures[name]}", flush=True)
            return None

    # ---- 0) on-chip kernel smoke tier: a Mosaic regression shows up here
    # as a *named* kernel, not a mid-bench crash ----
    def smoke():
        from paligemma_tpu import tpu_smoke

        t = tpu_smoke.run(verbose=False)
        return round(sum(t.values()), 1)

    extra["kernel_smoke_s"] = attempt("tpu_smoke", smoke)

    cfg = paligemma_3b_224()
    key = jax.random.PRNGKey(0)
    params = paligemma.init_params(key, cfg, jnp.bfloat16)
    extra["param_bytes"] = int(
        sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    )

    # 2048-slot cache: the reference's launcher decodes up to 1000 tokens
    # after a 266-token prompt (ref: launch_inference.sh:6), so the honest
    # cache size is >1266. Cache length costs <3% here (docs/PERFORMANCE.md).
    MAX_SEQ = 2048
    extra["max_seq_len"] = MAX_SEQ
    pixels_j, ids_j, mask_j = make_inputs(cfg, 1)
    extra["prefill_len"] = int(ids_j.shape[1])

    # ---- 1) bf16 phase: TTFT + bf16 decode, then tear the engine down ----
    engine = PaliGemmaEngine(params, cfg, max_seq_len=MAX_SEQ, eos_token_id=1)

    def ttft():
        logits, state = engine.prefill(pixels_j, ids_j, mask_j)  # compile
        _sync(logits)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            logits, _ = engine.prefill(pixels_j, ids_j, mask_j)
            _sync(logits)
            dt = (time.perf_counter() - t0) * 1e3
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    extra["ttft_ms"] = attempt("ttft", ttft)
    bf16_tok = attempt(
        "bf16_decode", lambda: time_decode(engine, pixels_j, ids_j, mask_j)
    )
    if bf16_tok:
        extra["bf16_decode_tokens_per_sec"] = round(bf16_tok, 2)

    # int8-quantize while bf16 weights are still resident (chunked — the
    # fp32 temporaries stay small, kernels/quant.py), then drop the bf16
    # engine and its compiled executables BEFORE the int8 phase compiles.
    qparams = attempt("quantize", lambda: quantize_lm_for_serving(params))
    engine = None
    gc.collect()

    # Speed of light: HBM bandwidth / bytes per token (decode is BW-bound).
    # TPU v5e: ~819 GB/s HBM BW. Per decode step: all LM weights + KV cache
    # read; vision weights untouched; the bf16 embedding table is read only
    # via the int8 head copy.
    hbm_bw = 819e9
    sol_tok_per_s = None
    lm_bytes = None
    if qparams is not None:
        lm_bytes = sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(qparams["lm"])
        ) - qparams["lm"]["embed"].size * 2
        sol_tok_per_s = hbm_bw / lm_bytes
        extra["sol_tokens_per_sec"] = round(sol_tok_per_s, 2)

    def batch_sol(b, window):
        """Batched-decode roofline: ONE weight stream per lockstep tick +
        per-row KV window reads (L x window x D x 2 dtypes x 2 tensors).
        Grades batch decode against its own ceiling, not b1's."""
        tc = cfg.text_config
        kv = (
            b * window * tc.head_dim * tc.num_key_value_heads
            * 2 * 2 * tc.num_hidden_layers
        )
        return b * hbm_bw / (lm_bytes + kv)

    # ---- 2) int8 phase: the headline (b1), per-step dispatch, batch-8 ----
    tok_per_s = None
    if qparams is not None:
        qengine = PaliGemmaEngine(
            qparams, cfg, max_seq_len=MAX_SEQ, eos_token_id=1
        )
        tok_per_s = attempt(
            "int8_b1", lambda: time_decode(qengine, pixels_j, ids_j, mask_j)
        )

        def per_step():
            lg, st = qengine.prefill(pixels_j, ids_j, mask_j)
            return round(time_decode_per_step(qengine, lg, st), 2)

        extra["int8_per_step_dispatch_tokens_per_sec"] = attempt(
            "int8_per_step", per_step
        )

        def b8():
            p8, i8, m8 = make_inputs(cfg, 8)
            rate = round(time_decode(qengine, p8, i8, m8, n_chunks=6), 2)
            # mean window over the timed chunks (pow2 buckets >= 512)
            pl_ = i8.shape[1]
            wins = [
                qengine.kv_bucket_for(pl_ + (c + 1) * CHUNK) or MAX_SEQ
                for c in range(6)
            ]
            sol = batch_sol(8, sum(wins) / len(wins))
            extra["sol_b8_tokens_per_sec"] = round(sol, 1)
            extra["b8_vs_sol"] = round(rate / sol, 4)
            return rate

        extra["int8_batch8_decode_tokens_per_sec"] = attempt("int8_b8", b8)

        def b16():
            # device-graded 16-row lockstep decode — the dense SERVING
            # tick's core (same fused kernels, cache writes, head) timed
            # through the engine's chunked windows. This, not a wall
            # difference of serving waves, is the number to grade against
            # the serving SoL: the pipelined scheduler overlaps device
            # ticks with host work, so wave-time differences measure host
            # MARGINAL cost and can read far above SoL (r5 run logs:
            # 9k-17k "tok/s").
            p16, i16, m16 = make_inputs(cfg, 16)
            rate = round(time_decode(qengine, p16, i16, m16, n_chunks=4), 2)
            pl_ = i16.shape[1]
            wins = [
                qengine.kv_bucket_for(pl_ + (c + 1) * CHUNK) or MAX_SEQ
                for c in range(4)
            ]
            sol = batch_sol(16, sum(wins) / len(wins))
            extra["sol_b16_tokens_per_sec"] = round(sol, 1)
            extra["b16_vs_sol"] = round(rate / sol, 4)
            return rate

        extra["int8_batch16_decode_tokens_per_sec"] = attempt(
            "int8_b16", b16
        )

        def spec():
            # n-gram speculative decoding (device-resident prompt lookup):
            # tokens identical to greedy; rate depends on output
            # repetitiveness (random weights decode into loops, so this is
            # the near-full-acceptance regime — see docs/PERFORMANCE.md)
            best = None
            for rep in range(3):
                t0 = time.perf_counter()
                out = qengine.generate_spec(
                    pixels_j, ids_j, mask_j, max_new_tokens=256,
                    eos_token_id=-1, draft_k=8, match_n=2,
                )
                dt = time.perf_counter() - t0
                if rep:
                    best = dt if best is None else min(best, dt)
            extra["spec_accepted_per_cycle"] = round(
                out.shape[1] / qengine.spec_cycles, 2
            )
            return round(out.shape[1] / best, 2)

        extra["int8_spec_decode_tokens_per_sec"] = attempt("spec", spec)

        def spec_curve():
            # acceptance-controlled points between the near-full-acceptance
            # headline above and the zero-acceptance floor: corrupt_frac
            # deterministically rejects draft positions on device, tokens
            # stay greedy-identical (tests/test_spec_acceptance.py)
            pts = {}
            for frac in (0.25, 0.5, 0.75):
                best = None
                for rep in range(2):
                    t0 = time.perf_counter()
                    out = qengine.generate_spec(
                        pixels_j, ids_j, mask_j, max_new_tokens=192,
                        eos_token_id=-1, draft_k=8, match_n=2,
                        corrupt_frac=frac,
                    )
                    dt = time.perf_counter() - t0
                    if rep:
                        best = dt if best is None else min(best, dt)
                acc = round((out.shape[1] - 1) / qengine.spec_cycles, 2)
                pts[f"acc_{acc}"] = round(out.shape[1] / best, 1)
            return pts

        extra["spec_tokens_per_sec_by_acceptance"] = attempt(
            "spec_curve", spec_curve
        )
        qengine = None
        gc.collect()

    # ---- 3) serving: continuous batching at equal KV HBM (dense 16 slots
    # x 512 == paged 128-page pool), each engine timed at ITS OWN
    # steady-state concurrency with a prefill/decode split. Timed waves:
    # max_new=1 reports prefill+insert (tP, includes per-request sync);
    # decode tok/s differences the 64- and 32-token waves (identical
    # seat/sync structure, prefill cancels). (round-3 regime bug: paged
    # submitted 24 reqs against a pool that admits 21, so 3 stragglers
    # decoded a second wave in a 24-row lockstep — 948 "paged" tok/s was
    # really a 12%-occupancy tail, not the engine.) ----
    SRV_NEW = 64

    def _serving_req_maker():
        rng = np.random.default_rng(0)
        n_img = cfg.vision_config.num_patches
        from paligemma_tpu.runtime.serving import Request

        def req(i, n_new):
            ids = np.concatenate(
                [np.full((n_img,), cfg.image_token_index),
                 rng.integers(3, 100, (10,))]
            ).astype(np.int32)
            return Request(
                request_id=i, input_ids=ids,
                pixel_values=rng.normal(size=(3, 224, 224)).astype(np.float32),
                max_new_tokens=n_new, do_sample=False, eos_token_id=-1,
            )

        return req

    def _timed_serving(eng, n):
        req = _serving_req_maker()

        def wave(n_new, base):
            for i in range(n):
                eng.submit(req(base + i, n_new))
            t0 = time.perf_counter()
            done = eng.run_to_completion()
            dt = time.perf_counter() - t0
            return sum(len(r.tokens) for r in done), dt

        # warm the compile caches at the timed budgets (scan-window decode
        # compiles per static ticks value; prefill per pow2 chunk shape)
        wave(SRV_NEW, -1000)
        wave(SRV_NEW // 2, -1500)
        wave(1, -2000)
        _, tP = wave(1, 1000)
        # decode rate: difference two DECODE LENGTHS (64 vs 32 tokens) —
        # both waves share the identical seat/sync pattern (multi-tick
        # windows, sync_every batching), so the prefill AND its per-request
        # host-sync structure cancel exactly. The old (t64 - t_1tok)
        # difference broke once prefill moved to the int8 tree: a 1-token
        # request completes at seat time, so its wave pays a per-request
        # host sync the 64-token wave amortizes — tP was inflated and the
        # decode rate read 3.5x SoL.
        totH, tH = wave(SRV_NEW // 2, 1500)
        totA, tA = wave(SRV_NEW, 2000)
        totA2, tA2 = wave(SRV_NEW, 3000)
        tA, totA = min((tA, totA), (tA2, totA2))
        return {
            "aggregate": round(totA / tA, 1),
            "decode": round(n * (SRV_NEW - SRV_NEW // 2) / (tA - tH), 1),
            "prefill_ms": round(tP / n * 1e3, 1),
        }

    def serving():
        from paligemma_tpu.runtime.serving import ServingEngine

        # prefill from the SAME int8 tree the paged phase uses (round-4
        # confound: dense prefilled bf16 / paged prefilled int8, so the
        # dense-vs-paged aggregate mixed a weights-precision asymmetry
        # into the engine comparison). Split-precision TTFT is still
        # covered by extra["ttft_ms"] (bf16 prefill, phase 1).
        eng = ServingEngine(
            qparams, cfg, max_slots=16, max_seq_len=512,
            decode_params=qparams, fused_decode=True, sync_every=8,
            int8_act_prefill=True,
        )
        extra["serving_prefill_precision"] = "int8-w8a8"
        return _timed_serving(eng, 16)

    if qparams is not None:
        r = attempt("serving", serving)
        if r is not None:
            extra["serving_aggregate_tokens_per_sec"] = r["aggregate"]
            # wave-difference marginal rate, NOT a device decode rate:
            # the pipelined scheduler overlaps device ticks with host
            # work, so marginal wall cost per tick can sit far below the
            # device tick time (reads above SoL). The device-graded
            # serving-tick number is b16_vs_sol (phase 2).
            extra["serving_marginal_decode_tokens_per_sec"] = r["decode"]
            extra["serving_prefill_ms_per_req"] = r["prefill_ms"]

    # ---- 3b) paged serving: 24 slots fed from the dense phase's exact HBM
    # reservation (128 pages x 64); timed at the pool's admissible
    # concurrency. The bf16 tree is dropped first and prefill runs from
    # the int8 tree (like the 448px phase) — bf16 + int8 + the paged
    # repack together exceed HBM ----
    def serving_paged():
        nonlocal params
        from paligemma_tpu.runtime.serving_paged import PagedServingEngine

        params = None
        gc.collect()
        eng = PagedServingEngine(
            qparams, cfg, max_slots=24, max_seq_len=512, page_size=64,
            n_pages=16 * 512 // 64,  # == the dense engine's reservation
            decode_params=qparams, sync_every=8,
            int8_act_prefill=True,
        )
        bucket = 64 * (-(-266 // 64))  # page-aligned prompt bucket
        n = min(24, eng.paged.n_pages // (eng.paged.pages_for(bucket) + 1))
        r = _timed_serving(eng, n)
        extra["paged_rows"] = n
        return r

    if qparams is not None:
        r = attempt("serving_paged", serving_paged)
        if r is not None:
            extra["paged_serving_aggregate_tokens_per_sec"] = r["aggregate"]
            extra["paged_marginal_decode_tokens_per_sec"] = r["decode"]
            extra["paged_prefill_ms_per_req"] = r["prefill_ms"]

    # ---- 3c) paged device tick at the driver geometry: the greedy paged
    # fast path (fused paged layer kernel + int8 argmax head, the round-5
    # serving tick core) in a fori loop with a token-chained data
    # dependency — the DEVICE decode rate to grade against the paged
    # roofline (wave differences above are host-marginal, not device) ----
    def paged_tick():
        from paligemma_tpu.kernels import decode_head as _dh
        from paligemma_tpu.kernels import decode_layer as _dl

        B = int(extra.get("paged_rows") or 21)
        PS, PB = 64, 8
        W = PS * PB
        tc = cfg.text_config
        L, hd = tc.num_hidden_layers, tc.head_dim
        lm = dict(qparams["lm"])
        lm["layers"] = jax.jit(_dl.repack_layers)(lm["layers"])
        lm["head_q"] = jax.jit(_dh.repack_head)(lm["head_q"])
        qp = {**qparams, "lm": lm}
        n_pages = B * PB
        rng = np.random.default_rng(0)
        pool_k = jnp.asarray(
            rng.normal(size=(L, n_pages, PS, 1, hd)) * 0.1, jnp.bfloat16
        )
        pool_v = jnp.asarray(
            rng.normal(size=(L, n_pages, PS, 1, hd)) * 0.1, jnp.bfloat16
        )
        pt = jnp.arange(B * PB, dtype=jnp.int32).reshape(B, PB)
        wp = jnp.full((B,), W - 2, jnp.int32)
        STEPS = 50

        @jax.jit
        def loop(qp, tok, pk, pv):
            def body(i, c):
                tok, pk, pv = c
                t, pool2 = paligemma.decode_step_greedy_paged(
                    qp, cfg, tok, {"k": pk, "v": pv}, pt,
                    write_pos=wp, position_ids=wp + 1, pages_bucket=PB,
                )
                return t, pool2["k"], pool2["v"]

            tok, pk, pv = jax.lax.fori_loop(
                0, STEPS, body, (tok, pk, pv)
            )
            return tok

        tok0 = jnp.full((B,), 7, jnp.int32)
        _sync(loop(qp, tok0, pool_k, pool_v))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(loop(qp, tok0, pool_k, pool_v))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rate = B * STEPS / best
        sol = batch_sol(B, W)
        extra["sol_paged_decode_tokens_per_sec"] = round(sol, 1)
        extra["paged_decode_vs_sol"] = round(rate / sol, 4)
        return round(rate, 1)

    if qparams is not None:
        extra["paged_tick_decode_tokens_per_sec"] = attempt(
            "paged_tick", paged_tick
        )

    # ---- 4) 448px (1024 image tokens): fresh weights, bf16 freed first ----
    def px448():
        nonlocal params, qparams
        params = qparams = None
        jax.clear_caches()
        gc.collect()
        cfg4 = paligemma_3b_448()
        p4 = paligemma.init_params(jax.random.PRNGKey(0), cfg4, jnp.bfloat16)
        q4 = quantize_lm_for_serving(p4)
        p4 = None
        gc.collect()
        eng4 = PaliGemmaEngine(q4, cfg4, max_seq_len=2048, eos_token_id=1)
        px, i4, m4 = make_inputs(cfg4, 1)
        return round(time_decode(eng4, px, i4, m4, n_chunks=4), 2)

    extra["int8_448px_decode_tokens_per_sec"] = attempt("448px", px448)

    # ---- 5) 896px (4096 image tokens, google/paligemma-3b-pt-896): the
    # long-prefill config — vision flash at S=4096 (tower 57 vs 100 ms,
    # .bench/vision_attn_probe.py) + decode at 4106+ context ----
    def px896():
        from paligemma_tpu.core.config import paligemma_3b_896

        # drop earlier phases' compiled executables + any lingering device
        # buffers: this phase quantizes a fresh bf16 tree (peak ~8.8 GB)
        # and has OOMed on leftovers when every prior phase ran first
        jax.clear_caches()
        gc.collect()
        cfg8 = paligemma_3b_896()
        p8 = paligemma.init_params(jax.random.PRNGKey(0), cfg8, jnp.bfloat16)
        q8 = quantize_lm_for_serving(p8)
        p8 = None
        gc.collect()
        eng8 = PaliGemmaEngine(q8, cfg8, max_seq_len=8192, eos_token_id=1)
        px, i8, m8 = make_inputs(cfg8, 1)
        tok = round(time_decode(eng8, px, i8, m8, n_chunks=2, reps=2), 2)
        lg, _ = eng8.prefill(px, i8, m8)
        _sync(lg)
        t0 = time.perf_counter()
        lg, _ = eng8.prefill(px, i8, m8)
        _sync(lg)
        extra["ttft_896px_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        # W8A8 prefill (round 5): int8 x int8 MXU dots for the 4106-token
        # LM chain (~1.5x the bf16-convert dot at prefill shapes,
        # .bench/int8_prefill_probe.py); tokens/logit fidelity covered by
        # tests/test_quant.py::test_w8a8_prefill_*
        eng8b = PaliGemmaEngine(q8, cfg8, max_seq_len=8192, eos_token_id=1,
                                int8_act_prefill=True)
        lg, _ = eng8b.prefill(px, i8, m8)
        _sync(lg)
        t0 = time.perf_counter()
        lg, _ = eng8b.prefill(px, i8, m8)
        _sync(lg)
        extra["ttft_896px_w8a8_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1
        )
        return tok

    extra["int8_896px_decode_tokens_per_sec"] = attempt("896px", px896)

    if failures:
        extra["failures"] = failures

    value = round(tok_per_s, 2) if tok_per_s else 0.0
    vs = (
        round(tok_per_s / sol_tok_per_s, 4)
        if tok_per_s and sol_tok_per_s
        else 0.0
    )
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_paligemma3b_int8_b1",
                "value": value,
                "unit": "tokens/s",
                "vs_baseline": vs,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
