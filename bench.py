"""Benchmark: PaliGemma-3B-pt-224 (bf16, random weights) on the local chip.

Prints ONE JSON line: decode tokens/sec for batch-1 KV-cached greedy decode
(the reference's core workload, ref: inference.py:51-87 — which runs it on
CPU fp32 with a torch.cat cache and a re-run vision tower every step).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
fraction of the chip's memory-bandwidth speed-of-light: decode is
HBM-bound, SoL tokens/s = HBM_BW / bytes(params touched per token).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    """Force execution of the async chain ending in ``x``.

    On this platform ``block_until_ready`` does not actually synchronize
    (tunneled device); a host readback of one element does.
    """
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
    from paligemma_tpu.core.config import paligemma_3b_224
    from paligemma_tpu.models import paligemma
    from paligemma_tpu.runtime.engine import PaliGemmaEngine

    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

    cfg = paligemma_3b_224()
    key = jax.random.PRNGKey(0)
    params = paligemma.init_params(key, cfg, jnp.bfloat16)
    param_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))

    # 2048-slot cache: the reference's launcher decodes up to 1000 tokens
    # after a 266-token prompt (ref: launch_inference.sh:6), so the honest
    # cache size is >1266. Cache length costs <3% here (docs/PERFORMANCE.md).
    MAX_SEQ = 2048
    engine = PaliGemmaEngine(params, cfg, max_seq_len=MAX_SEQ, eos_token_id=1)

    b = 1
    n_img = cfg.vision_config.num_patches  # 256
    s_txt = 10
    s = n_img + s_txt
    ids = np.concatenate(
        [np.full((b, n_img), cfg.image_token_index), np.full((b, s_txt), 5)], axis=1
    ).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    pixels = np.random.default_rng(0).normal(size=(b, 3, 224, 224)).astype(np.float32)
    pixels_j, ids_j, mask_j = jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)

    # ---- prefill / TTFT ----
    logits, state = engine.prefill(pixels_j, ids_j, mask_j)  # compile
    _sync(logits)
    ttft_ms = None
    for _ in range(3):
        t0 = time.perf_counter()
        logits, state = engine.prefill(pixels_j, ids_j, mask_j)
        _sync(logits)
        dt = (time.perf_counter() - t0) * 1e3
        ttft_ms = dt if ttft_ms is None else min(ttft_ms, dt)

    # ---- decode (chunked: greedy token selection fused into the decode
    # jit, CHUNK steps per device dispatch, one host sync per rep — the
    # production path, engine.decode_chunk / generate(sync_every=K)) ----
    CHUNK = 64

    def time_decode(eng, pixels, ids, mask, n_chunks=6, reps=3):
        """Steady-state decode rate over a realistic window: prompt prefill
        (untimed) + n_chunks*CHUNK generated tokens, length-bucketed cache
        windows, one host sync per rep. Every rep replays the same
        positions; rep 0 doubles as the bucket-compile warmer."""
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

    bf16_tok_per_s = time_decode(engine, pixels_j, ids_j, mask_j)

    # ---- int8 weight-only serving path ----
    qparams = quantize_lm_for_serving(params)
    del params
    qengine = PaliGemmaEngine(qparams, cfg, max_seq_len=MAX_SEQ, eos_token_id=1)
    tok_per_s = time_decode(qengine, pixels_j, ids_j, mask_j)
    qlogits, qstate = qengine.prefill(pixels_j, ids_j, mask_j)
    per_step_tok_per_s = time_decode_per_step(qengine, qlogits, qstate)

    # ---- batch-8 int8 decode throughput (BASELINE batch-8 VQA config) ----
    b8 = 8
    ids8 = jnp.asarray(np.tile(ids, (b8, 1)))
    mask8 = jnp.asarray(np.tile(mask, (b8, 1)))
    pixels8 = jnp.asarray(np.tile(pixels, (b8, 1, 1, 1)))
    b8_tok_per_s = time_decode(qengine, pixels8, ids8, mask8, n_chunks=6)

    # Speed of light: HBM bandwidth / bytes per token (decode is BW-bound).
    # TPU v5e: ~819 GB/s HBM BW.
    hbm_bw = 819e9
    # per decode step: all LM weights + KV cache read; vision weights not
    # touched; the bf16 embedding table is read only via the int8 head copy
    lm_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(qparams["lm"])
    ) - qparams["lm"]["embed"].size * 2
    sol_tok_per_s = hbm_bw / lm_bytes

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_paligemma3b_int8_b1",
                "value": round(tok_per_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(tok_per_s / sol_tok_per_s, 4),
                "extra": {
                    "bf16_decode_tokens_per_sec": round(bf16_tok_per_s, 2),
                    "int8_batch8_decode_tokens_per_sec": round(b8_tok_per_s, 2),
                    "int8_per_step_dispatch_tokens_per_sec": round(
                        per_step_tok_per_s, 2
                    ),
                    "ttft_ms": round(ttft_ms, 2),
                    "param_bytes": param_bytes,
                    "sol_tokens_per_sec": round(sol_tok_per_s, 2),
                    "device": str(jax.devices()[0]),
                    "prefill_len": s,
                    "max_seq_len": MAX_SEQ,
                    "decode_chunk": CHUNK,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
