"""Acceptance-controlled speculative decode: tok/s vs mean accepted
drafts/cycle, for b1 generate_spec and the spec serving engine. The
corrupt_frac dial (engine.generate_spec / ServingEngine
spec_corrupt_frac) deterministically rejects a fraction of draft
positions on device, sweeping the regime between the near-full-
acceptance upper bound (random-weight repetitive output) and the
zero-acceptance floor.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python .bench/spec_acceptance_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

cfg = paligemma_3b_224()
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
qparams = quantize_lm_for_serving(params)
del params

n_img = cfg.vision_config.num_patches
ids = np.concatenate(
    [np.full((1, n_img), cfg.image_token_index), np.full((1, 10), 5)], 1
).astype(np.int32)
mask = jnp.asarray(np.ones_like(ids))
ids_j = jnp.asarray(ids)
pixels = jnp.asarray(np.zeros((1, 3, 224, 224), np.float32))

eng = PaliGemmaEngine(qparams, cfg, max_seq_len=2048)
N = 256

print("b1 generate_spec (k=8, m=2, 256 new tokens):", flush=True)
for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        out = eng.generate_spec(
            pixels, ids_j, mask, max_new_tokens=N, eos_token_id=-1,
            draft_k=8, match_n=2, corrupt_frac=frac,
        )
        dt = time.perf_counter() - t0
        if rep:
            best = dt if best is None else min(best, dt)
    acc = (out.shape[1] - 1) / eng.spec_cycles
    print(f"  frac={frac:.2f}: accepted/cycle={acc:.2f} "
          f"tok/s={out.shape[1]/best:.1f}", flush=True)

del eng
import gc

gc.collect()

print("serving spec (16 slots x 64 new, k=8):", flush=True)
from paligemma_tpu.runtime.serving import Request, ServingEngine

rng = np.random.default_rng(0)


def req(i):
    rids = np.concatenate(
        [np.full((n_img,), cfg.image_token_index),
         rng.integers(3, 100, (10,))]
    ).astype(np.int32)
    return Request(
        request_id=i, input_ids=rids,
        pixel_values=rng.normal(size=(3, 224, 224)).astype(np.float32),
        max_new_tokens=64, do_sample=False, eos_token_id=-1,
    )


for frac in (0.0, 0.5, 0.75):
    seng = ServingEngine(
        qparams, cfg, max_slots=16, max_seq_len=512, decode_params=qparams,
        spec_decode=True, spec_draft_k=8, spec_corrupt_frac=frac,
        sync_every=4,
    )
    for i in range(16):
        seng.submit(req(i))
    seng.run_to_completion()  # warm
    best = None
    for repn in range(2):
        for i in range(16):
            seng.submit(req(1000 * (repn + 1) + i))
        t0 = time.perf_counter()
        done = seng.run_to_completion()
        dt = time.perf_counter() - t0
        tot = sum(len(r.tokens) for r in done)
        best = (
            (tot / dt) if best is None else max(best, tot / dt)
        )
    print(f"  frac={frac:.2f}: aggregate={best:.1f} tok/s", flush=True)
    del seng
    gc.collect()
