"""Paged vs dense serving at EQUAL KV HBM budget (PaliGemma-3B int8).

Dense engine: 8 slots x 2048 reserved rows.
Paged engine: same page budget (8*2048/64 = 256 pages) but 24 slots — the
pool is shared by actual length, so ~3x the concurrency fits in the same
reservation for this workload (266-token prompts + 64 generated).

Reports steady-state aggregate tokens/s for a 32-request wave on each.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
from paligemma_tpu.runtime.serving import Request, ServingEngine
from paligemma_tpu.runtime.serving_paged import PagedServingEngine

cfg = paligemma_3b_224()
key = jax.random.PRNGKey(0)
params = paligemma.init_params(key, cfg, jnp.bfloat16)
qparams = quantize_lm_for_serving(params)

N_REQ = 32
MAX_NEW = 64
rng = np.random.default_rng(0)
n_img = cfg.vision_config.num_patches


def make_reqs():
    reqs = []
    for i in range(N_REQ):
        ids = np.concatenate([
            np.full((n_img,), cfg.image_token_index),
            rng.integers(3, 1000, (10,)),
        ]).astype(np.int32)
        pix = rng.normal(size=(3, 224, 224)).astype(np.float32)
        reqs.append(Request(request_id=i, input_ids=ids, pixel_values=pix,
                            max_new_tokens=MAX_NEW, do_sample=False,
                            eos_token_id=-1))
    return reqs


def run(engine, label):
    engine.warmup([266], batch_sizes=(1, 2, 4, 8))
    # wave 1 untimed: flushes every remaining jit variant (slot-count
    # dependent buckets etc.) through the remote compiler
    for r in make_reqs():
        engine.submit(r)
    engine.run_to_completion()
    # wave 2 timed: fully warm steady state
    reqs = make_reqs()
    for r in reqs:
        engine.submit(r)
    t0 = time.perf_counter()
    done = engine.run_to_completion()
    dt = time.perf_counter() - t0
    tok = sum(len(r.tokens) for r in done)
    print(f"{label}: {tok} tokens in {dt:.2f}s -> {tok/dt:.1f} tok/s aggregate")
    return tok / dt


MAX_SEQ = 2048
PAGE = 64
dense_pages = 8 * MAX_SEQ // PAGE  # dense engine's reservation in pages

import os

dense_rate = None
if not os.environ.get("SKIP_DENSE"):
    print("== dense: 8 slots x 2048 ==")
    dense = ServingEngine(params, cfg, max_slots=8, max_seq_len=MAX_SEQ,
                          decode_params=qparams, sync_every=16)
    dense_rate = run(dense, "dense-8slot")
    del dense

KERNEL = os.environ.get("PAGED_KERNEL", "multi")
print(f"== paged: 24 slots, same 256-page (8x2048) HBM budget, kernel={KERNEL} ==")
paged = PagedServingEngine(params, cfg, max_slots=24, max_seq_len=MAX_SEQ,
                           page_size=PAGE, n_pages=dense_pages,
                           decode_params=qparams, sync_every=16,
                           paged_kernel=KERNEL)
pg_rate = run(paged, f"paged-24slot-{KERNEL} (preemptions={paged.preemptions})")
print(f"preemptions: {paged.preemptions}")
if dense_rate:
    print(f"speedup at equal HBM: {pg_rate/dense_rate:.2f}x")
