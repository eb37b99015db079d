"""Driver-bench serving regime redesign probe (round 4, VERDICT item 1).

Round 3's driver bench compared dense (16 reqs / 16 slots, one wave) against
paged (24 reqs / 24 slots but only ~21 admissible from the 128-page pool) —
the 3 leftover requests ran as a second 64-tick wave with 3 active rows in a
24-row lockstep, halving the paged aggregate (948 vs 1677 tok/s).

New regime, both engines timed identically at EQUAL KV HBM (16*512 dense
reservation == 128 pages x 64):
  * wave P (timed): N slot-bound requests, max_new=1  -> prefill+insert cost
  * wave A (timed): N slot-bound requests, max_new=64 -> aggregate
  * decode tok/s = N*63 / (tA - tP)   [identical prefill work cancels]
N is each engine's own steady-state concurrency at this workload: dense 16,
paged floor(pool / pages-per-request) = 21.
"""
import gc
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
from paligemma_tpu.runtime.serving import Request, ServingEngine
from paligemma_tpu.runtime.serving_paged import PagedServingEngine

cfg = paligemma_3b_224()
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
qparams = quantize_lm_for_serving(params)

MAX_NEW = 64
rng = np.random.default_rng(0)
n_img = cfg.vision_config.num_patches


def make_reqs(n, max_new, base=0):
    reqs = []
    for i in range(n):
        ids = np.concatenate([
            np.full((n_img,), cfg.image_token_index),
            rng.integers(3, 100, (10,)),
        ]).astype(np.int32)
        pix = rng.normal(size=(3, 224, 224)).astype(np.float32)
        reqs.append(Request(request_id=base + i, input_ids=ids,
                            pixel_values=pix, max_new_tokens=max_new,
                            do_sample=False, eos_token_id=-1))
    return reqs


def timed_wave(eng, n, max_new, base):
    for r in make_reqs(n, max_new, base):
        eng.submit(r)
    t0 = time.perf_counter()
    done = eng.run_to_completion()
    dt = time.perf_counter() - t0
    return sum(len(r.tokens) for r in done), dt


def run_phase(eng, n, label):
    eng.warmup([266], batch_sizes=(1, 2, 4, 8, 16))
    # warm wave at the timed shapes (N-request admission, N-row prefill)
    timed_wave(eng, n, MAX_NEW, base=-1000)
    timed_wave(eng, n, 1, base=-2000)
    tokP, tP = timed_wave(eng, n, 1, base=1000)
    tokA, tA = timed_wave(eng, n, MAX_NEW, base=2000)
    tokA2, tA2 = timed_wave(eng, n, MAX_NEW, base=3000)
    tA = min(tA, tA2)
    dec = n * (MAX_NEW - 1) / (tA - tP)
    agg = tokA / tA
    pre_ms = tP / n * 1e3
    print(f"{label}: N={n} aggregate={agg:.1f} tok/s "
          f"decode={dec:.1f} tok/s prefill={pre_ms:.1f} ms/req "
          f"(tA={tA:.3f}s tP={tP:.3f}s prefill_calls={eng.prefill_calls})")
    return agg, dec, pre_ms


MAX_SEQ = 512
PAGE = 64
POOL = 16 * MAX_SEQ // PAGE  # == dense reservation

if not os.environ.get("SKIP_DENSE"):
    dense = ServingEngine(params, cfg, max_slots=16, max_seq_len=MAX_SEQ,
                          decode_params=qparams, fused_decode=True,
                          sync_every=8)
    run_phase(dense, 16, "dense-16")
    del dense
    gc.collect()

paged = PagedServingEngine(qparams, cfg, max_slots=24, max_seq_len=MAX_SEQ,
                           page_size=PAGE, n_pages=POOL,
                           decode_params=qparams, sync_every=8)
bucket = PAGE * (-(-266 // PAGE))  # page-aligned prompt bucket
n_paged = min(24, POOL // (paged.paged.pages_for(bucket) + 1))
run_phase(paged, n_paged, "paged")
