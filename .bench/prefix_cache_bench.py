"""Prefix-cache A/B at the 3B shape: repeated identical queries.

Workload: 16 requests x 48 new tokens over 4 slots, only 2 UNIQUE
(image, prompt) pairs — the popular-query serving pattern the exact-match
cache targets. Reports aggregate tok/s, prefill calls, and hits for
prefix_cache off/on. Decode dominates at 48 tokens/request, so the
headline moves modestly; the per-hit win is one full prefill
(~40 ms wall at 224px) plus the freed prefill batch slot.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu import PagedServingEngine, Request  # package-root exports
from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving


def reqs(cfg, n, uniques):
    n_img = cfg.vision_config.num_patches
    out = []
    for i in range(n):
        rng = np.random.default_rng(i % uniques)  # identical per unique id
        ids = np.concatenate(
            [np.full((n_img,), cfg.image_token_index),
             rng.integers(3, 100, (10,))]
        ).astype(np.int32)
        out.append(Request(
            request_id=i, input_ids=ids,
            pixel_values=rng.normal(size=(3, 224, 224)).astype(np.float32),
            max_new_tokens=48, do_sample=False, eos_token_id=-1,
        ))
    return out


def run(params, cfg, qparams, prefix_cache):
    eng = PagedServingEngine(
        params, cfg, max_slots=4, max_seq_len=512, page_size=64,
        n_pages=64, decode_params=qparams, sync_every=8,
        prefix_cache=prefix_cache,
    )
    for r in reqs(cfg, 8, 2):  # warm compiles: wave 2 exercises cache hits
        eng.submit(r)
    eng.run_to_completion()
    eng.prefill_calls = eng.cache_hits = 0
    rs = reqs(cfg, 16, 2)
    for r in rs:
        eng.submit(r)
    t0 = time.perf_counter()
    done = eng.run_to_completion()
    dt = time.perf_counter() - t0
    total = sum(len(r.tokens) for r in done)
    print(
        f"prefix_cache={prefix_cache}: {total/dt:7.1f} tok/s aggregate, "
        f"{eng.prefill_calls} prefill calls, {eng.cache_hits} hits, "
        f"{dt*1e3:.0f} ms",
        flush=True,
    )
    return {r.request_id: tuple(r.tokens) for r in done}


def main():
    cfg = paligemma_3b_224()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qparams = quantize_lm_for_serving(params)
    a = run(params, cfg, qparams, False)
    b = run(params, cfg, qparams, True)
    assert a == b, "prefix cache changed tokens!"
    print("tokens identical", flush=True)


if __name__ == "__main__":
    main()
