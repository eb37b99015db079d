"""Speculative-serving A/B at the 3B shape (int8 decode weights).

Workload: the driver bench's serving phase (16 requests x 64 new tokens
over 16 slots, 224px) run three ways: the production fused tick, the XLA
tick (what spec's verify forward competes with), and spec_decode. Random
weights decode into loops, so this is the near-full-acceptance regime —
the UPPER bound of the n-gram proposer; a zero-acceptance workload runs
one verify cycle per token, i.e. ~(draft_k+1)x the XLA tick's FLOPs for
the same emission (see docs/PERFORMANCE.md "Speculative decoding").
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
from paligemma_tpu.runtime.serving import Request, ServingEngine


def reqs(cfg, n, base=0):
    n_img = cfg.vision_config.num_patches
    out = []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        ids = np.concatenate(
            [np.full((n_img,), cfg.image_token_index),
             rng.integers(3, 100, (10,))]
        ).astype(np.int32)
        out.append(Request(
            request_id=base + i, input_ids=ids,
            pixel_values=rng.normal(size=(3, 224, 224)).astype(np.float32),
            max_new_tokens=64, do_sample=False, eos_token_id=-1,
        ))
    return out


def run(params, cfg, qparams, name, **kw):
    eng = ServingEngine(
        params, cfg, max_slots=16, max_seq_len=512,
        decode_params=qparams, sync_every=8, **kw,
    )
    for r in reqs(cfg, 16, base=-100):  # warm compiles at the timed budgets
        eng.submit(r)
    eng.run_to_completion()
    rs = reqs(cfg, 16)
    for r in rs:
        eng.submit(r)
    t0 = time.perf_counter()
    done = eng.run_to_completion()
    dt = time.perf_counter() - t0
    total = sum(len(r.tokens) for r in done)
    print(f"{name:22s} {total / dt:8.1f} tok/s  ({total} tok, {dt:.2f} s)",
          flush=True)
    return done


def main():
    cfg = paligemma_3b_224()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qparams = quantize_lm_for_serving(params)
    a = run(params, cfg, qparams, "fused tick", fused_decode=True)
    b = run(params, cfg, qparams, "xla tick", fused_decode=False)
    c = run(params, cfg, qparams, "spec k=8", spec_decode=True,
            spec_draft_k=8)
    d = run(params, cfg, qparams, "spec k=4", spec_decode=True,
            spec_draft_k=4)
    for x, y in ((a, c), (a, d)):
        for ra, rc in zip(x, y):
            assert list(ra.tokens) == list(rc.tokens), ra.request_id
    print("token parity: spec == fused, all 16 requests")


if __name__ == "__main__":
    main()
