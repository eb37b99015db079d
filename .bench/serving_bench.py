"""Continuous-batching throughput on the local chip (not run by the driver;
results recorded in docs/PERFORMANCE.md)."""

import sys

sys.path.insert(0, "/root/repo")

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
from paligemma_tpu.runtime.serving import Request, ServingEngine


def sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
    cfg = paligemma_3b_224()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qparams = quantize_lm_for_serving(params)
    fused = os.environ.get("FUSED", "1") == "1"
    slots = int(os.environ.get("SLOTS", "8"))
    eng = ServingEngine(params, cfg, max_slots=slots, max_seq_len=512,
                        decode_params=qparams, fused_decode=fused)
    print("fused_decode:", eng.fused_decode, flush=True)

    rng = np.random.default_rng(0)
    n_img = cfg.vision_config.num_patches

    def req(i, n_new):
        ids = np.concatenate(
            [np.full((n_img,), cfg.image_token_index), rng.integers(3, 100, (10,))]
        ).astype(np.int32)
        return Request(request_id=i, input_ids=ids,
                       pixel_values=rng.normal(size=(3, 224, 224)).astype(np.float32),
                       max_new_tokens=n_new, do_sample=False, eos_token_id=-1)

    # warm up compiles: one full wave with the SAME budgets as the timed
    # wave (the scan-window decode compiles per static ticks value, so a
    # short-budget warm wave would leave the steady-state window cold)
    for i in range(16):
        eng.submit(req(-100 - i, 64))
    eng.run_to_completion()

    n_req, n_new = int(os.environ.get("NREQ", "16")), 64
    for i in range(n_req):
        eng.submit(req(i, n_new))
    t0 = time.perf_counter()
    done = eng.run_to_completion()
    dt = time.perf_counter() - t0
    total_tokens = sum(len(r.tokens) for r in done)
    print(f"RESULT serving: {len(done)} reqs, {total_tokens} tokens in {dt:.2f}s "
          f"-> {total_tokens/dt:.1f} tok/s aggregate", flush=True)


if __name__ == "__main__":
    main()
