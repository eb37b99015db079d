"""A/B: pipelined vs stepwise run_to_completion on the bench serving
configs (dense 16 slots, paged 24 slots, int8 decode, 64 new tokens)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
from paligemma_tpu.runtime.serving import Request, ServingEngine
from paligemma_tpu.runtime.serving_paged import PagedServingEngine


def req(cfg, rng, i, n_new):
    n_img = cfg.vision_config.num_patches
    ids = np.concatenate(
        [np.full((n_img,), cfg.image_token_index), rng.integers(3, 100, (10,))]
    ).astype(np.int32)
    return Request(
        request_id=i, input_ids=ids,
        pixel_values=rng.normal(size=(3, 224, 224)).astype(np.float32),
        max_new_tokens=n_new, do_sample=False, eos_token_id=-1,
    )


def run(eng, cfg, n_req, pipeline):
    rng = np.random.default_rng(0)
    for i in range(n_req):  # warm wave
        eng.submit(req(cfg, rng, -100 - i, 4))
    eng.run_to_completion(pipeline=pipeline)
    for i in range(n_req):
        eng.submit(req(cfg, rng, i, 64))
    t0 = time.perf_counter()
    done = eng.run_to_completion(pipeline=pipeline)
    dt = time.perf_counter() - t0
    total = sum(len(r.tokens) for r in done)
    return total / dt


import gc


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    cfg = paligemma_3b_224()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qparams = quantize_lm_for_serving(params)

    if which in ("dense", "both"):
        for pipeline in (False, True):
            eng = ServingEngine(
                params, cfg, max_slots=16, max_seq_len=512,
                decode_params=qparams, fused_decode=True,
            )
            r = run(eng, cfg, 16, pipeline)
            print(f"dense 16slot pipeline={pipeline}: {r:.1f} tok/s",
                  flush=True)
            eng = None
            gc.collect()

    if which in ("paged", "both"):

        params = None
        gc.collect()
        for pipeline in (False, True):
            eng = PagedServingEngine(
                qparams, cfg, max_slots=24, max_seq_len=512, page_size=64,
                n_pages=16 * 512 // 64, decode_params=qparams, sync_every=8,
            )
            r = run(eng, cfg, 24, pipeline)
            print(f"paged 24slot pipeline={pipeline}: {r:.1f} tok/s",
                  flush=True)
            eng = None
            gc.collect()


if __name__ == "__main__":
    main()
