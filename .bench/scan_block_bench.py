"""Does grouping decoder layers per scan body buy b1 decode tokens/s?

Times the production decode path (decode_chunk, 64-step chunks, one sync
per rep) at scan_block 1/2/3/6 on the int8 3B config.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving


def _sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


cfg = paligemma_3b_224()
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
qparams = quantize_lm_for_serving(params)
del params

b = 1
n_img = cfg.vision_config.num_patches
ids = np.concatenate(
    [np.full((b, n_img), cfg.image_token_index), np.full((b, 10), 5)], axis=1
).astype(np.int32)
mask = np.ones_like(ids)
pixels = np.zeros((b, 3, 224, 224), np.float32)
pj, ij, mj = jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)
CHUNK = 64

for g in (1, 2, 3, 6):
    eng = PaliGemmaEngine(qparams, cfg, max_seq_len=2048, eos_token_id=1,
                          decode_scan_block=g)
    best = None
    for rep in range(4):  # rep 0 warms
        lg, st = eng.prefill(pj, ij, mj)
        _sync(lg)
        pos = ids.shape[1]
        t0 = time.perf_counter()
        for _ in range(6):
            lg, st, toks, done = eng.decode_chunk(
                lg, st, CHUNK, do_sample=False, eos_token_id=-1,
                kv_bucket=eng.kv_bucket_for(pos + CHUNK))
            pos += CHUNK
        _sync(toks)
        dt = time.perf_counter() - t0
        if rep:
            best = dt if best is None else min(best, dt)
    print(f"scan_block={g}: {6 * CHUNK / best:.1f} tok/s "
          f"({best / (6 * CHUNK) * 1e3:.3f} ms/step)")
    del eng
