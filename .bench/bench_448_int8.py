"""448px int8 decode with the fused kernels (chunked, bench methodology)."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from paligemma_tpu.core.config import paligemma_3b_448
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving


def sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


cfg = paligemma_3b_448()
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
q = quantize_lm_for_serving(params)
del params
eng = PaliGemmaEngine(q, cfg, max_seq_len=2048, eos_token_id=1)
b, n_img = 1, 1024
ids = np.concatenate([np.full((b, n_img), cfg.image_token_index),
                      np.full((b, 10), 5)], 1).astype(np.int32)
mask = np.ones_like(ids)
pixels = np.random.default_rng(0).normal(size=(b, 3, 448, 448)).astype(np.float32)
pj, ij, mj = jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)

CHUNK = 64
prompt_len = ids.shape[1]
best = None
for rep in range(3):
    lg, st = eng.prefill(pj, ij, mj)
    sync(lg)
    pos = prompt_len
    t0 = time.perf_counter()
    toks = None
    for _ in range(4):
        lg, st, toks, done = eng.decode_chunk(
            lg, st, CHUNK, do_sample=False, eos_token_id=-1,
            kv_bucket=eng.kv_bucket_for(pos + CHUNK))
        pos += CHUNK
    sync(toks)
    dt = time.perf_counter() - t0
    if rep > 0:
        best = dt if best is None else min(best, dt)
print(f"RESULT 448px int8 fused: decode {4 * CHUNK / best:.1f} tok/s "
      f"(context {prompt_len}+)", flush=True)
