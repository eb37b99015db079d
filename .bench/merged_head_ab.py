"""A/B: merged-head fused decode (ONE pallas_call/step) vs the split
layers-kernel + decode_head pair, through the SAME chunked greedy path
bench.py's headline uses (prefill + decode_chunk, kv buckets). Timing is
per bench methodology: one host sync per rep, chunk loop async.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python .bench/merged_head_ab.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.kernels import decode_layer
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving


def sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


cfg = paligemma_3b_224()
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
params = quantize_lm_for_serving(params)

b = 1
n_img = cfg.vision_config.num_patches
ids = np.concatenate(
    [np.full((b, n_img), cfg.image_token_index), np.full((b, 10), 5)], 1
).astype(np.int32)
mask = jnp.asarray(np.ones_like(ids))
ids = jnp.asarray(ids)
pixels = jnp.asarray(np.zeros((b, 3, 224, 224), np.float32))
CHUNK = 64
N_CHUNKS = 6

real_fits = decode_layer.merged_head_fits


def run(tag):
    eng = PaliGemmaEngine(params, cfg, max_seq_len=2048)
    prompt_len = ids.shape[1]
    best = None
    all_toks = []
    for rep in range(4):  # rep 0 warms compiles
        lg, st = eng.prefill(pixels, ids, mask)
        sync(lg)
        pos = prompt_len
        toks_acc = []
        t0 = time.perf_counter()
        for _ in range(N_CHUNKS):
            lg, st, toks, done = eng.decode_chunk(
                lg, st, CHUNK, do_sample=False, eos_token_id=-1,
                kv_bucket=eng.kv_bucket_for(pos + CHUNK),
            )
            toks_acc.append(toks)
            pos += CHUNK
        sync(toks)
        dt = time.perf_counter() - t0
        if rep > 0:
            best = dt if best is None else min(best, dt)
        all_toks = toks_acc
    rate = N_CHUNKS * CHUNK / best
    print(f"RESULT {tag}: {rate:.1f} tok/s ({best/(N_CHUNKS*CHUNK)*1e3:.3f} "
          "ms/step incl. dispatch)", flush=True)
    return np.concatenate([np.asarray(jax.device_get(t)) for t in all_toks],
                          axis=1)


toks_m = run("merged")
decode_layer.merged_head_fits = lambda *a, **k: False
toks_s = run("split")
decode_layer.merged_head_fits = real_fits

assert np.array_equal(toks_m, toks_s), "token mismatch merged vs split"
print("tokens identical merged vs split", flush=True)
