"""Capture an XLA trace of the int8 b1 decode chunk to find non-weight time.

Writes a trace to /tmp/decode_trace; inspect with the trace-event JSON it
drops (we parse the top ops by self-time below rather than using TensorBoard).
"""
import glob
import gzip
import json
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
MAX_SEQ = 2048
eng = PaliGemmaEngine(qparams, cfg, max_seq_len=MAX_SEQ, eos_token_id=1)

b = 1
n_img = cfg.vision_config.num_patches
ids = np.concatenate(
    [np.full((b, n_img), cfg.image_token_index), np.full((b, 10), 5)], axis=1
).astype(np.int32)
mask = np.ones_like(ids)
pixels = np.zeros((b, 3, 224, 224), np.float32)

lg, st = eng.prefill(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))
_sync(lg)
# warm the chunk compile
CHUNK = 64
lg2, st2, toks, done = eng.decode_chunk(
    lg, st, CHUNK, do_sample=False, eos_token_id=-1,
    kv_bucket=eng.kv_bucket_for(266 + CHUNK),
)
_sync(toks)

with jax.profiler.trace("/tmp/decode_trace"):
    lg3, st3, toks, done = eng.decode_chunk(
        lg2, st2, CHUNK, do_sample=False, eos_token_id=-1,
        kv_bucket=eng.kv_bucket_for(266 + 2 * CHUNK),
    )
    _sync(toks)
time.sleep(2)

files = glob.glob("/tmp/decode_trace/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # aggregate device-side op self time by name
    agg = {}
    for e in evs:
        name = e.get("name", "")
        dur = e.get("dur", 0)
        agg[name] = agg.get(name, 0) + dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    total = sum(agg.values())
    print(f"--- {f}: total {total/1e3:.2f} ms over {len(evs)} events")
    for name, dur in top:
        print(f"{dur/1e3:9.3f} ms  {name[:120]}")
