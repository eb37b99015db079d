"""Where does the b1 int8 decode step spend its non-matmul time?

Variants timed (100 decode steps each, one host sync at the end):
  A. current bench loop: argmax dispatch + decode dispatch per step
  B. greedy fused: ONE dispatch per step (argmax inside the decode jit)
  C. scan chunk: 25 steps per dispatch (4 dispatches)
  D. full scan: all 100 steps in one jit
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import gemma, paligemma
from paligemma_tpu.runtime.engine import KVState, PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving


def _sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


cfg = paligemma_3b_224()
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
qparams = quantize_lm_for_serving(params)
del params
engine = PaliGemmaEngine(qparams, cfg, max_seq_len=512, eos_token_id=1)

b = 1
n_img = cfg.vision_config.num_patches
s = n_img + 10
ids = np.concatenate(
    [np.full((b, n_img), cfg.image_token_index), np.full((b, 10), 5)], axis=1
).astype(np.int32)
mask = np.ones((b, s), np.int32)
pixels = np.random.default_rng(0).normal(size=(b, 3, 224, 224)).astype(np.float32)

logits, state = engine.prefill(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))
_sync(logits)

N = 100

# ---- A: two dispatches per step (round-1 bench loop) ----
tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
logits2, state = engine.decode_step(tok, state)
_sync(logits2)
best = None
for _ in range(3):
    l2, s2 = logits2, state
    t0 = time.perf_counter()
    for _ in range(N):
        tk = jnp.argmax(l2, axis=-1).astype(jnp.int32)
        l2, s2 = engine.decode_step(tk, s2)
    _sync(l2)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
    logits2, state = l2, s2
print(f"A two-dispatch/step : {N/best:8.1f} tok/s  ({best/N*1e3:.3f} ms/step)")


# ---- B: one dispatch per step, argmax inside ----
@jax.jit
def decode_greedy(params, logits, st: KVState):
    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    valid = st.valid.at[:, st.write_pos].set(True)
    new_logits, cache = paligemma.decode_step(
        params, cfg, token, st.cache, cache_pos=st.write_pos,
        kv_valid=valid, position_ids=st.pos_ids,
    )
    return new_logits, KVState(cache, valid, st.write_pos + 1, st.pos_ids + 1)


l2, s2 = decode_greedy(engine.decode_params, logits2, state)
_sync(l2)
best = None
for _ in range(3):
    lb, sb = l2, s2
    t0 = time.perf_counter()
    for _ in range(N):
        lb, sb = decode_greedy(engine.decode_params, lb, sb)
    _sync(lb)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
    l2, s2 = lb, sb
print(f"B one-dispatch/step : {N/best:8.1f} tok/s  ({best/N*1e3:.3f} ms/step)")


# ---- C/D: K steps per dispatch via lax.scan ----
def make_chunk(k):
    @jax.jit
    def chunk(params, logits, st: KVState):
        def body(carry, _):
            logits, st = carry
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            valid = st.valid.at[:, st.write_pos].set(True)
            nl, cache = paligemma.decode_step(
                params, cfg, token, st.cache, cache_pos=st.write_pos,
                kv_valid=valid, position_ids=st.pos_ids,
            )
            return (nl, KVState(cache, valid, st.write_pos + 1, st.pos_ids + 1)), token
        (logits, st), toks = jax.lax.scan(body, (logits, st), None, length=k)
        return logits, st, toks
    return chunk


for k, label in ((25, "C 25-step chunks   "), (100, "D 100-step one-jit ")):
    fn = make_chunk(k)
    lb, sb, _ = fn(engine.decode_params, l2, s2)
    _sync(lb)
    best = None
    for _ in range(3):
        la, sa = lb, sb
        t0 = time.perf_counter()
        for _ in range(N // k):
            la, sa, _t = fn(engine.decode_params, la, sa)
        _sync(la)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        lb, sb = la, sa
    print(f"{label}: {N/best:8.1f} tok/s  ({best/N*1e3:.3f} ms/step)")
