"""Whole-layer fused decode kernel on TPU at 3B geometry: correctness of a
full decode step vs the XLA path + timed N-step chains (incl. head)."""
import time
import numpy as np
import jax, jax.numpy as jnp

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.kernels import decode_layer
from paligemma_tpu.models import paligemma, gemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

N = 200
BW = 819e9


def _sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, reps=3):
    o = fn(*args); _sync(o[0] if isinstance(o, tuple) else o)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        _sync(o[0] if isinstance(o, tuple) else o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / N * 1e3


cfg = paligemma_3b_224()
tc = cfg.text_config
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
lm = quantize_lm_for_serving(params)["lm"]
del params
packed_layers = jax.jit(decode_layer.repack_layers)(lm["layers"])
lm_packed = dict(lm)
lm_packed["layers"] = packed_layers

B, S = 1, 2048
POS = 600
BUCKET = 1024

cache = gemma.init_kv_cache(tc, B, S, jnp.bfloat16)
# fill the cache with noise so attention reads real data
kf = jax.random.normal(jax.random.PRNGKey(1), cache["k"].shape, jnp.bfloat16) * 0.1
vf = jax.random.normal(jax.random.PRNGKey(2), cache["v"].shape, jnp.bfloat16) * 0.1
valid = jnp.zeros((B, S), bool).at[:, : POS + 1].set(True)
emb = jax.random.normal(jax.random.PRNGKey(3), (B, 1, tc.hidden_size), jnp.bfloat16) * 0.02


def step(lmx, fused, c, emb, valid):
    logits, c2 = gemma.forward(
        lmx, tc, emb, jnp.full((B, 1), POS + 1, jnp.int32), c,
        cache_pos=jnp.asarray(POS, jnp.int32), kv_valid=valid,
        kv_bucket=BUCKET, fused_layer=fused,
    )
    return logits, c2


# correctness
l_ref, c_ref = jax.jit(lambda lmx, c, e, v: step(lmx, False, c, e, v))(lm, {"k": kf, "v": vf}, emb, valid)
l_fus, c_fus = jax.jit(lambda lmx, c, e, v: step(lmx, True, c, e, v))(lm_packed, {"k": kf, "v": vf}, emb, valid)
a, b = np.asarray(l_ref, np.float32), np.asarray(l_fus, np.float32)
rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
print(f"logits rel_err {rel:.5f}  greedy match: {np.argmax(a) == np.argmax(b)}", flush=True)
kr = np.asarray(c_ref["k"][:, :, POS], np.float32)
ku = np.asarray(c_fus["k"][:, :, POS], np.float32)
print(f"cache row rel_err {np.max(np.abs(kr - ku)) / (np.max(np.abs(kr)) + 1e-9):.5f}", flush=True)


def chain(lmx, fused):
    @jax.jit
    def run(lmx, cache, x, valid):
        def body(i, carry):
            h, c = carry
            logits, c = gemma.forward(
                lmx, tc, h, jnp.full((B, 1), POS + 1, jnp.int32), c,
                cache_pos=jnp.asarray(POS, jnp.int32), kv_valid=valid,
                kv_bucket=BUCKET, fused_layer=fused,
            )
            tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, 0]
            e = jnp.take(lmx["embed"], tok, axis=0)[:, None, :].astype(jnp.bfloat16)
            return e * 0.01, c

        h, c = jax.lax.fori_loop(0, N, body, (x, cache))
        return h

    return timeit(run, lmx, {"k": kf, "v": vf}, emb, valid)


ms = chain(lm, False)
print(f"XLA    decode step: {ms:.3f} ms", flush=True)
ms = chain(lm_packed, True)
print(f"Fused  decode step: {ms:.3f} ms", flush=True)
