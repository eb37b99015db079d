"""Pallas decode-attention vs XLA gqa-over-full-cache at serving shapes.

Loops 18x inside one jit (one call per decoder layer, like the real step)
with a data dependency, timed with a host readback.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from paligemma_tpu.kernels.decode_attention import decode_attention, reference_decode_attention

def sync(x): return np.asarray(jax.device_get(x[(0,) * x.ndim]))

def bench(b, s_max, kv_len_val, hq=8, hkv=1, d=256, layers=18):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, hq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (layers, b, s_max, hkv, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (layers, b, s_max, hkv, d), jnp.bfloat16)
    kv_len = jnp.full((b,), kv_len_val, jnp.int32)

    REPS = 20

    def run(fn):
        @jax.jit
        def step(q, k, v, kv_len):
            def outer(_, carry):
                def body(c, kv):
                    kl, vl = kv
                    o = fn(c, kl, vl, kv_len, kv_len, kv_len)
                    return o.astype(c.dtype), None
                o, _ = jax.lax.scan(body, carry, (k, v))
                return o
            return jax.lax.fori_loop(0, REPS, outer, q)
        o = step(q, k, v, kv_len); sync(o)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            o = step(o, k, v, kv_len)
            sync(o)
            dt = (time.perf_counter() - t0) / REPS
            best = dt if best is None else min(best, dt)
        return best

    t_pallas = run(decode_attention)
    t_xla = run(reference_decode_attention)
    bytes_needed = layers * b * kv_len_val * d * hkv * 2 * 2
    bytes_full = layers * b * s_max * d * hkv * 2 * 2
    print(f"B={b} S_max={s_max} kv_len={kv_len_val}: pallas {t_pallas*1e3:7.3f} ms"
          f" ({bytes_needed/t_pallas/1e9:5.0f} GB/s eff) | xla {t_xla*1e3:7.3f} ms"
          f" ({bytes_full/t_xla/1e9:5.0f} GB/s)")

for b in (1, 8):
    for kv in (256, 1024, 2048):
        bench(b, 2048, kv)
