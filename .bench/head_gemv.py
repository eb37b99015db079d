"""LM-head GEMV layout shootout: (1,2048) x (2048,257152) int8 -> fp32.

Profiled at 0.718 ms/step (~82% of the 0.643 ms HBM SoL). Try:
  A. current: w8 (H,V) k-major, XLA fused convert-into-dot
  B. w8t (V,H) n-major, XLA dot on last axis
  C. n-major Pallas kernel (kernels/quant.py int8_matmul_nmajor)
  D. k-major Pallas kernel
  E. w8 (H,V) einsum with fp32 accumulation explicit
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from paligemma_tpu.kernels import quant

H, V = 2048, 257152
key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (H, V), jnp.bfloat16) * 0.02
q = quant.quantize_int8(w)
qt = {"w8t": jnp.swapaxes(q["w8"], 0, 1), "s": q["s"]}
x = jax.random.normal(jax.random.PRNGKey(1), (1, H), jnp.bfloat16)

def sync(x): return np.asarray(jax.device_get(x[(0,) * x.ndim]))

def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args); sync(o)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*args)
        for _ in range(99):
            o = f(*args)
        sync(o)
        dt = (time.perf_counter() - t0) / 100
        best = dt if best is None else min(best, dt)
    gbs = (H * V + 40e6 * 0) / best / 1e9
    print(f"{name}: {best*1e3:7.3f} ms  ({H*V/best/1e9:6.1f} GB/s)")

timeit("A w8 k-major XLA  ", lambda x, w8, s: (x.astype(jnp.bfloat16) @ w8.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16), x, q["w8"], q["s"])
timeit("B w8t n-major XLA ", lambda x, w8t, s: jax.lax.dot_general(x.astype(jnp.bfloat16), w8t.astype(jnp.bfloat16), (((1,), (1,)), ((), ()))) * s, x, qt["w8t"], qt["s"])
timeit("C n-major Pallas  ", lambda x, w8t, s: quant.int8_matmul_nmajor(x, w8t, s), x, qt["w8t"], qt["s"])
timeit("D k-major Pallas  ", lambda x, w8, s: quant.int8_matmul(x, w8, s), x, q["w8"], q["s"])
timeit("E fp32-acc dot    ", lambda x, w8, s: jax.lax.dot_general(x, w8.astype(jnp.bfloat16), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) * s, x, q["w8"], q["s"])
