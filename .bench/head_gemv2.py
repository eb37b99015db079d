"""Head GEMV layouts, timed inside ONE jit (fori_loop with a data dependency
so nothing hoists). Device-rate numbers, no dispatch pollution."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from paligemma_tpu.kernels import quant

H, V = 2048, 257152
N = 50
w = jax.random.normal(jax.random.PRNGKey(0), (H, V), jnp.bfloat16) * 0.02
q = quant.quantize_int8(w)
qt = {"w8t": jnp.swapaxes(q["w8"], 0, 1), "s": q["s"]}
x0 = jax.random.normal(jax.random.PRNGKey(1), (1, H), jnp.bfloat16)

def sync(x): return np.asarray(jax.device_get(x[(0,) * x.ndim]))

def loop(name, mm, *wargs):
    @jax.jit
    def run(x, *wargs):
        def body(i, x):
            o = mm(x, *wargs)  # (1, V) fp32
            # cheap fold of the output back into x: keeps the dependency
            r = jnp.sum(o[:, :8], axis=-1, keepdims=True).astype(jnp.bfloat16)
            return x + r * 1e-9
        return jax.lax.fori_loop(0, N, body, x)
    o = run(x0, *wargs); sync(o)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = run(x0, *wargs); sync(o)
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best*1e3:7.3f} ms  ({H*V/best/1e9:6.1f} GB/s)")

loop("A w8 k-major XLA  ", lambda x, w8, s: (x @ w8.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16), q["w8"], q["s"])
loop("B w8t n-major XLA ", lambda x, w8t, s: jax.lax.dot_general(x, w8t.astype(jnp.bfloat16), (((1,), (1,)), ((), ()))) * s, qt["w8t"], qt["s"])
loop("E fp32-acc        ", lambda x, w8, s: jax.lax.dot_general(x, w8.astype(jnp.bfloat16), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) * s, q["w8"], q["s"])
