import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from paligemma_tpu.kernels.quant4 import int4_matmul, quantize_int4
def sync(x): return np.asarray(jax.device_get(x[(0,)*x.ndim]))
key = jax.random.PRNGKey(0)
for (k, n, name) in [(2048, 32768, "gateup"), (16384, 2048, "down"), (2048, 257152, "head")]:
    k1, key = jax.random.split(key)
    w = jax.random.normal(k1, (k, n), jnp.bfloat16) * 0.05
    q = quantize_int4(w)
    x = jax.random.normal(key, (1, k), jnp.bfloat16)
    @jax.jit
    def loop(x, w4p, s):
        def body(i, xx):
            o = int4_matmul(xx, w4p, s)
            return xx + (o[:, :1]).astype(xx.dtype)*0
        return jax.lax.fori_loop(0, 50, body, x)
    sync(loop(x, q["w4p"], q["s"]))
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); sync(loop(x, q["w4p"], q["s"])); best=min(best,(time.perf_counter()-t0)/50)
    print(f"RESULT {name}: {best*1e6:5.0f} us ({k*n/2/best/1e9:4.0f} GB/s int4-effective)", flush=True)
