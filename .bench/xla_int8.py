import jax, jax.numpy as jnp, numpy as np, time, functools
def sync(x): return np.asarray(jax.device_get(x[(0,)*x.ndim]))
ITERS = 100
def bench(loop, x0, *ws):
    sync(loop(x0, *ws)); best=1e9
    for _ in range(3):
        t0=time.perf_counter(); sync(loop(x0, *ws)); best=min(best,(time.perf_counter()-t0)/ITERS)
    return best
key = jax.random.PRNGKey(0)
for (k, n, name) in [(2048, 16384, "gate"), (2048, 65536, "head_q"), (2048, 257152, "head")]:
    k1, k2, key = jax.random.split(key, 3)
    wbf = jax.random.normal(k1, (k, n), jnp.bfloat16)
    w8 = jax.random.randint(k2, (k, n), -127, 127, jnp.int8)
    s = jnp.full((n,), 0.01, jnp.float32)
    x = jax.random.normal(key, (1, k), jnp.bfloat16)

    @jax.jit
    def loop_bf(x0, wbf):
        return jax.lax.fori_loop(0, ITERS, lambda i, xx: xx + (xx @ wbf)[:, :1]*0, x0)
    @jax.jit
    def loop_i8(x0, w8, s):
        def body(i, xx):
            o = (xx @ w8.astype(jnp.bfloat16)) * s
            return xx + o[:, :1].astype(xx.dtype)*0
        return jax.lax.fori_loop(0, ITERS, body, x0)

    t_bf = bench(loop_bf, x, wbf)
    t_x8 = bench(loop_i8, x, w8, s)
    print(f"{name}: bf16 {t_bf*1e6:5.0f}us ({2*k*n/t_bf/1e9:4.0f} GB/s) | xla-i8 {t_x8*1e6:5.0f}us ({k*n/t_x8/1e9:4.0f} GB/s)", flush=True)
