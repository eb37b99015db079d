"""Can XLA do int4-packed GEMV faster than int8? (Pallas int4 is
toolchain-blocked; this probes the pure-XLA unpack-into-dot route.)

K-halves packing: rows [0,K/2) in the hi nibble, [K/2,K) in the lo nibble
of an int8 (K/2, N) array. y = x_hi @ hi + x_lo @ lo.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

K, N = 2048, 32768
w8 = jax.random.randint(jax.random.PRNGKey(0), (K, N), -8, 8, jnp.int8)
hi = w8[: K // 2].astype(jnp.int8)
lo = w8[K // 2 :].astype(jnp.int8)
packed = ((hi.astype(jnp.int32) << 4) | (lo.astype(jnp.int32) & 0xF)).astype(jnp.int8)
x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.bfloat16)

def sync(v): return np.asarray(jax.device_get(v[(0,) * v.ndim]))

def timeit(name, fn, *args, nbytes):
    f = jax.jit(fn)
    o = f(x, *args); sync(o)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        o2 = f(x, *args)
        for _ in range(199):
            o2 = f(x * (1 + o2[0, :1] * 0), *args)  # chain dependency
        sync(o2)
        dt = (time.perf_counter() - t0) / 200
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best*1e6:8.1f} us  ({nbytes/best/1e9:6.1f} GB/s)")

def int8_mm(x, w):
    return x @ w.astype(jnp.bfloat16)

def int4_mm(x, p):
    h = jax.lax.shift_right_arithmetic(p.astype(jnp.int32), 4).astype(jnp.bfloat16)
    l = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p.astype(jnp.int32), 28), 28
    ).astype(jnp.bfloat16)
    return x[:, : K // 2] @ h + x[:, K // 2 :] @ l

# correctness
y8 = int8_mm(x.astype(jnp.float32), w8)
y4 = int4_mm(x.astype(jnp.float32), packed)
print("max err:", float(jnp.max(jnp.abs(y8 - y4))))

timeit("int8 GEMV        ", int8_mm, w8, nbytes=K * N)
timeit("int4-packed GEMV ", int4_mm, packed, nbytes=K * N // 2)
