"""What does this chip actually sustain from HBM?

1. pure-stream ceiling: reduce a ~2 GB int8 buffer (read-only traffic);
2. the serving int8 matmul at the decode-dominant shapes (gateup/down/head),
   exactly as matmul_any dispatches it;
3. variants: fp32 accum-type, transposed (n-major) layout.

All loops run INSIDE one jit (lax.fori_loop) so tunnel dispatch overhead
can't pollute the numbers; sync via host readback (CLAUDE.md).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return np.asarray(jax.device_get(x.reshape(-1)[0]))


def timeit(fn, *args, iters=50):
    fn_j = jax.jit(fn, static_argnames=("iters",))
    out = fn_j(*args, iters=iters)
    _sync(out)
    t0 = time.perf_counter()
    out = fn_j(*args, iters=iters)
    _sync(out)
    dt = time.perf_counter() - t0
    return dt / iters


K, NGU, ND, NH = 2048, 32768, 2048, 257152
key = jax.random.PRNGKey(0)
w_gu = jax.random.randint(key, (K, NGU), -127, 127, jnp.int8)
w_dn = jax.random.randint(key, (NGU // 2, ND), -127, 127, jnp.int8)
w_hd = jax.random.randint(key, (K, NH), -127, 127, jnp.int8)
s_gu = jnp.ones((NGU,), jnp.float32)
s_dn = jnp.ones((ND,), jnp.float32)
s_hd = jnp.ones((NH,), jnp.float32)
x = jax.random.normal(key, (1, K), jnp.bfloat16)
x_dn = jax.random.normal(key, (1, NGU // 2), jnp.bfloat16)

BW = 819e9

# 1. pure stream: int32 sum over the int8 buffer
def stream(w, iters=50):
    def body(i, acc):
        return acc + jnp.sum(w.astype(jnp.int32)) + i
    return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.int32))

for name, w in [("gu 67MB", w_gu), ("head 527MB", w_hd)]:
    t = timeit(stream, w, iters=30)
    gbs = w.size / t / 1e9
    print(f"stream {name}: {t*1e3:.3f} ms -> {gbs:.0f} GB/s ({gbs/8.19:.1f}% of 819)")

# 2. current matmul path (convert-to-x.dtype inside dot, scale after)
def mm_cur(x, w, s, iters=50):
    def body(i, acc):
        out = jax.lax.dot_general(
            x, w.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + (out * s).astype(x.dtype)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros((1, w.shape[1]), x.dtype))

for name, w, s, xx in [("gateup", w_gu, s_gu, x), ("down", w_dn, s_dn, x_dn),
                       ("head", w_hd, s_hd, x)]:
    t = timeit(mm_cur, xx, w, s, iters=30)
    gbs = w.size / t / 1e9
    print(f"mm-cur {name}: {t*1e3:.3f} ms -> {gbs:.0f} GB/s ({gbs/8.19:.1f}%)")

# 3. variant: fp32 convert instead of bf16
def mm_f32(x, w, s, iters=50):
    def body(i, acc):
        out = jax.lax.dot_general(
            x.astype(jnp.float32), w.astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return acc + (out * s).astype(x.dtype)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros((1, w.shape[1]), x.dtype))

t = timeit(mm_f32, x, w_gu, s_gu, iters=30)
print(f"mm-f32 gateup: {t*1e3:.3f} ms -> {w_gu.size/t/1e9:.0f} GB/s")

# 4. variant: n-major (transposed) weight, dot over last dims
w_gu_t = w_gu.T.copy()  # (NGU, K) n-major

def mm_nmaj(x, wt, s, iters=50):
    def body(i, acc):
        out = jax.lax.dot_general(
            x, wt.astype(x.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + (out * s).astype(x.dtype)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros((1, wt.shape[0]), x.dtype))

t = timeit(mm_nmaj, x, w_gu_t, s_gu, iters=30)
print(f"mm-nmajor gateup: {t*1e3:.3f} ms -> {w_gu_t.size/t/1e9:.0f} GB/s")

# 5. all three chained (one layer's MLP + head worth of bytes) to check
# whether back-to-back fusions lose stream time at kernel boundaries
def chained(x, iters=20):
    def body(i, acc):
        a = jax.lax.dot_general(x, w_gu.astype(x.dtype), (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        a = (a * s_gu).astype(x.dtype)
        g, u = a[:, :NGU // 2], a[:, NGU // 2:]
        h = g * u
        b = jax.lax.dot_general(h, w_dn.astype(x.dtype), (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        b = (b * s_dn).astype(x.dtype)
        c = jax.lax.dot_general(b[:, :K], w_hd.astype(x.dtype), (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + (c * s_hd).astype(x.dtype)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros((1, NH), x.dtype))

t = timeit(chained, x, iters=20)
tot = w_gu.size + w_dn.size + w_hd.size
print(f"chained gu+dn+head: {t*1e3:.3f} ms -> {tot/t/1e9:.0f} GB/s ({tot/t/1e9/8.19:.1f}%)")
