"""The chip's PRACTICAL HBM streaming ceiling, measured three ways:

1. XLA reduce over a big int8 buffer (carry-dependent slice, no hoisting)
2. XLA int8 matmul chain at the decode shapes (carry-dependent input)
3. a pure-DMA Pallas kernel: double-buffered 8 MB chunk copies of a 2 GB
   int8 buffer into VMEM, one element consumed per chunk — the decode
   kernel's DMA schedule with the compute removed.

The nominal v5e figure is 819 GB/s; the b1 fused decode step implies
~732 GB/s effective (2.51 GB / 3.43 ms). If (3) lands there too, decode
is AT the practical ceiling and the SoL denominator should say so.
Replaces .bench/bw_ceiling.py, whose loop bodies were loop-invariant and
got hoisted (its numbers measured one call + readback/iters — pitfall 6).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python .bench/dma_ceiling.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    return np.asarray(jax.device_get(x.reshape(-1)[0]))


ITERS = 30
R, C = 2048, 4096  # 8 MB int8 chunk
NCH = 256  # 2 GB total
key = jax.random.PRNGKey(0)
w = jax.random.randint(key, (NCH, R, C), -127, 127, jnp.int8)
total_bytes = w.size


def timeit(fn, *args):
    out = fn(*args)
    _sync(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / ITERS


# --- 1. XLA reduce with a carried data dependency (dynamic slice start
# depends on the accumulator -> the read cannot hoist)
@jax.jit
def xla_stream(w):
    def body(i, acc):
        start = jax.lax.rem(acc, jnp.int32(2))
        sl = jax.lax.dynamic_slice_in_dim(w, start, NCH - 1, 0)
        return acc % 1024 + jnp.sum(sl.astype(jnp.int32)) % 1024

    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


t = timeit(xla_stream, w)
bts = (NCH - 1) * R * C
print(f"XLA reduce stream: {t*1e3:.3f} ms/iter -> {bts/t/1e9:.0f} GB/s "
      f"({bts/t/8.19e9:.1f}% of 819)", flush=True)

# --- 2. XLA int8->bf16 matmul chain (decode MLP shape), carry-dependent
w2 = w.reshape(NCH * R * C // (2048 * 16384), 2048, 16384)  # (64, 2048, 16384)
x0 = jax.random.normal(key, (8, 2048), jnp.bfloat16)
s2 = jnp.ones((w2.shape[-1],), jnp.float32)


@jax.jit
def xla_mm(w2, x0):
    def body(i, carry):
        acc, xx = carry
        tot = jnp.zeros((8, w2.shape[-1]), jnp.float32)
        for g in range(w2.shape[0]):
            tot += jax.lax.dot_general(
                xx, w2[g].astype(xx.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        xx = x0 + tot[:, :2048].astype(x0.dtype) * jnp.bfloat16(1e-8)
        return acc + tot[:, :1].astype(jnp.float32), xx

    acc, _ = jax.lax.fori_loop(
        0, ITERS, body, (jnp.zeros((8, 1), jnp.float32), x0)
    )
    return acc


t = timeit(xla_mm, w2, x0)
print(f"XLA int8 matmul chain: {t*1e3:.3f} ms/iter -> "
      f"{total_bytes/t/1e9:.0f} GB/s ({total_bytes/t/8.19e9:.1f}%)",
      flush=True)


# --- 3. pure-DMA Pallas kernel
def _kernel(x_ref, w_ref, out_ref, wbuf, sems, *, nch):
    def dma(c, s):
        return pltpu.make_async_copy(w_ref.at[c], wbuf.at[s], sems.at[s])

    dma(0, 0).start()

    def body(c, acc):
        s = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(c + 1, jax.lax.rem(c + 1, 2)).start()

        dma(c, s).wait()
        return acc + jnp.sum(wbuf[s][:1, :128].astype(jnp.int32))

    acc = jax.lax.fori_loop(
        0, nch, body, jnp.sum(x_ref[...].astype(jnp.int32))
    )
    out_ref[...] = jnp.full((1, 128), acc, jnp.int32)


def dma_once(x):
    return pl.pallas_call(
        functools.partial(_kernel, nch=NCH),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, R, C), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(x, w)


@jax.jit
def dma_loop(w):
    def body(i, carry):
        acc, xx = carry
        out = dma_once(xx)
        return acc + out[0, 0], xx + out[:1, :] % 2  # carry dependency

    acc, _ = jax.lax.fori_loop(
        0, ITERS, body,
        (jnp.int32(0), jnp.zeros((1, 128), jnp.int32)),
    )
    return acc


t = timeit(dma_loop, w)
print(f"pure-DMA Pallas stream: {t*1e3:.3f} ms/iter -> "
      f"{total_bytes/t/1e9:.0f} GB/s ({total_bytes/t/8.19e9:.1f}%)",
      flush=True)
