"""Probe: does software-pipelining the int8->bf16 convert off the MXU
critical path speed up the decode weight stream?

ROADMAP "Performance" diagnosis: in the fused decode kernels each chunk's
`wbuf.astype(bf16)` convert (VPU) is a data dependency of that chunk's
dot (MXU), so unless Mosaic's scheduler hoists it, the MXU idles during
the convert. Schedule B stages chunk c+1's convert into a bf16 VMEM ring
right after its DMA lands, so iteration c's instruction window contains
[dot(c) from bf16 ring] and [convert(c+1)] with NO dependency — the VLIW
scheduler can run them on MXU and VPU concurrently.

Both kernels stream the same (nc, K, bs) int8 stack from HBM with
double-buffered DMA and compute y @ W per chunk into an f32 accumulator.
A: convert-in-dot (production schedule). B: bf16 staging ring.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, BS, NC = 2048, 1024, 48  # 48 chunks x 2 MB = 96 MB streamed per call
B = 1
BW = 819e9


def _kernel_a(y_ref, w_ref, out_ref, wbuf, acc, sems, *, nc):
    def dma(c, s):
        return pltpu.make_async_copy(w_ref.at[c], wbuf.at[s], sems.at[s])

    dma(0, 0).start()
    acc[...] = jnp.zeros_like(acc)
    y = y_ref[...]

    def body(c, carry):
        s = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            dma(c + 1, jax.lax.rem(c + 1, 2)).start()

        dma(c, s).wait()
        acc[...] += jax.lax.dot_general(
            y, wbuf[s].astype(y.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry

    jax.lax.fori_loop(0, nc, body, 0)
    out_ref[...] = acc[...]


def _kernel_b(y_ref, w_ref, out_ref, wbuf, wbf, acc, sems, *, nc):
    def dma(c, s):
        return pltpu.make_async_copy(w_ref.at[c], wbuf.at[s], sems.at[s])

    dma(0, 0).start()
    acc[...] = jnp.zeros_like(acc)
    y = y_ref[...]
    # prologue: chunk 0's convert
    dma(0, 0).wait()
    dma(1, 1).start()
    wbf[0] = wbuf[0].astype(wbf.dtype)

    def body(c, carry):
        s = jax.lax.rem(c, 2)
        ns = jax.lax.rem(c + 1, 2)

        # stage chunk c+1: wait its DMA, convert into the bf16 ring —
        # independent of dot(c), so VPU convert overlaps the MXU dot
        @pl.when(c + 1 < nc)
        def _():
            dma(c + 1, ns).wait()

            @pl.when(c + 2 < nc)
            def _():
                dma(c + 2, s).start()

            wbf[ns] = wbuf[ns].astype(wbf.dtype)

        acc[...] += jax.lax.dot_general(
            y, wbf[s], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry

    jax.lax.fori_loop(0, nc, body, 0)
    out_ref[...] = acc[...]


def build(kernel, staged):
    scratch = [
        pltpu.VMEM((2, K, BS), jnp.int8),
    ]
    if staged:
        scratch.append(pltpu.VMEM((2, K, BS), jnp.bfloat16))
    scratch += [
        pltpu.VMEM((B, BS), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        functools.partial(kernel, nc=NC),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, K), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((B, BS), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, BS), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def _sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, n=50, reps=3):
    @jax.jit
    def run(y, w):
        def body(i, yy):
            o = fn(yy.astype(jnp.bfloat16), w)  # (B, BS)
            return jnp.concatenate([o, o], -1) * 1e-6  # (B, K) carry

        return jax.lax.fori_loop(0, n, body, y.astype(jnp.float32))

    o = run(*args); _sync(o)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(*args)
        _sync(o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / n * 1e3


y = jax.random.normal(jax.random.PRNGKey(0), (B, K), jnp.bfloat16)
w = jax.random.randint(jax.random.PRNGKey(1), (NC, K, BS), -127, 127, jnp.int8)

bytes_call = w.size
sol_ms = bytes_call / BW * 1e3
print(f"stream {bytes_call/2**20:.0f} MB/call, DMA SoL {sol_ms:.3f} ms", flush=True)

fa = build(_kernel_a, staged=False)
fb = build(_kernel_b, staged=True)
# correctness cross-check
oa = np.asarray(fa(y, w))
ob = np.asarray(fb(y, w))
print(f"A vs B max rel err: {np.max(np.abs(oa-ob))/(np.max(np.abs(oa))+1e-9):.2e}",
      flush=True)

ma = timeit(fa, y, w)
mb = timeit(fb, y, w)
print(f"A convert-in-dot : {ma:.3f} ms ({100*sol_ms/ma:.1f}% of DMA SoL)", flush=True)
print(f"B staged convert : {mb:.3f} ms ({100*sol_ms/mb:.1f}% of DMA SoL)", flush=True)
