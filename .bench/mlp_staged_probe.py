"""A/B the int8->bf16 convert schedule at the REAL decode-MLP shape.

convert_pipeline_probe.py (single 2 MB stream) was DMA-latency-bound
(18% of SoL) and showed nothing; this probe replicates the production
chunk loop exactly — three concurrent weight streams (gate/up/down),
nc=16 chunks of bs=1024 at K=2048, fp32 accumulator, GeGLU — and times
an 18-"layer" in-jit chain per step, like the fused grid-over-layers
kernel's MLP phase.

A: production schedule (decode_mlp._kernel — convert feeds the dot).
B: staged schedule — chunk c+1's gate/up/down convert into a bf16 ring
   right after its DMA lands, so dot(c) [MXU] and convert(c+1) [VPU]
   are independent in the same instruction window.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paligemma_tpu.ops.activations import gelu_tanh

K, BS, NC = 2048, 1024, 16  # I = 16384
B = 1
LAYERS = 18
BW = 819e9


def _kernel_a(y_ref, gate_ref, up_ref, dn_ref, gs_ref, us_ref, ds_ref,
              out_ref, gbuf, ubuf, dbuf, acc, sems, *, nc, bs):
    def dma_g(c, s):
        return pltpu.make_async_copy(gate_ref.at[c], gbuf.at[s], sems.at[0, s])

    def dma_u(c, s):
        return pltpu.make_async_copy(up_ref.at[c], ubuf.at[s], sems.at[1, s])

    def dma_d(c, s):
        return pltpu.make_async_copy(
            dn_ref.at[pl.ds(c * bs, bs), :], dbuf.at[s], sems.at[2, s]
        )

    dma_g(0, 0).start(); dma_u(0, 0).start(); dma_d(0, 0).start()
    acc[...] = jnp.zeros_like(acc)
    y = y_ref[...]

    def body(c, carry):
        s = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            ns = jax.lax.rem(c + 1, 2)
            dma_g(c + 1, ns).start(); dma_u(c + 1, ns).start()
            dma_d(c + 1, ns).start()

        dma_g(c, s).wait(); dma_u(c, s).wait()
        g = jax.lax.dot_general(y, gbuf[s].astype(y.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = jax.lax.dot_general(y, ubuf[s].astype(y.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        t = (gelu_tanh(g * gs_ref[0, c]) * (u * us_ref[0, c])).astype(y.dtype)
        dma_d(c, s).wait()
        acc[...] += jax.lax.dot_general(t, dbuf[s].astype(y.dtype),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, nc, body, 0)
    out_ref[...] = (acc[...] * ds_ref[0]).astype(out_ref.dtype)


def _kernel_b(y_ref, gate_ref, up_ref, dn_ref, gs_ref, us_ref, ds_ref,
              out_ref, gbuf, ubuf, dbuf, gbf, ubf, dbf, acc, sems, *, nc, bs):
    def dma_g(c, s):
        return pltpu.make_async_copy(gate_ref.at[c], gbuf.at[s], sems.at[0, s])

    def dma_u(c, s):
        return pltpu.make_async_copy(up_ref.at[c], ubuf.at[s], sems.at[1, s])

    def dma_d(c, s):
        return pltpu.make_async_copy(
            dn_ref.at[pl.ds(c * bs, bs), :], dbuf.at[s], sems.at[2, s]
        )

    dma_g(0, 0).start(); dma_u(0, 0).start(); dma_d(0, 0).start()
    acc[...] = jnp.zeros_like(acc)
    y = y_ref[...]
    # prologue: stage chunk 0
    dma_g(0, 0).wait(); dma_u(0, 0).wait(); dma_d(0, 0).wait()
    dma_g(1, 1).start(); dma_u(1, 1).start(); dma_d(1, 1).start()
    gbf[0] = gbuf[0].astype(gbf.dtype)
    ubf[0] = ubuf[0].astype(ubf.dtype)
    dbf[0] = dbuf[0].astype(dbf.dtype)

    def body(c, carry):
        s = jax.lax.rem(c, 2)
        ns = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < nc)
        def _():
            dma_g(c + 1, ns).wait(); dma_u(c + 1, ns).wait()
            dma_d(c + 1, ns).wait()

            @pl.when(c + 2 < nc)
            def _():
                dma_g(c + 2, s).start(); dma_u(c + 2, s).start()
                dma_d(c + 2, s).start()

            gbf[ns] = gbuf[ns].astype(gbf.dtype)
            ubf[ns] = ubuf[ns].astype(ubf.dtype)
            dbf[ns] = dbuf[ns].astype(dbf.dtype)

        g = jax.lax.dot_general(y, gbf[s], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = jax.lax.dot_general(y, ubf[s], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        t = (gelu_tanh(g * gs_ref[0, c]) * (u * us_ref[0, c])).astype(y.dtype)
        acc[...] += jax.lax.dot_general(t, dbf[s], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, nc, body, 0)
    out_ref[...] = (acc[...] * ds_ref[0]).astype(out_ref.dtype)


def build(kernel, staged):
    scratch = [
        pltpu.VMEM((2, K, BS), jnp.int8),
        pltpu.VMEM((2, K, BS), jnp.int8),
        pltpu.VMEM((2, BS, K), jnp.int8),
    ]
    if staged:
        scratch += [
            pltpu.VMEM((2, K, BS), jnp.bfloat16),
            pltpu.VMEM((2, K, BS), jnp.bfloat16),
            pltpu.VMEM((2, BS, K), jnp.bfloat16),
        ]
    scratch += [
        pltpu.VMEM((B, K), jnp.float32),
        pltpu.SemaphoreType.DMA((3, 2)),
    ]
    return pl.pallas_call(
        functools.partial(kernel, nc=NC, bs=BS),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, K), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, K), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )


def _sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, args, n=50, reps=3):
    y0, g8, u8, d8, gs, us, ds = args

    @jax.jit
    def run(y, g8, u8, d8, gs, us, ds):
        def body(i, yy):
            o = fn(yy, g8, u8, d8, gs, us, ds)
            return (yy * 0.5 + o * 1e-3).astype(jnp.bfloat16)

        def layer_chain(i, yy):  # 18 "layers" per step, like production
            return jax.lax.fori_loop(0, LAYERS, body, yy)

        return jax.lax.fori_loop(0, n, layer_chain, y0)

    o = run(*args); _sync(o)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(*args)
        _sync(o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / n / LAYERS * 1e3  # ms per layer-MLP


kg = jax.random.PRNGKey(0)
y0 = jax.random.normal(kg, (B, K), jnp.bfloat16) * 0.1
g8 = jax.random.randint(jax.random.PRNGKey(1), (NC, K, BS), -127, 127, jnp.int8)
u8 = jax.random.randint(jax.random.PRNGKey(2), (NC, K, BS), -127, 127, jnp.int8)
d8 = jax.random.randint(jax.random.PRNGKey(3), (NC * BS, K), -127, 127, jnp.int8)
gs = jnp.full((1, NC, BS), 1e-4, jnp.float32)
us = jnp.full((1, NC, BS), 1e-4, jnp.float32)
ds = jnp.full((1, K), 1e-4, jnp.float32)
args = (y0, g8, u8, d8, gs, us, ds)

bytes_layer = g8.size + u8.size + d8.size
sol_ms = bytes_layer / BW * 1e3
print(f"MLP stream {bytes_layer/2**20:.0f} MB/layer, DMA SoL {sol_ms:.3f} ms",
      flush=True)

fa = build(_kernel_a, staged=False)
fb = build(_kernel_b, staged=True)
oa = np.asarray(fa(*args), np.float32)
ob = np.asarray(fb(*args), np.float32)
print(f"A vs B max rel err: {np.max(np.abs(oa-ob))/(np.max(np.abs(oa))+1e-9):.2e}",
      flush=True)

ma = timeit(fa, args)
mb = timeit(fb, args)
print(f"A convert-in-dot : {ma:.3f} ms/layer ({100*sol_ms/ma:.1f}% of DMA SoL)",
      flush=True)
print(f"B staged convert : {mb:.3f} ms/layer ({100*sol_ms/mb:.1f}% of DMA SoL)",
      flush=True)
