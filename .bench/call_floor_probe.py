"""Locate the fixed per-pallas_call cost on this runtime.

paged_dma_probe.py showed kernel wall time is FLAT vs bytes copied
(4.2 MB and 33.6 MB both ~175 us) -> a fixed floor per pallas_call.
This probe measures: (a) a do-nothing kernel, (b) + scalar prefetch,
(c) a grid that does 18x the work in ONE call (the amortization the
grid-over-layers decode kernel exploits).
"""

import sys

sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(f, args, inner):
    out = f(*args)
    sync(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(10):
            o = f(*args)
        sync(o)
        dt = (time.perf_counter() - t0) / 10 / inner
        best = dt if best is None else min(best, dt)
    return best


def _empty_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def _empty_grid_kernel(x_ref, o_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[...] = x_ref[...] + 1.0


def _prefetch_kernel(a_ref, b_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...] + a_ref[0].astype(jnp.float32)


def _dma_grid_kernel(start_ref, pool_ref, o_ref, buf, sem, *, p_sub, n_pages,
                     batch):
    s = pl.program_id(1)  # super-block
    n_sb = pl.num_programs(1)

    def dma(r, sb, slot):
        first = jnp.clip(start_ref[r, sb], 0, n_pages - p_sub)
        return pltpu.make_async_copy(
            pool_ref.at[pl.ds(first, p_sub), :, :],
            buf.at[slot, r],
            sem.at[slot, r],
        )

    @pl.when(s == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)
        for r in range(batch):
            dma(r, 0, 0).start()

    @pl.when(s + 1 < n_sb)
    def _pref():
        for r in range(batch):
            dma(r, s + 1, jax.lax.rem(s + 1, 2)).start()

    slot = jax.lax.rem(s, 2)
    for r in range(batch):
        dma(r, s, slot).wait()
    o_ref[...] = o_ref[...] + buf[slot, 0, 0, :8, :128].astype(jnp.float32)


def main():
    x = jnp.ones((8, 128), jnp.float32)
    L = 18

    # (a) do-nothing kernel, 18 calls in one jit
    simple = pl.pallas_call(
        _empty_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )

    def many_simple(x):
        return jax.lax.fori_loop(0, L, lambda i, a: simple(a), x)

    t = timeit(jax.jit(many_simple), (x,), L)
    print(f"empty kernel:            {t*1e6:7.1f} us/call", flush=True)

    # (b) + scalar prefetch (2 args), 18 calls
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, 128), lambda g, a, b: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda g, a, b: (0, 0)),
    )
    pref = pl.pallas_call(
        _prefetch_kernel, grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    a = jnp.arange(16, dtype=jnp.int32)
    b = jnp.arange(256, dtype=jnp.int32).reshape(16, 16)

    def many_pref(x):
        return jax.lax.fori_loop(0, L, lambda i, acc: pref(a, b, acc), x)

    t = timeit(jax.jit(many_pref), (x,), L)
    print(f"empty + scalar prefetch: {t*1e6:7.1f} us/call", flush=True)

    # (c) one call, grid=(18,): same "work" as 18 empty calls
    g18 = pl.pallas_call(
        _empty_grid_kernel, grid=(L,),
        in_specs=[pl.BlockSpec((8, 128), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    def many_g18(x):
        return jax.lax.fori_loop(0, 6, lambda i, a: g18(a), x)

    t = timeit(jax.jit(many_g18), (x,), 6 * L)
    print(f"grid-18 kernel:          {t*1e6:7.1f} us/grid-step", flush=True)

    # (d) DMA kernel with grid=(18, n_super): 18 x 16.8 MB in ONE call
    B, PS, KV, D = 16, 64, 1024, 256
    P_MAX = KV // PS
    N_PAGES = B * P_MAX + 8
    p_sub = 8
    n_super = P_MAX // p_sub
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.normal(size=(N_PAGES, PS, D)) * 0.1, jnp.bfloat16)
    start = jnp.asarray(
        (np.arange(B * P_MAX).reshape(B, P_MAX) + 1)[:, ::p_sub], jnp.int32
    )
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_super),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, 128), lambda l, s, st: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, B, p_sub, PS, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
    )
    dmak = pl.pallas_call(
        functools.partial(_dma_grid_kernel, p_sub=p_sub, n_pages=N_PAGES,
                          batch=B),
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )

    def many_dma(x):
        def step(i, acc):
            return acc + dmak(start + acc[:1, :1].astype(jnp.int32) * 0, pool)

        return jax.lax.fori_loop(0, 4, step, x * 0)

    bytes_per_call = L * B * KV * D * 2  # one pool (k-only analog)
    t = timeit(jax.jit(many_dma), (x,), 4)
    print(
        f"grid-(18,{n_super}) DMA:       {t*1e6:7.1f} us/call for "
        f"{bytes_per_call/1e6:.0f} MB -> {bytes_per_call/t/1e9:.0f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
