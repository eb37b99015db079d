"""Isolate the paged-attention kernel's costs: DMA-only vs compute-only.

DMA-only: a kernel whose grid walks super-blocks and copies K/V page runs
into double-buffered VMEM rings exactly like paged_decode_attention_runs,
but does no math (one trivial store per step keeps it live). Sweeping
pages_per_step and run-vs-page DMA shapes tells us whether the ~160 us
measured kernel time is transfer-bound, issue-bound, or compute-bound.
"""

import sys

sys.path.insert(0, "/root/repo")

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def _dma_kernel(
    start_ref,  # (B, n_super) int32 first physical page per super-block
    pt_ref,  # (B, P_max) int32
    k_pool_ref,
    v_pool_ref,
    o_ref,  # (8, 128)
    kbuf,
    vbuf,
    sems,
    *,
    p_sub,
    page_size,
    head_dim,
    n_pages,
    batch,
    mode,  # "run" | "page"
):
    s = pl.program_id(0)
    n_sb = pl.num_programs(0)

    def dma_run(pool_ref, buf, kv, r, sb, slot):
        first = jnp.clip(start_ref[r, sb], 0, n_pages - p_sub)
        return pltpu.make_async_copy(
            pool_ref.at[pl.ds(first, p_sub), :, :],
            buf.at[slot, r],
            sems.at[kv, slot, r],
        )

    def dma_page(pool_ref, buf, kv, r, sb, slot, j):
        pid = pt_ref[r, jnp.minimum(sb * p_sub + j, pt_ref.shape[1] - 1)]
        pid = jnp.clip(pid, 0, n_pages - 1)
        return pltpu.make_async_copy(
            pool_ref.at[pid, :, :],
            buf.at[slot, r, j],
            sems.at[kv, slot, r],
        )

    def start_super(sb, slot):
        for r in range(batch):
            if mode == "run":
                dma_run(k_pool_ref, kbuf, 0, r, sb, slot).start()
                dma_run(v_pool_ref, vbuf, 1, r, sb, slot).start()
            else:
                for j in range(p_sub):
                    dma_page(k_pool_ref, kbuf, 0, r, sb, slot, j).start()
                    dma_page(v_pool_ref, vbuf, 1, r, sb, slot, j).start()

    def wait_super(sb, slot):
        for r in range(batch):
            if mode == "run":
                dma_run(k_pool_ref, kbuf, 0, r, sb, slot).wait()
                dma_run(v_pool_ref, vbuf, 1, r, sb, slot).wait()
            else:
                for j in range(p_sub):
                    dma_page(k_pool_ref, kbuf, 0, r, sb, slot, j).wait()
                    dma_page(v_pool_ref, vbuf, 1, r, sb, slot, j).wait()

    @pl.when(s == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)
        start_super(0, 0)

    @pl.when(s + 1 < n_sb)
    def _prefetch():
        start_super(s + 1, jax.lax.rem(s + 1, 2))

    slot = jax.lax.rem(s, 2)
    wait_super(s, slot)
    # trivial use so the copies aren't dead: one row of one buffer
    o_ref[...] = o_ref[...] + kbuf[slot, 0, 0, :8, :128].astype(jnp.float32)


def dma_only(q_dtype, k_pool, v_pool, start, table, p_sub, mode):
    n_pages, page_size, d = k_pool.shape
    b, n_super = start.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda s, st, pt: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, b, p_sub, page_size, d), q_dtype),
            pltpu.VMEM((2, b, p_sub, page_size, d), q_dtype),
            pltpu.SemaphoreType.DMA((2, 2, b)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _dma_kernel, p_sub=p_sub, page_size=page_size, head_dim=d,
            n_pages=n_pages, batch=b, mode=mode,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(start, table, k_pool, v_pool)


def main():
    B = int(os.environ.get("B", "16"))
    PS = int(os.environ.get("PS", "64"))
    KV = int(os.environ.get("KV", "1024"))
    D = 256
    P_MAX = KV // PS
    N_PAGES = B * P_MAX + 8
    rng = np.random.default_rng(0)
    k_pool = jnp.asarray(
        rng.normal(size=(N_PAGES, PS, D)) * 0.1, jnp.bfloat16
    )
    v_pool = jnp.asarray(
        rng.normal(size=(N_PAGES, PS, D)) * 0.1, jnp.bfloat16
    )
    contig = np.arange(B * P_MAX).reshape(B, P_MAX) + 1
    useful = B * KV * D * 2 * 2
    print(f"B={B} PS={PS} KV={KV} useful {useful/1e6:.1f} MB", flush=True)
    L = 18
    for p_sub in (4, 8, 16):
        if p_sub > P_MAX:
            continue
        n_super = P_MAX // p_sub
        start = jnp.asarray(contig[:, ::p_sub], jnp.int32)
        table = jnp.asarray(contig, jnp.int32)
        for mode in ("run", "page"):
            def many(k_pool, v_pool, start, table):
                def step(_, acc):
                    o = dma_only(
                        jnp.bfloat16, k_pool, v_pool,
                        start + acc[:1, :1].astype(jnp.int32) * 0,
                        table, p_sub, mode,
                    )
                    return acc + o

                return jax.lax.fori_loop(
                    0, L, step, jnp.zeros((8, 128), jnp.float32)
                )

            f = jax.jit(many)
            try:
                out = f(k_pool, v_pool, start, table)
                sync(out)
            except Exception as e:
                print(f"p{p_sub} {mode}: CRASH {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
                continue
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                o = out
                for _ in range(10):
                    o = f(k_pool, v_pool, start, table)
                sync(o)
                dt = (time.perf_counter() - t0) / 10 / L
                best = dt if best is None else min(best, dt)
            issues = B * 2 * n_super * (1 if mode == "run" else p_sub)
            print(
                f"p{p_sub} {mode}: {best*1e6:.1f} us ({issues} issues) -> "
                f"{useful/best/1e9:.1f} GB/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
