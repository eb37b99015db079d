"""A/B the int8->bf16 convert schedule in the greedy-head kernel.

fused_chunk_sweep.py put the head at 77% of its 0.644 ms SoL (0.836 ms,
41 chunks of 12.8 MB) — the largest single contributor to the remaining
decode gap. Per chunk the DMA is ~15.7 us and the VPU convert of 12.8 M
int8 elements is ~13 us; if the convert serializes between DMA-wait and
the dot, per-chunk time is DMA+convert instead of max(DMA, convert).

A: production (kernels/decode_head._kernel — convert feeds the dot).
B: staged — chunk c+1 converts into a bf16 ring right after its DMA
   lands; dot(c) reads the ring, so VPU convert(c+1) and MXU dot(c) are
   independent in the same window.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paligemma_tpu.kernels import decode_head

K, V = 2048, 257152
B = 1
BW = 819e9
N = 100


def _kernel_staged(y_ref, w_ref, s_ref, tok_ref, max_ref, wbuf, wbf, sems,
                   *, nch, bs, n_valid):
    def dma(c, slot):
        return pltpu.make_async_copy(w_ref.at[c], wbuf.at[slot], sems.at[slot])

    dma(0, 0).start()
    y = y_ref[...]
    dma(0, 0).wait()
    dma(1, 1).start()
    wbf[0] = wbuf[0].astype(y.dtype)

    def body(c, carry):
        best_m, best_i = carry
        s = jax.lax.rem(c, 2)
        ns = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(c + 1, ns).wait()

            @pl.when(c + 2 < nch)
            def _():
                dma(c + 2, s).start()

            wbf[ns] = wbuf[ns].astype(y.dtype)

        logits = jax.lax.dot_general(
            y, wbf[s], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s_ref[c]
        logits = logits.astype(jnp.bfloat16).astype(jnp.float32)
        ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + c * bs
        if nch * bs != n_valid:
            logits = jnp.where(ids < n_valid, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        idx = jnp.min(
            jnp.where(logits == m, ids, jnp.int32(2**31 - 1)),
            axis=-1, keepdims=True,
        )
        better = m > best_m
        best_i = jnp.where(better, idx, best_i)
        best_m = jnp.where(better, m, best_m)
        return best_m, best_i

    bsz = y_ref.shape[0]
    neg = jnp.full((bsz, 1), -jnp.inf, jnp.float32)
    zero = jnp.zeros((bsz, 1), jnp.int32)
    best_m, best_i = jax.lax.fori_loop(1, nch, body,
                                       body(0, (neg, zero)))
    tok_ref[...] = best_i
    max_ref[...] = best_m


def head_staged(y, head_blk):
    k = y.shape[-1]
    y2 = y.reshape(-1, k)
    b = y2.shape[0]
    nch, _, bs = head_blk["w8_blk"].shape
    n_valid = head_blk["s"].shape[0]
    tok, mx = pl.pallas_call(
        functools.partial(_kernel_staged, nch=nch, bs=bs, n_valid=n_valid),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, k), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 1), lambda g: (0, 0)),
            pl.BlockSpec((b, 1), lambda g: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, k, bs), jnp.int8),
            pltpu.VMEM((2, k, bs), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(y2, head_blk["w8_blk"], head_blk["s_blk"])
    return tok[:, 0], mx[:, 0]


def _sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def chain(fn, hb, y0, n=N, reps=3):
    @jax.jit
    def run(hb, y):
        def body(i, yy):
            tok = fn(yy, hb)
            t = tok[0] if isinstance(tok, tuple) else tok
            return yy * (1.0 + t[0].astype(jnp.bfloat16) * 1e-9)

        return jax.lax.fori_loop(0, n, body, y)

    o = run(hb, y0); _sync(o)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(hb, y0)
        _sync(o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / n * 1e3


w8 = jax.random.randint(jax.random.PRNGKey(0), (K, V), -127, 127, jnp.int8)
s = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (V,), jnp.float32)) * 1e-3
hq = {"w8": w8, "s": s}
hb = jax.jit(decode_head.repack_head)(hq)
y0 = jax.random.normal(jax.random.PRNGKey(2), (1, K), jnp.bfloat16)

sol = (w8.size + s.size * 4) / BW * 1e3

ta, ma = decode_head.head_argmax_fused(y0, hb, return_max=True)
tb, mb = head_staged(y0, hb)
print(f"argmax match: {int(ta[0])} vs {int(tb[0])}  "
      f"max match: {float(ma[0]):.4f} vs {float(mb[0]):.4f}", flush=True)
assert int(ta[0]) == int(tb[0])

msa = chain(lambda y, h: decode_head.head_argmax_fused(y, h), hb, y0)
msb = chain(head_staged, hb, y0)
print(f"A production : {msa:.3f} ms ({100*sol/msa:.1f}% of head SoL {sol:.3f})",
      flush=True)
print(f"B staged     : {msb:.3f} ms ({100*sol/msb:.1f}% of head SoL)", flush=True)
