"""Fused int8 GeGLU MLP kernel for single-token decode.

Why this exists: b=1 decode is pure weight streaming, and profiling shows
each separate XLA matmul pays a ~7-13 us pipeline bubble at its boundaries
(docs/PERFORMANCE.md "per-op overhead") — for the MLP that's three ops
(gate+up fused, down) so ~20-25 us/layer of the decode step is bubbles,
not bandwidth. This kernel streams all three weight matrices of a layer
through VMEM with manually double-buffered DMA and computes as chunks
arrive, so the only boundary is the single kernel launch.

Math is identical to models/gemma._mlp on the int8 serving layout
(ref behavior: modeling_gemma.py GemmaMLP, GeGLU gelu-tanh):

    h = (gelu_tanh((y @ Wg) * sg) * ((y @ Wu) * su)) @ Wd * sd

Layout (``repack``): the intermediate dim I is split into ``nc`` chunks of
``bs`` columns and gate/up are stored chunk-major —
(L, nc, K, bs) int8 — so every per-chunk DMA is one fully **contiguous**
transfer (column slices of the original (K, 2I) matrix are 2 KB-strided
and measurably slower to DMA). Down rows are already contiguous in the
(L, I, K) original. Repacking is a one-time relayout at engine init; byte
count and quantization (per-output-channel scales) are unchanged.

Schedule per chunk: chunk c+1's three DMAs are started first, then the
kernel waits only on gate/up of chunk c, computes g/u/gelu while the down
chunk may still be in flight, then waits on down and accumulates.
Accumulation over chunks is exact (fp32 accumulator; down scales apply
after the sum, matching quantize_int8 semantics).

The whole stacked-layer tensors stay in HBM (`pl.ANY`) and the layer is
picked by a scalar-prefetch index — callers inside ``lax.scan`` pass the
full (L, ...) arrays plus the loop's layer index, which avoids XLA
materializing a per-iteration 100 MB slice for the kernel operand.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.activations import gelu_tanh


def _kernel(
    idx_ref,  # (1,) int32 scalar prefetch: layer index
    y_ref,  # (B, K) bf16 VMEM
    gate_ref,  # (L, nc, K, bs) int8 ANY/HBM
    up_ref,  # (L, nc, K, bs) int8 ANY/HBM
    dn_ref,  # (L, I, K) int8 ANY/HBM
    gs_ref,  # (1, nc, bs) f32 VMEM (this layer's gate scales)
    us_ref,  # (1, nc, bs) f32 VMEM
    ds_ref,  # (1, 1, K) f32 VMEM
    out_ref,  # (B, K) bf16 VMEM
    gbuf,  # (2, K, bs) int8 VMEM scratch
    ubuf,  # (2, K, bs) int8
    dbuf,  # (2, bs, K) int8
    acc,  # (B, K) f32
    sems,  # DMA sems (3, 2)
    *,
    nc: int,
    bs: int,
):
    l = idx_ref[0]

    def dma_g(c, slot):
        return pltpu.make_async_copy(
            gate_ref.at[l, c], gbuf.at[slot], sems.at[0, slot]
        )

    def dma_u(c, slot):
        return pltpu.make_async_copy(
            up_ref.at[l, c], ubuf.at[slot], sems.at[1, slot]
        )

    def dma_d(c, slot):
        return pltpu.make_async_copy(
            dn_ref.at[l, pl.ds(c * bs, bs), :], dbuf.at[slot], sems.at[2, slot]
        )

    dma_g(0, 0).start()
    dma_u(0, 0).start()
    dma_d(0, 0).start()
    acc[...] = jnp.zeros_like(acc)
    y = y_ref[...]

    def body(c, carry):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < nc)
        def _():
            dma_g(c + 1, nxt).start()
            dma_u(c + 1, nxt).start()
            dma_d(c + 1, nxt).start()

        dma_g(c, slot).wait()
        dma_u(c, slot).wait()

        g = jax.lax.dot_general(
            y, gbuf[slot].astype(y.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, bs)
        u = jax.lax.dot_general(
            y, ubuf[slot].astype(y.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t = (gelu_tanh(g * gs_ref[0, c]) * (u * us_ref[0, c])).astype(y.dtype)

        dma_d(c, slot).wait()
        acc[...] += jax.lax.dot_general(
            t, dbuf[slot].astype(y.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry

    jax.lax.fori_loop(0, nc, body, 0)
    out_ref[...] = (acc[...] * ds_ref[0]).astype(out_ref.dtype)


def pick_block(inter: int) -> Optional[int]:
    """Chunk width. 1024 splits I=16384 into 16 chunks: a 6.3 MB in-flight
    triple (ramp ~8 us/layer) with 12.6 MB of VMEM ring; any divisor >= 256
    otherwise; None = use the XLA path (tiny models)."""
    for bs in (1024, 512, 256):
        if inter % bs == 0 and inter >= bs:
            return bs
    return None


def supported(mlp) -> bool:
    """True if this (original int8 serving layout) MLP tree can be repacked
    for the fused kernel, or already was."""
    if isinstance(mlp.get("gate_blk"), jnp.ndarray) or "gate_blk" in mlp:
        return True
    return (
        isinstance(mlp.get("gateup"), dict)
        and "w8" in mlp["gateup"]
        and isinstance(mlp.get("down"), dict)
        and "w8" in mlp["down"]
        and pick_block(mlp["down"]["w8"].shape[-2]) is not None
    )


def repack(mlp, bs: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """One-time relayout of the int8 serving MLP for the fused kernel.

    gate/up become chunk-major (L, nc, K, bs) so per-chunk DMAs are
    contiguous. Same bytes, same quantization; ``down`` is shared with the
    original tree (rows are already contiguous).
    """
    gu_w8, gu_s = mlp["gateup"]["w8"], mlp["gateup"]["s"]
    dn_w8, dn_s = mlp["down"]["w8"], mlp["down"]["s"]
    L, K, i2 = gu_w8.shape
    inter = i2 // 2
    if bs is None:
        bs = pick_block(inter)
    assert bs is not None and inter % bs == 0, (inter, bs)
    nc = inter // bs

    def blk(w):  # (L, K, I) -> (L, nc, K, bs), contiguous chunks
        # the transpose materializes row-major, i.e. each (K, bs) chunk is
        # one contiguous run — exactly what the kernel's chunk DMAs need
        return w.reshape(L, K, nc, bs).transpose(0, 2, 1, 3)

    return {
        "gate_blk": blk(gu_w8[:, :, :inter]),
        "up_blk": blk(gu_w8[:, :, inter:]),
        "down_w8": dn_w8,
        "gs": gu_s[:, :inter].reshape(L, nc, bs).astype(jnp.float32),
        "us": gu_s[:, inter:].reshape(L, nc, bs).astype(jnp.float32),
        # (L, 1, K): TPU block specs need the last two dims tile-aligned or
        # full; (1, 1, K) blocks satisfy that where (1, K) over (L, K) can't
        "ds": dn_s.reshape(L, 1, K).astype(jnp.float32),
        # originals kept so non-fused traces through the same tree (batched
        # decode falls back to the XLA _mlp path) still find their weights;
        # gate/up cost one extra HBM copy, "down" is shared either way
        "gateup": mlp["gateup"],
        "down": mlp["down"],
    }


def mlp_decode_fused(
    y: jnp.ndarray,  # (B, 1, K) / (B, K): one token per row
    packed: Dict[str, jnp.ndarray],  # repack() output
    layer_idx: jnp.ndarray,  # scalar int32
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """One layer's int8 GeGLU MLP at decode shape. Returns y-shaped output.

    Weight-streaming is batch-invariant, so any (small) B rides the same
    DMA schedule — batched lockstep decode and the serving slot pool use
    the identical kernel.

    ``out_dtype``: defaults to y.dtype; a TP shard passes float32 so the
    cross-shard psum of partial down-projections runs at full precision
    before the single cast back to the activation dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if out_dtype is None:
        out_dtype = y.dtype
    shape_in = y.shape
    k = shape_in[-1]
    y2 = y.reshape(-1, k)
    b = y2.shape[0]
    L, nc, _, bs = packed["gate_blk"].shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, k), lambda g, idx: (0, 0)),
            # weight stacks pinned to HBM: under ANY, stacks small enough
            # for VMEM get promoted there and the chunk DMAs miscompile
            # ("DMA source and target shape mismatch") — only bites at
            # sub-production sizes, but pinning costs nothing at full size
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, nc, bs), lambda g, idx: (idx[0], 0, 0)),
            pl.BlockSpec((1, nc, bs), lambda g, idx: (idx[0], 0, 0)),
            pl.BlockSpec((1, 1, k), lambda g, idx: (idx[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, k), lambda g, idx: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, k, bs), jnp.int8),
            pltpu.VMEM((2, k, bs), jnp.int8),
            pltpu.VMEM((2, bs, k), jnp.int8),
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nc=nc, bs=bs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, k), out_dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # 3 weight streams x 2 ring slots exceeds the default 16M
            # scoped-vmem budget at bs=2048; generous limit keeps the knob
            # out of the way for every supported bs
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        y2,
        packed["gate_blk"],
        packed["up_blk"],
        packed["down_w8"],
        packed["gs"],
        packed["us"],
        packed["ds"],
    )
    return out.reshape(shape_in)


def reference_mlp(y, mlp, layer_idx):
    """XLA reference for tests: the _mlp math on one sliced layer of the
    ORIGINAL (un-repacked) int8 serving tree."""
    lp = jax.tree.map(lambda a: a[layer_idx], mlp)
    gu = jax.lax.dot_general(
        y, lp["gateup"]["w8"].astype(y.dtype), (((y.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * lp["gateup"]["s"]
    inter = gu.shape[-1] // 2
    t = (gelu_tanh(gu[..., :inter]) * gu[..., inter:]).astype(y.dtype)
    dn = jax.lax.dot_general(
        t, lp["down"]["w8"].astype(y.dtype), (((y.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * lp["down"]["s"]
    return dn.astype(y.dtype)
