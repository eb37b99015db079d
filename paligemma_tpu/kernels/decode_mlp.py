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

Chunking: the intermediate dim I is split into ``nc`` chunks of ``bs``
columns; chunk c needs gate cols [c*bs, (c+1)*bs), up cols
[I + c*bs, ...) of the fused (K, 2I) gateup int8 matrix, and down rows
[c*bs, ...) of the (I, K) down matrix — three async copies per chunk into
a 2-slot VMEM ring, next chunk's DMAs in flight while this chunk matmuls.
Accumulation over chunks is exact (fp32 accumulator; per-output-channel
down scales apply after the sum, matching quantize_int8 semantics).

The whole stacked-layer tensors stay in HBM (`pl.ANY`) and the layer is
picked by a scalar-prefetch index — callers inside ``lax.scan`` pass the
full (L, ...) arrays plus the loop's layer index, which avoids XLA
materializing a per-iteration 100 MB slice for the kernel operand.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.activations import gelu_tanh


def _kernel(
    idx_ref,  # (1,) int32 scalar prefetch: layer index
    y_ref,  # (B, K) bf16 VMEM
    gu_w8_ref,  # (L, K, 2I) int8 ANY/HBM
    gs_ref,  # (1, nc, bs) f32 VMEM (this layer's gate scales)
    us_ref,  # (1, nc, bs) f32 VMEM
    dn_w8_ref,  # (L, I, K) int8 ANY/HBM
    ds_ref,  # (1, K) f32 VMEM
    out_ref,  # (B, K) bf16 VMEM
    gbuf,  # (2, K, bs) int8 VMEM scratch
    ubuf,  # (2, K, bs) int8
    dbuf,  # (2, bs, K) int8
    acc,  # (B, K) f32
    sems,  # DMA sems (3, 2)
    *,
    nc: int,
    bs: int,
    inter: int,
):
    l = idx_ref[0]

    def dma_g(c, slot):
        return pltpu.make_async_copy(
            gu_w8_ref.at[l, :, pl.ds(c * bs, bs)], gbuf.at[slot],
            sems.at[0, slot],
        )

    def dma_u(c, slot):
        return pltpu.make_async_copy(
            gu_w8_ref.at[l, :, pl.ds(inter + c * bs, bs)], ubuf.at[slot],
            sems.at[1, slot],
        )

    def dma_d(c, slot):
        return pltpu.make_async_copy(
            dn_w8_ref.at[l, pl.ds(c * bs, bs), :], dbuf.at[slot],
            sems.at[2, slot],
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
        dma_d(c, slot).wait()

        g = jax.lax.dot_general(
            y, gbuf[slot].astype(y.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, bs)
        u = jax.lax.dot_general(
            y, ubuf[slot].astype(y.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = g * gs_ref[0, c]
        u = u * us_ref[0, c]
        t = (gelu_tanh(g) * u).astype(y.dtype)  # (1, bs)
        acc[...] += jax.lax.dot_general(
            t, dbuf[slot].astype(y.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry

    jax.lax.fori_loop(0, nc, body, 0)
    out_ref[...] = (acc[...] * ds_ref[0]).astype(out_ref.dtype)


def pick_block(inter: int) -> Optional[int]:
    """Chunk width: 2048 cols (12.6 MB of int8 per in-flight chunk triple at
    K=2048) when it divides I; any divisor >= 256 otherwise; None = use the
    XLA path (tiny models)."""
    for bs in (2048, 1024, 512, 256):
        if inter % bs == 0 and inter >= bs:
            return bs
    return None


def supported(mlp) -> bool:
    return (
        isinstance(mlp.get("gateup"), dict)
        and "w8" in mlp["gateup"]
        and isinstance(mlp.get("down"), dict)
        and "w8" in mlp["down"]
        and pick_block(mlp["down"]["w8"].shape[-2]) is not None
    )


def mlp_decode_fused(
    y: jnp.ndarray,  # (B, 1, K) / (B, K): one token per row
    mlp,  # full stacked tree: gateup {"w8": (L,K,2I), "s": (L,2I)},
    #       down {"w8": (L,I,K), "s": (L,K)}
    layer_idx: jnp.ndarray,  # scalar int32
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One layer's int8 GeGLU MLP at decode shape. Returns y-shaped output.

    Weight-streaming is batch-invariant, so any (small) B rides the same
    DMA schedule — batched lockstep decode and the serving slot pool use
    the identical kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape_in = y.shape
    k = shape_in[-1]
    y2 = y.reshape(-1, k)
    b = y2.shape[0]
    gu_w8, gu_s = mlp["gateup"]["w8"], mlp["gateup"]["s"]
    dn_w8, dn_s = mlp["down"]["w8"], mlp["down"]["s"]
    L, _, i2 = gu_w8.shape
    inter = i2 // 2
    bs = pick_block(inter)
    assert bs is not None, inter
    nc = inter // bs
    gs = gu_s[:, :inter].reshape(L, nc, bs).astype(jnp.float32)
    us = gu_s[:, inter:].reshape(L, nc, bs).astype(jnp.float32)
    # (L, 1, k): TPU block specs need the last two dims tile-aligned or
    # full; (1, 1, k) blocks satisfy that where (1, k) over (L, k) cannot.
    ds = dn_s.reshape(L, 1, k).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, k), lambda g, idx: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, nc, bs), lambda g, idx: (idx[0], 0, 0)),
            pl.BlockSpec((1, nc, bs), lambda g, idx: (idx[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
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
        functools.partial(_kernel, nc=nc, bs=bs, inter=inter),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, k), y.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # 3 weight streams x 2 ring slots exceeds the default 16M
            # scoped-vmem budget at bs=2048 (25.2 MB of int8 scratch)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        y2,
        gu_w8,
        gs,
        us,
        dn_w8,
        ds,
    )
    return out.reshape(shape_in)


def reference_mlp(y, mlp, layer_idx):
    """XLA reference for tests: the _mlp math on one sliced layer."""
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
