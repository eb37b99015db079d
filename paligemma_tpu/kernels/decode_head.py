"""Fused int8 LM-head + argmax kernel for greedy decode.

The 257k-vocab head is the single largest weight read of a decode step
(~527 MB int8, ~0.73 ms measured vs a 0.64 ms roofline as a separate XLA
matmul + argmax). For GREEDY decode the (1, 257k) fp32 logits row is pure
scratch — only the argmax index survives — so this kernel streams the
head chunk-major over the vocab with double-buffered DMA, computes each
logits chunk in VMEM, folds it into a running (max, argmax) pair, and
emits just the winning token id. The logits never touch HBM.

Tie-breaking matches jnp.argmax (first maximal index): within a chunk the
minimum index among maxima wins, and across chunks a later chunk must be
STRICTLY greater to replace the running best.

Layout (``repack_head``): head w8 (K, V) int8 -> (nch, K, bs) chunk-major
so every DMA is contiguous; per-channel scales -> (nch, 1, bs). ``bs``
must divide V (Gemma's 257152 = 128 * 7^2 * 41 -> bs=6272 gives 41
contiguous 12.8 MB chunks).

Greedy only: the sampling path (temperature/top-p) still materializes
logits via the XLA head (models/gemma.lm_head).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    y_ref,  # (B, K) bf16 VMEM — final-norm output
    w_ref,  # (nch, K, bs) int8 ANY/HBM
    s_ref,  # (nch, 1, bs) f32 VMEM
    tok_ref,  # (B, 1) int32 VMEM out
    max_ref,  # (B, 1) f32 VMEM out — winning logit (for TP shard combine)
    wbuf,  # (2, K, bs) int8 VMEM scratch
    sems,  # DMA (2,)
    *,
    nch: int,
    bs: int,
    n_valid: int,  # true vocab width; columns >= n_valid are padding
):
    def dma(c, slot):
        return pltpu.make_async_copy(w_ref.at[c], wbuf.at[slot], sems.at[slot])

    dma(0, 0).start()
    y = y_ref[...]

    def body(c, carry):
        best_m, best_i = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(c + 1, jax.lax.rem(c + 1, 2)).start()

        dma(c, slot).wait()
        logits = jax.lax.dot_general(
            y, wbuf[slot].astype(y.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s_ref[c]  # (B, bs) f32
        # round-trip through the ACTIVATION dtype: the XLA path
        # (matmul_any -> lm_head) emits logits in x.dtype — bf16 in
        # serving, fp32 in fp32-param CPU tests — so argmax must see
        # identical rounding in both (a hard bf16 round here flipped
        # near-crossing tokens vs the fp32 XLA path on CPU)
        logits = logits.astype(y.dtype).astype(jnp.float32)
        ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + c * bs
        if nch * bs != n_valid:
            # padded vocab (TP shards rarely divide into lane-aligned
            # chunks): padding columns must never win the argmax
            logits = jnp.where(ids < n_valid, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)  # (B, 1)
        idx = jnp.min(
            jnp.where(logits == m, ids, jnp.int32(2**31 - 1)),
            axis=-1, keepdims=True,
        )  # first maximal index in this chunk
        better = m > best_m
        best_i = jnp.where(better, idx, best_i)
        best_m = jnp.where(better, m, best_m)
        return best_m, best_i

    bsz = y_ref.shape[0]
    neg = jnp.full((bsz, 1), -jnp.inf, jnp.float32)
    zero = jnp.zeros((bsz, 1), jnp.int32)
    best_m, best_i = jax.lax.fori_loop(0, nch, body, (neg, zero))
    tok_ref[...] = best_i
    max_ref[...] = best_m


def pick_block(vocab: int) -> Optional[int]:
    """Largest chunk width <= 8192 dividing the vocab (lane-aligned)."""
    best = None
    for bs in range(128, 8193, 128):
        if vocab % bs == 0:
            best = bs
    return best


def supported(head_blk) -> bool:
    return isinstance(head_blk, dict) and "w8_blk" in head_blk


def repack_head(
    head_q: Dict[str, jnp.ndarray], bs: Optional[int] = None
) -> Dict[str, jnp.ndarray]:
    """head_q {"w8": (K, V), "s": (V,)} -> chunk-major kernel layout.

    When no lane-aligned chunk width divides V (typical for TP vocab
    shards, e.g. 257152/8 = 32144), the vocab is zero-padded up to the
    next chunk multiple; the kernel masks padded columns to -inf using the
    true width (recovered from the unpadded ``s``)."""
    w8, s = head_q["w8"], head_q["s"]
    k, v = w8.shape
    if bs is None:
        bs = pick_block(v)
    if bs is None:  # pad to the next multiple of a lane-aligned width
        bs = min(8192, ((v + 127) // 128) * 128)
    v_pad = ((v + bs - 1) // bs) * bs
    if v_pad != v:
        w8 = jnp.pad(w8, ((0, 0), (0, v_pad - v)))
    nch = v_pad // bs
    return {
        "w8_blk": w8.reshape(k, nch, bs).transpose(1, 0, 2),
        "s_blk": jnp.pad(s, (0, v_pad - v)).reshape(nch, 1, bs).astype(
            jnp.float32
        ),
        # original kept for the sampling path (lm_head), batched decode,
        # and as the kernel's true-vocab-width record (s.shape[0])
        "w8": head_q["w8"],
        "s": s,
    }


def head_argmax_fused(
    y: jnp.ndarray,  # (B, 1, K) or (B, K) — final-norm output
    head_blk: Dict[str, jnp.ndarray],  # repack_head() output
    interpret: Optional[bool] = None,
    return_max: bool = False,
) -> jnp.ndarray:
    """Greedy token ids (shape (B,) int32) without materializing logits.

    ``return_max=True`` additionally returns the winning logit value
    (B,) f32 — a TP vocab shard combines (id, max) pairs across shards
    with an all_gather + argmax (kernels/decode_layer_tp.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = y.shape[-1]
    y2 = y.reshape(-1, k)
    b = y2.shape[0]
    nch, _, bs = head_blk["w8_blk"].shape
    n_valid = head_blk["s"].shape[0]

    tok, mx = pl.pallas_call(
        functools.partial(_kernel, nch=nch, bs=bs, n_valid=n_valid),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, k), lambda g: (0, 0)),
            # HBM-pinned (not ANY): see decode_mlp.mlp_decode_fused
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
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(y2, head_blk["w8_blk"], head_blk["s_blk"])
    if return_max:
        return tok[:, 0], mx[:, 0]
    return tok[:, 0]


def reference_head_argmax(y, head_q):
    """XLA reference for tests: logits rounded to the activation dtype
    (matching matmul_any -> lm_head) then jnp.argmax."""
    logits = (
        jax.lax.dot_general(
            y.reshape(-1, y.shape[-1]), head_q["w8"].astype(y.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        * head_q["s"]
    ).astype(y.dtype)
    return jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.int32)
