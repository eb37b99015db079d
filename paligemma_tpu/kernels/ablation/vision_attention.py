"""Fused non-causal MHA for the SigLIP vision tower.

The tower's attention (ref: modeling_siglip.py:96-136) is full bidirectional
MHA over a fixed patch count (256 at 224px, 1024 at 448px) with
head_dim=72. The generic flash kernel (kernels/flash_attention.py) measured
29% SLOWER than XLA here: its grid runs one step per (batch, head) — 16
steps/layer of ~4-8 us Mosaic step overhead against only ~3 us of real MXU
work per 72->128-padded head — and its online-softmax rescale is pure
overhead when the whole KV fits VMEM anyway.

This kernel instead processes a BLOCK of heads per grid step with a
one-shot softmax:

    per head (unrolled, static):  S = q @ k^T * scale   (S, S) fp32 in VMEM
                                  p = exp(S - rowmax)
                                  o = (p @ v) * (1 / rowsum)

ABLATION RESULT — measured on-chip 2026-08-18 (.bench/vision_attn_probe.py),
NOT a production path:

    224px (S=256):  XLA 2.4 us/layer,  fused 13.3-19.0 (pallas step cost
                    dwarfs the ~1 us of real work) -> XLA wins 5-8x
    448px (S=1024): XLA 58.2 us/layer, fused_hb4 52.9 (-9%); head_block
                    >= 8 CRASHES this Mosaic build's remote compiler
                    (HTTP 500 / tpu_compile_helper exit 1)

The hypothesis that XLA loses big to (H, S, S) score materialization is
measured FALSE at these shapes: XLA attention is already near its
small-matmul roofline, so the best case here is ~0.14 ms of a 33 ms 448px
prefill — not worth a Mosaic-crash-prone default. The tower's remaining
MFU gap (66% -> ~95% matmul-only) sits in fp32 VPU pointwise work
(tanh-GELU on (S, 4304), two LayerNorms) and the d=72 pad that EVERY MXU
path pays. Kept as ablation; ``siglip.encode(attn="fused")`` still runs it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int):
    # refs: (1, heads, S_pad, D_pad); one batch row, `heads` heads per step
    for h in range(heads):  # static unroll — head count is small and fixed
        q = q_ref[0, h]  # (S, Dp) bf16
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (S, S) fp32, lives in VMEM only
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, Dp) fp32
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


def vision_attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, S, H, D)
    v: jnp.ndarray,  # (B, S, H, D)
    scale: Optional[float] = None,
    head_block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Non-causal, unmasked MHA over all S positions (vision-tower shape).

    Every position attends to every other — PaliGemma's image patches are a
    fully-bidirectional prefix (ref: modeling_siglip.py:96-136). Sequence
    padding is therefore NOT supported here (no kv_len); the tower always
    runs at the full fixed patch count.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, h, d = q.shape
    if head_block is None:
        # this Mosaic build's remote compiler crashes at head_block >= 8
        # with S=1024 (see module docstring); 4 is the largest size that
        # compiles everywhere it was probed
        head_block = min(h, 4)
    assert h % head_block == 0, (h, head_block)

    def to_heads(x):  # (B, S, H, D) -> (B, H, S_pad, D_pad)
        x = x.transpose(0, 2, 1, 3)
        x = _pad_to(x, 3, 128)
        return _pad_to(x, 2, 128)

    q_p, k_p, v_p = to_heads(q), to_heads(k), to_heads(v)
    s_pad, d_pad = q_p.shape[2], q_p.shape[3]
    if s_pad != s:
        # padded key rows would win the softmax with score 0; push them to
        # -inf via a q/k trick is not needed — the tower never pads S in
        # practice (256/1024 patches). Guard loudly instead of silently
        # mis-normalizing.
        raise NotImplementedError(
            f"vision_attention requires S % 128 == 0 (got {s})"
        )

    spec = pl.BlockSpec(
        (1, head_block, s_pad, d_pad),
        lambda bi, hb: (bi, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, heads=head_block),
        grid=(b, h // head_block),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d_pad), q.dtype),
        interpret=interpret,
    )(q_p, k_p, v_p)
    return out[:, :, :s, :d].transpose(0, 2, 1, 3)
