"""Fully-fused int8 decoder-layer kernels for single-token decode.

One Pallas kernel = one whole Gemma decoder layer at decode shape:
rmsnorm -> fused qkv -> RoPE -> KV-cache write -> MQA attention over a
static window -> o-proj -> residual -> rmsnorm -> GeGLU MLP (chunked,
double-buffered) -> residual. All five weight streams (qkv, o, gate, up,
down — ~112 MB/layer int8 at 3B scale) ride manually scheduled async DMA
with compute overlapping the copies, so the layer has ZERO inter-op
pipeline bubbles; profiling showed those bubbles cost the XLA decode path
~26 us/layer (docs/PERFORMANCE.md "per-op overhead").

Numerics mirror models/gemma._decoder_block on the int8 serving layout
step for step (fp32 norm/softmax/accumulators, bf16 activations; ref
behavior: modeling_gemma.py GemmaAttention/GemmaMLP/DecoderLayer):
  - q/k/v from the fused (K, 2560) int8 qkv matmul, per-channel scales
  - HF half-split RoPE (ops/rope.py convention)
  - attention over cache slots [0, window) with slots >= kv_len masked to
    -inf — identical to the kv_bucket XLA path (exp(-inf) = 0 exactly)
  - the new token's k/v are returned to the caller, which writes the
    cache rows with one XLA dynamic_update_slice each (Mosaic on this
    toolchain cannot DMA a single dynamically-indexed cache row); inside
    the kernel the fresh token enters attention arithmetically, so the
    window copy read at kernel entry never needs patching

``layers_decode_fused`` runs ALL layers as one grid-over-layers kernel
with B lockstep rows and cross-layer DMA prefetch; it is the production
path for both the engine and the continuous-batching server (per-row
cache positions). An earlier one-kernel-per-layer variant measured
3.578 vs 3.546 ms/step and was removed as redundant.

Restrictions (callers fall back to the XLA path otherwise): B <= 32,
n_kv_heads == 1 (Gemma MQA), head_dim a lane multiple, int8 layout with
the decode_mlp chunk repack, no mesh.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.activations import gelu_tanh
from . import decode_mlp


def supported(cfg, layers, batch: int) -> bool:
    """Static check the engine/forward use before picking this kernel."""
    return (
        1 <= batch <= 32  # lockstep rows share the weight stream; VMEM cap
        and cfg.num_key_value_heads == 1
        and cfg.head_dim % 128 == 0
        and isinstance(layers.get("attn", {}).get("qkv"), dict)
        and "w8" in layers["attn"]["qkv"]
        and "gate_blk" in layers.get("mlp", {})
    )


def repack_layers(layers: Dict, rms_eps_dtype=jnp.float32) -> Dict:
    """Relayout a stacked int8 decoder-layer tree for the fused kernel.

    The MLP part reuses decode_mlp.repack (chunk-major gate/up); norms and
    scales get kernel-friendly (L, 1, K) shapes. qkv/o int8 stay as-is
    (their DMAs copy the full per-layer matrix contiguously)."""
    attn, mlp = layers["attn"], layers["mlp"]
    packed_mlp = (
        mlp if "gate_blk" in mlp else decode_mlp.repack(mlp)
    )
    L, K = layers["input_norm"].shape
    return {
        "attn": attn,
        "mlp": packed_mlp,
        "input_norm": layers["input_norm"].reshape(L, 1, K),
        "post_norm": layers["post_norm"].reshape(L, 1, K),
        "qkv_s": attn["qkv"]["s"].reshape(L, 1, -1).astype(jnp.float32),
        "o_s": attn["o"]["s"].reshape(L, 1, -1).astype(jnp.float32),
    }


# ---------------------------------------------------------------------------
# All-layers variant: grid=(L,) with the hidden state persisting in VMEM
# scratch across grid steps. One pallas_call per decode step instead of L —
# removes L-1 kernel launches AND lets every weight stream prefetch across
# the layer boundary (layer l+1's qkv/o/KV-window/chunk-0 DMAs start while
# layer l's MLP is still streaming), so the DMA pipeline never drains.
#
# Batched: B token-rows decode in lockstep through the same weight stream
# (weight DMA is batch-invariant). Per-row cache positions and an explicit
# per-row validity-mask window make it exact for right-padded batches and
# for continuous-batching slots at different sequence lengths.
# ---------------------------------------------------------------------------
def _kernel_all(
    pos_ref,  # (B,) int32 scalar prefetch: per-row cache write position
    *refs,  # inputs, outputs, scratch — unpacked below
    n_layers: int,
    nc: int,
    bs: int,
    window: int,
    n_heads: int,
    head_dim: int,
    eps: float,
    scale: float,
    batch: int,
    head: Optional[Tuple[int, int, int]] = None,  # (nch, bsh, n_valid)
    lora: bool = False,
):
    # head=None: the greedy head/argmax lives in its own kernel
    # (kernels/decode_head), dispatched back-to-back with this one.
    # head=(nch, bsh, n_valid): the final rmsnorm + int8 head chunks +
    # running argmax run INSIDE this kernel on the last grid step, so one
    # pallas_call per decode step replaces two (measured ~neutral on
    # throughput — the second launch floor pipelines behind the first
    # kernel — but it halves dispatches and keeps the logits row dead).
    # lora=True: per-layer concat-basis multi-LoRA operands ride the
    # grid (repack_lora_bank_fused); each target adds two small dense
    # dots + a per-row block mask inside the layer, so a bank of
    # fine-tunes serves through the fused tick instead of degrading to
    # the XLA path (~22% measured tax, docs/PERFORMANCE.md).
    refs = list(refs)
    idx = 20
    if head is not None:
        fnorm_ref = refs[idx]  # (1, 1, K) VMEM const block
        hw_ref = refs[idx + 1]  # (nch, K, bsh) int8 HBM
        hs_ref = refs[idx + 2]  # (nch, 1, bsh) f32 VMEM
        idx += 3
    if lora:
        (
            m1_ref,  # (B, G) row block masks
            m2_ref,  # (B, 2G)
            m3_ref,  # (B, 3G)
            qa_ref,  # (1, K, 3G) block at l
            qb_ref,  # (1, 3G, NQ2)
            oa_ref,  # (1, NQ, G)
            ob_ref,  # (1, G, K)
            gua_ref,  # (1, K, 2G)
            gb_ref,  # (1, nc, G, bs)
            ub_ref,  # (1, nc, G, bs)
            da_ref,  # (1, nc, bs, G)
            db_ref,  # (1, G, K)
        ) = refs[idx : idx + 12]
        idx += 12
    outs = refs[idx : idx + 3]
    if head is not None:
        tok_ref = refs[idx + 3]  # (B, 1) int32 out
        hmax_ref = refs[idx + 4]  # (B, 1) f32 out
    tail = len(refs)
    if lora:
        za_buf = refs[tail - 1]  # (B, G) f32 scratch — down-delta acc
        tail -= 1
    if head is not None:
        hbuf = refs[tail - 2]  # (2, K, bsh) int8 scratch
        hsems = refs[tail - 1]  # DMA (2,)
        tail -= 2
    refs = refs[:20] + outs + refs[tail - 11 : tail]
    (
        x_ref,  # (B, K)
        cos_ref,  # (B, D)
        sin_ref,  # (B, D)
        cos_rep_ref,  # (B*H, D) — per-row tables repeated per head (q)
        sin_rep_ref,  # (B*H, D)
        bias_ref,  # (B, W) f32 additive mask: 0 attendable, -inf not
        in_norm_ref,  # (1, 1, K) block at layer l (auto-pipelined)
        post_norm_ref,  # (1, 1, K)
        qkv_w8_ref,  # (L, K, NQ) ANY
        qkv_s_ref,  # (1, 1, NQ) block at l
        o_w8_ref,  # (L, KO, K) ANY
        o_s_ref,  # (1, 1, K) block at l
        gate_ref,  # (L, nc, K, bs) ANY
        up_ref,  # (L, nc, K, bs) ANY
        dn_ref,  # (L, I, K) ANY
        gs_ref,  # (1, nc, bs) block at l
        us_ref,  # (1, nc, bs) block at l
        ds_ref,  # (1, 1, K) block at l
        k_cache_ref,  # (L, B, S, D) HBM
        v_cache_ref,  # (L, B, S, D) HBM
        out_ref,  # (B, K) — written on the last grid step
        k_new_ref,  # (1, B, D) block at l
        v_new_ref,  # (1, B, D) block at l
        # scratch (persists across grid steps):
        a_buf,  # (B, NQ) attention output accumulator (per-row stores)
        h_state,  # (B, K) activation dtype
        qkv_buf,  # (2, K, NQ) int8 ring over layers
        o_buf,  # (2, KO, K) int8
        kwin,  # (2, B, W, D)
        vwin,  # (2, B, W, D)
        gbuf,  # (2, K, bs) int8 ring over (layer, chunk)
        ubuf,
        dbuf,
        acc,  # (B, K) f32
        sems,  # DMA (7, 2)
    ) = refs
    l = pl.program_id(0)
    lslot = jax.lax.rem(l, 2)
    nslot = jax.lax.rem(l + 1, 2)

    def dma_qkv(li, s):
        return pltpu.make_async_copy(qkv_w8_ref.at[li], qkv_buf.at[s],
                                     sems.at[3, s])

    def dma_o(li, s):
        return pltpu.make_async_copy(o_w8_ref.at[li], o_buf.at[s],
                                     sems.at[4, s])

    def dma_kwin(li, s):
        return pltpu.make_async_copy(
            k_cache_ref.at[li, :, pl.ds(0, window)], kwin.at[s], sems.at[5, s]
        )

    def dma_vwin(li, s):
        return pltpu.make_async_copy(
            v_cache_ref.at[li, :, pl.ds(0, window)], vwin.at[s], sems.at[6, s]
        )

    # mlp ring parity is global over (layer, chunk) so the stream never
    # stalls at the layer boundary
    def cslot(li, c):
        return jax.lax.rem(li * nc + c, 2)

    def dma_g(li, c, s):
        return pltpu.make_async_copy(gate_ref.at[li, c], gbuf.at[s],
                                     sems.at[0, s])

    def dma_u(li, c, s):
        return pltpu.make_async_copy(up_ref.at[li, c], ubuf.at[s],
                                     sems.at[1, s])

    def dma_d(li, c, s):
        return pltpu.make_async_copy(dn_ref.at[li, pl.ds(c * bs, bs), :],
                                     dbuf.at[s], sems.at[2, s])

    @pl.when(l == 0)
    def _():
        # warmup: this layer's front-half streams + first MLP chunk
        dma_qkv(0, 0).start()
        dma_kwin(0, 0).start()
        dma_vwin(0, 0).start()
        dma_o(0, 0).start()
        dma_g(0, 0, 0).start()
        dma_u(0, 0, 0).start()
        dma_d(0, 0, 0).start()
        h_state[...] = x_ref[...]

    # prefetch the NEXT layer's front half right away (rides behind this
    # layer's already-queued chunk DMAs)
    @pl.when(l + 1 < n_layers)
    def _():
        dma_qkv(l + 1, nslot).start()
        dma_kwin(l + 1, nslot).start()
        dma_vwin(l + 1, nslot).start()
        dma_o(l + 1, nslot).start()

    if head is not None:

        def dma_h(c, s):
            return pltpu.make_async_copy(hw_ref.at[c], hbuf.at[s],
                                         hsems.at[s])

        # head chunk 0 starts streaming while the last layer's attention
        # and MLP are still computing (its wait is after the final norm)
        @pl.when(l == n_layers - 1)
        def _():
            dma_h(0, 0).start()

    def rmsnorm(h, w_ref):
        hf = h.astype(jnp.float32)
        ms = jnp.mean(hf * hf, axis=-1, keepdims=True)
        n = hf * jax.lax.rsqrt(ms + eps)
        return (n * (1.0 + w_ref[0].astype(jnp.float32))).astype(h.dtype)

    x = h_state[...]
    y = rmsnorm(x, in_norm_ref)

    def lora_delta(inp, a_ref, mask_ref, b_ref):
        # (x @ A_cat) * row-block-mask @ B_cat — alpha pre-folded in B
        z = jax.lax.dot_general(
            inp, a_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(inp.dtype) * mask_ref[...]
        return jax.lax.dot_general(
            z, b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dma_qkv(l, lslot).wait()
    qkv = jax.lax.dot_general(
        y, qkv_buf[lslot].astype(y.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv * qkv_s_ref[0]).astype(y.dtype)  # (B, NQ)
    if lora:
        qkv = qkv + lora_delta(y, qa_ref, m3_ref, qb_ref).astype(y.dtype)
    nq = n_heads * head_dim
    k_new = qkv[:, nq : nq + head_dim]  # (B, D)
    v_new = qkv[:, nq + head_dim :]  # (B, D)

    cos = cos_ref[...]  # (B, D)
    sin = sin_ref[...]
    half = head_dim // 2

    def rope2(t, c, s):  # 2-D rows; Mosaic dislikes 1-D/3-D intermediates
        rot = jnp.concatenate([-t[:, half:], t[:, :half]], axis=-1)
        return t * c + rot * s

    k_new = rope2(k_new, cos, sin)
    k_new_ref[...] = k_new[None].astype(k_new_ref.dtype)
    v_new_ref[...] = v_new[None].astype(v_new_ref.dtype)

    # ---- per-row MQA attention over the window + the fresh token ----
    # (everything in the loop stays 2-D and the mask is an f32 additive
    # bias: 1-D vectors, 3-D broadcasts, and (1, W) BOOL broadcasts all
    # crash this Mosaic build's layout inference)
    dma_kwin(l, lslot).wait()
    dma_vwin(l, lslot).wait()

    # ONE full-array reshape (B, NQ) -> (B*H, D) (per-row sliced reshapes
    # crash this Mosaic build's layout inference), rope applied to all
    # query rows at once with head-repeated tables
    q_all = rope2(
        qkv[:, :nq].reshape(batch * n_heads, head_dim),
        cos_rep_ref[...], sin_rep_ref[...],
    )
    for b in range(batch):
        q_b = q_all[b * n_heads : (b + 1) * n_heads]  # (H, D)
        k_b = k_new[b : b + 1]  # (1, D)
        scores = jax.lax.dot_general(
            q_b, kwin[lslot, b].astype(q_b.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, W)
        s_new = jnp.sum(
            q_b.astype(jnp.float32) * k_b.astype(jnp.float32),
            -1, keepdims=True,
        )  # (H, 1)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        # scalar-prefetch refs are SMEM: load per-row scalars, not vectors
        at_pos = slot_ids == pos_ref[b]  # window copy predates row's write
        scores = jnp.where(at_pos, s_new, scores) * scale + bias_ref[b : b + 1]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        p_pos = jnp.sum(
            jnp.where(at_pos, probs.astype(jnp.float32), 0.0),
            -1, keepdims=True,
        ).astype(x.dtype)  # (H, 1)
        probs = jnp.where(at_pos, jnp.zeros_like(probs), probs)
        attn_b = jax.lax.dot_general(
            probs, vwin[lslot, b].astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + p_pos * v_new[b : b + 1].astype(x.dtype)
        a_buf[b : b + 1, :] = attn_b.reshape(1, nq)
    a = a_buf[...]  # (B, NQ)

    dma_o(l, lslot).wait()
    o = jax.lax.dot_general(
        a, o_buf[lslot].astype(a.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    x = x + (o * o_s_ref[0]).astype(x.dtype)
    if lora:
        x = x + lora_delta(a, oa_ref, m1_ref, ob_ref).astype(x.dtype)

    y2 = rmsnorm(x, post_norm_ref)
    acc[...] = jnp.zeros_like(acc)
    if lora:
        G = m1_ref.shape[1]
        z2 = jax.lax.dot_general(
            y2, gua_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y2.dtype) * m2_ref[...]  # (B, 2G) masked gate|up basis
        za_buf[...] = jnp.zeros_like(za_buf)

    def body(c, carry):
        s = cslot(l, c)

        # prefetch: next chunk of this layer, or chunk 0 of the next layer
        @pl.when(c + 1 < nc)
        def _():
            ns = cslot(l, c + 1)
            dma_g(l, c + 1, ns).start()
            dma_u(l, c + 1, ns).start()
            dma_d(l, c + 1, ns).start()

        @pl.when((c + 1 == nc) & (l + 1 < n_layers))
        def _():
            ns = cslot(l + 1, 0)
            dma_g(l + 1, 0, ns).start()
            dma_u(l + 1, 0, ns).start()
            dma_d(l + 1, 0, ns).start()

        dma_g(l, c, s).wait()
        dma_u(l, c, s).wait()
        g = jax.lax.dot_general(
            y2, gbuf[s].astype(y2.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * gs_ref[0, c]
        u = jax.lax.dot_general(
            y2, ubuf[s].astype(y2.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * us_ref[0, c]
        if lora:
            g = g + jax.lax.dot_general(
                z2[:, :G], gb_ref[0, c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            u = u + jax.lax.dot_general(
                z2[:, G:], ub_ref[0, c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        t = (gelu_tanh(g) * u).astype(y2.dtype)
        dma_d(l, c, s).wait()
        acc[...] += jax.lax.dot_general(
            t, dbuf[s].astype(y2.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if lora:
            za_buf[...] += jax.lax.dot_general(
                t, da_ref[0, c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return carry

    jax.lax.fori_loop(0, nc, body, 0)
    x = x + (acc[...] * ds_ref[0]).astype(x.dtype)
    if lora:
        zd = za_buf[...].astype(x.dtype) * m1_ref[...]
        x = x + jax.lax.dot_general(
            zd, db_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    h_state[...] = x

    @pl.when(l == n_layers - 1)
    def _():
        out_ref[...] = x

    if head is not None:
        h_nch, h_bs, h_nvalid = head

        @pl.when(l == n_layers - 1)
        def _():
            # final rmsnorm + chunked int8 head + running argmax — numerics
            # identical to decode_head._kernel (bf16 logits round-trip,
            # first-maximal-index ties, -inf on vocab padding)
            yh = rmsnorm(x, fnorm_ref)

            def hbody(c, carry):
                best_m, best_i = carry
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < h_nch)
                def _():
                    dma_h(c + 1, jax.lax.rem(c + 1, 2)).start()

                dma_h(c, slot).wait()
                logits = jax.lax.dot_general(
                    yh, hbuf[slot].astype(yh.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * hs_ref[c]  # (B, bsh) f32
                # round to the activation dtype like the XLA head
                # (see kernels/decode_head._kernel)
                logits = logits.astype(yh.dtype).astype(jnp.float32)
                ids = (
                    jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                    + c * h_bs
                )
                if h_nch * h_bs != h_nvalid:
                    logits = jnp.where(ids < h_nvalid, logits, -jnp.inf)
                m = jnp.max(logits, axis=-1, keepdims=True)
                idx = jnp.min(
                    jnp.where(logits == m, ids, jnp.int32(2**31 - 1)),
                    axis=-1, keepdims=True,
                )
                better = m > best_m
                best_i = jnp.where(better, idx, best_i)
                best_m = jnp.where(better, m, best_m)
                return best_m, best_i

            neg = jnp.full((batch, 1), -jnp.inf, jnp.float32)
            zi = jnp.zeros((batch, 1), jnp.int32)
            bm, bi = jax.lax.fori_loop(0, h_nch, hbody, (neg, zi))
            tok_ref[...] = bi
            hmax_ref[...] = bm


def repack_lora_bank_fused(
    bank_layers: Dict,
    nc: int,
    bs: int,
    n_heads: int,
    head_dim: int,
    hidden: int,
) -> Dict:
    """Multi-LoRA bank -> fused-kernel operand layout.

    Input: ``stack_lora_bank(...)['layers']`` with the concat-basis
    tensors (a_cat (L, in, G), alpha-folded b_cat (L, G, out); G =
    (N+1)*r). Output per-layer blocks the grid-over-layers kernel
    streams alongside the base weights:

      qkv_a (L, K, 3G)   q|k|v bases side by side
      qkv_b (L, 3G, NQ2) block-diagonal: q rows -> q cols of the fused
                         qkv output, k rows -> k cols, v rows -> v cols
      o_a (L, NQ, G), o_b (L, G, K)
      gu_a (L, K, 2G)    gate|up bases
      gate_b/up_b (L, nc, G, bs)  chunk-major like the base MLP blocks
      down_a (L, nc, bs, G)       chunked over the intermediate dim
      down_b (L, G, K)

    Missing targets become zeros (delta 0). G pads to a multiple of 8
    (sublane-safe); mask columns beyond the true G are never selected.
    A row's delta = (x @ A_cat) * row_block_mask @ B_cat — two regular
    MXU dots shared by every lockstep row (ref targets:
    Paligemma_FT.ipynb cell 41 q/k/v/o/gate/up/down).
    """
    ref = next(iter(bank_layers.values()))
    L, _, g_true = ref["a_cat"].shape
    G = ((g_true + 7) // 8) * 8
    nq = n_heads * head_dim
    nq2 = nq + 2 * head_dim
    I = nc * bs  # noqa: E741

    def cat(name, in_dim):
        if name in bank_layers:
            a = bank_layers[name]["a_cat"]
            return jnp.pad(a, ((0, 0), (0, 0), (0, G - g_true)))
        return jnp.zeros((L, in_dim, G), ref["a_cat"].dtype)

    def bmat(name, out_dim):
        if name in bank_layers:
            b = bank_layers[name]["b_cat"]
            return jnp.pad(b, ((0, 0), (0, G - g_true), (0, 0)))
        return jnp.zeros((L, G, out_dim), ref["b_cat"].dtype)

    qkv_b = jnp.zeros((L, 3 * G, nq2), ref["b_cat"].dtype)
    qkv_b = qkv_b.at[:, :G, :nq].set(bmat("q", nq))
    qkv_b = qkv_b.at[:, G : 2 * G, nq : nq + head_dim].set(
        bmat("k", head_dim)
    )
    qkv_b = qkv_b.at[:, 2 * G :, nq + head_dim :].set(bmat("v", head_dim))
    gate_b = bmat("gate", I).reshape(L, G, nc, bs).transpose(0, 2, 1, 3)
    up_b = bmat("up", I).reshape(L, G, nc, bs).transpose(0, 2, 1, 3)
    down_a = cat("down", I).reshape(L, nc, bs, G)
    return {
        "qkv_a": jnp.concatenate(
            [cat("q", hidden), cat("k", hidden), cat("v", hidden)], axis=-1
        ),
        "qkv_b": qkv_b,
        "o_a": cat("o", nq),
        "o_b": bmat("o", hidden),
        "gu_a": jnp.concatenate([cat("gate", hidden), cat("up", hidden)],
                                axis=-1),
        "gate_b": gate_b,
        "up_b": up_b,
        "down_a": down_a,
        "down_b": bmat("down", hidden),
        "g_true": g_true,
        "rank": ref["a"].shape[-1],
    }


def lora_row_masks(adapter_ids: jnp.ndarray, G: int, rank: int, dtype):
    """(B,) adapter ids -> (mask1 (B,G), mask2 (B,2G), mask3 (B,3G)):
    1.0 on the columns of the row's adapter block, 0 elsewhere. Sublane
    padding columns map to block indices >= N+1, which no row id ever
    selects, so they mask to 0 automatically."""
    col = jnp.arange(G, dtype=jnp.int32)
    m1 = ((col[None] // rank) == adapter_ids[:, None]).astype(dtype)
    m2 = jnp.concatenate([m1, m1], axis=-1)
    m3 = jnp.concatenate([m1, m1, m1], axis=-1)
    return m1, m2, m3


def merged_head_fits(
    packed: Dict,
    head_blk: Dict,
    batch: int,
    window: int,
    head_dim: int,
    cache_bytes: int = 2,
    act_bytes: int = 2,
    budget: int = 100 * 1024 * 1024,
    lora_pack: Optional[Dict] = None,
) -> bool:
    """Static check: does the merged-head variant's VMEM scratch fit?

    The head ring adds 2*K*bsh int8 (+~1 MB of scales) on top of the layer
    kernel's rings and windows; at large B x window serving geometries that
    can blow the ~110 MB cap, in which case callers keep the two-kernel
    split (decode_head stays the fallback)."""
    if not isinstance(head_blk, dict) or "w8_blk" not in head_blk:
        return False
    mlp = packed["mlp"]
    _, nc, k, bs = mlp["gate_blk"].shape
    nq2 = packed["attn"]["qkv"]["w8"].shape[-1]
    ko = packed["attn"]["o"]["w8"].shape[-2]
    nch, _, bsh = head_blk["w8_blk"].shape
    nq = nq2 - 2 * head_dim
    scratch = (
        batch * nq * act_bytes  # a_buf
        + batch * k * act_bytes  # h_state
        + 2 * k * nq2  # qkv ring (int8)
        + 2 * ko * k  # o ring
        + 2 * 2 * batch * window * head_dim * cache_bytes  # k/v windows
        + 3 * 2 * k * bs  # gate/up/down rings
        + batch * k * 4  # acc
        + 2 * k * bsh  # head ring
    )
    resident_inputs = (
        nch * bsh * 4  # head scales (VMEM input)
        + 2 * nc * bs * 4  # gs/us blocks
        + batch * window * 4  # bias
        + 3 * batch * head_dim * act_bytes * (1 + nq // head_dim)
    )
    if lora_pack is not None:
        # per-layer lora blocks (bf16) are auto-pipelined (x2 buffers)
        per_layer = 0
        for n in ("qkv_a", "qkv_b", "o_a", "o_b", "gu_a", "gate_b",
                  "up_b", "down_a", "down_b"):
            sz = 2
            for d in lora_pack[n].shape[1:]:
                sz *= d
            per_layer += sz
        resident_inputs += 2 * per_layer
    return scratch + resident_inputs < budget


def layers_decode_fused(
    x: jnp.ndarray,  # (B, 1, K)
    packed: Dict,  # repack_layers() output
    k_cache: jnp.ndarray,  # (L, B, S, D)
    v_cache: jnp.ndarray,  # (L, B, S, D)
    cache_pos: jnp.ndarray,  # (B,) int32 per-row write positions
    kv_valid_window: jnp.ndarray,  # (B, W) bool — incl. this token's slot
    cos: jnp.ndarray,  # (B, D)
    sin: jnp.ndarray,
    window: int,
    n_heads: int,
    head_dim: int,
    eps: float,
    interpret: Optional[bool] = None,
    head_blk: Optional[Dict] = None,  # decode_head.repack_head() output
    final_norm: Optional[jnp.ndarray] = None,  # (K,) final rmsnorm weight
    lora_pack: Optional[Dict] = None,  # repack_lora_bank_fused() output
    adapter_ids: Optional[jnp.ndarray] = None,  # (B,) int32 bank rows
) -> Tuple[jnp.ndarray, ...]:
    """All L layers for B lockstep rows in ONE kernel. Returns
    (hidden (B,1,K), k_new (L,B,D), v_new (L,B,D)); the caller writes the
    per-row cache rows (dynamic_update_slice per row, or one slice when
    all rows share a position).

    With ``head_blk`` + ``final_norm`` the final rmsnorm, int8 LM head and
    running argmax are merged into the SAME kernel (greedy decode): two
    extra results (greedy token ids (B,) int32, winning logits (B,) f32)
    are appended, and the engine's fused tick is one pallas_call instead
    of two.

    With ``lora_pack`` + ``adapter_ids`` each row's LoRA adapter applies
    INSIDE the kernel (concat-basis: two dense dots + a per-row block
    mask per target per layer), so multi-LoRA serving keeps the fused
    tick instead of degrading to the XLA path."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with_head = head_blk is not None
    if with_head:
        assert final_norm is not None and "w8_blk" in head_blk
    with_lora = lora_pack is not None
    if with_lora:
        assert adapter_ids is not None
    k = x.shape[-1]
    b = x.shape[0]
    x2 = x.reshape(b, k)
    mlp = packed["mlp"]
    L, nc, _, bs = mlp["gate_blk"].shape
    S = k_cache.shape[2]
    window = min(window, S)
    assert kv_valid_window.shape == (b, window), (
        kv_valid_window.shape, (b, window),
    )
    qkv_w8 = packed["attn"]["qkv"]["w8"]
    o_w8 = packed["attn"]["o"]["w8"]
    nq2 = qkv_w8.shape[-1]
    ko = o_w8.shape[-2]
    cdtype = k_cache.dtype
    head_static = None
    if with_head:
        h_nch, _, h_bs = head_blk["w8_blk"].shape
        head_static = (h_nch, h_bs, head_blk["s"].shape[0])

    in_specs = [
            pl.BlockSpec((b, k), lambda l, s: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda l, s: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda l, s: (0, 0)),
            pl.BlockSpec((b * n_heads, head_dim), lambda l, s: (0, 0)),
            pl.BlockSpec((b * n_heads, head_dim), lambda l, s: (0, 0)),
            pl.BlockSpec((b, window), lambda l, s: (0, 0)),
            pl.BlockSpec((1, 1, k), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda l, s: (l, 0, 0)),
            # weight stacks pinned to HBM (not ANY): small stacks otherwise
            # get promoted to VMEM and the manual DMAs miscompile — see
            # decode_mlp.mlp_decode_fused for the full note
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, nq2), lambda l, s: (l, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, k), lambda l, s: (l, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, nc, bs), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, nc, bs), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda l, s: (l, 0, 0)),
            # caches pinned to HBM: under ANY the compiler promotes the
            # (small enough) cache into VMEM and the window DMA misbehaves
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    out_specs = [
            pl.BlockSpec((b, k), lambda l, s: (0, 0)),
            pl.BlockSpec((1, b, head_dim), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, b, head_dim), lambda l, s: (l, 0, 0)),
    ]
    out_shape = [
            jax.ShapeDtypeStruct((b, k), x.dtype),
            jax.ShapeDtypeStruct((L, b, head_dim), cdtype),
            jax.ShapeDtypeStruct((L, b, head_dim), cdtype),
    ]
    scratch_shapes = [
            pltpu.VMEM((b, n_heads * head_dim), x.dtype),
            pltpu.VMEM((b, k), x.dtype),
            pltpu.VMEM((2, k, nq2), jnp.int8),
            pltpu.VMEM((2, ko, k), jnp.int8),
            pltpu.VMEM((2, b, window, head_dim), cdtype),
            pltpu.VMEM((2, b, window, head_dim), cdtype),
            pltpu.VMEM((2, k, bs), jnp.int8),
            pltpu.VMEM((2, k, bs), jnp.int8),
            pltpu.VMEM((2, bs, k), jnp.int8),
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.SemaphoreType.DMA((7, 2)),
    ]
    operands = [
        x2,
        cos.astype(x.dtype).reshape(b, head_dim),
        sin.astype(x.dtype).reshape(b, head_dim),
        jnp.repeat(cos.astype(x.dtype).reshape(b, head_dim), n_heads, axis=0),
        jnp.repeat(sin.astype(x.dtype).reshape(b, head_dim), n_heads, axis=0),
        jnp.where(kv_valid_window, 0.0, -jnp.inf).astype(jnp.float32),
        packed["input_norm"],
        packed["post_norm"],
        qkv_w8,
        packed["qkv_s"],
        o_w8,
        packed["o_s"],
        mlp["gate_blk"],
        mlp["up_blk"],
        mlp["down_w8"],
        mlp["gs"],
        mlp["us"],
        mlp["ds"],
        k_cache,
        v_cache,
    ]
    if with_head:
        in_specs += [
            pl.BlockSpec((1, 1, k), lambda l, s: (0, 0, 0)),  # final norm
            pl.BlockSpec(memory_space=pltpu.HBM),  # head w8 chunks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # head scales
        ]
        out_specs += [
            pl.BlockSpec((b, 1), lambda l, s: (0, 0)),
            pl.BlockSpec((b, 1), lambda l, s: (0, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ]
        scratch_shapes += [
            pltpu.VMEM((2, k, head_static[1]), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        operands += [
            final_norm.reshape(1, 1, k),
            head_blk["w8_blk"],
            head_blk["s_blk"],
        ]
    if with_lora:
        lp = lora_pack
        G = lp["o_b"].shape[1]
        nq = n_heads * head_dim
        m1, m2, m3 = lora_row_masks(
            jnp.asarray(adapter_ids, jnp.int32).reshape(-1), G,
            lp["rank"], x.dtype,
        )
        in_specs += [
            pl.BlockSpec((b, G), lambda l, s: (0, 0)),
            pl.BlockSpec((b, 2 * G), lambda l, s: (0, 0)),
            pl.BlockSpec((b, 3 * G), lambda l, s: (0, 0)),
            pl.BlockSpec((1, k, 3 * G), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, 3 * G, nq2), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, nq, G), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, G, k), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, k, 2 * G), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, nc, G, bs), lambda l, s: (l, 0, 0, 0)),
            pl.BlockSpec((1, nc, G, bs), lambda l, s: (l, 0, 0, 0)),
            pl.BlockSpec((1, nc, bs, G), lambda l, s: (l, 0, 0, 0)),
            pl.BlockSpec((1, G, k), lambda l, s: (l, 0, 0)),
        ]
        scratch_shapes += [pltpu.VMEM((b, G), jnp.float32)]
        operands += [
            m1, m2, m3,
            lp["qkv_a"].astype(x.dtype), lp["qkv_b"].astype(x.dtype),
            lp["o_a"].astype(x.dtype), lp["o_b"].astype(x.dtype),
            lp["gu_a"].astype(x.dtype),
            lp["gate_b"].astype(x.dtype), lp["up_b"].astype(x.dtype),
            lp["down_a"].astype(x.dtype), lp["down_b"].astype(x.dtype),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    pos_vec = jnp.broadcast_to(
        jnp.asarray(cache_pos, jnp.int32).reshape(-1), (b,)
    )
    results = pl.pallas_call(
        functools.partial(
            _kernel_all, n_layers=L, nc=nc, bs=bs, window=window,
            n_heads=n_heads, head_dim=head_dim, eps=eps,
            scale=head_dim**-0.5, batch=b, head=head_static,
            lora=with_lora,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(pos_vec, *operands)
    if with_head:
        out, k_new, v_new, tok, mx = results
        return (
            out.reshape(x.shape[0], 1, k), k_new, v_new,
            tok[:, 0], mx[:, 0],
        )
    out, k_new, v_new = results
    return out.reshape(x.shape[0], 1, k), k_new, v_new
