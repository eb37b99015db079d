"""Gemma decoder — functional JAX with a preallocated KV cache, TPU-first.

Capabilities mirror the reference decoder (ref: modeling_gemma.py): token
embedding scaled by sqrt(hidden) (ref: 510-511), N pre-norm blocks of
GQA attention (RoPE half-split) + GeGLU MLP, final RMSNorm, tied bias-free
LM head. Design differences (intentional, TPU-native):

* KV cache is a preallocated array pair ``(L, B, max_seq, n_kv, head_dim)``
  updated with ``lax.dynamic_update_slice`` at a traced write offset — the
  reference's Python-list-of-tensors + torch.cat reallocation
  (ref: modeling_gemma.py:8-64) is O(seq) per step per layer and cannot jit.
* One RoPE table per step, shared by all layers (the reference instantiates
  a RoPE module per layer, ref: modeling_gemma.py:238-242).
* GQA runs grouped (ops.attention.gqa) — no repeat_kv materialization
  (ref: modeling_gemma.py:185-196).
* The LM head is the transposed embedding (tied), with NO bias: the
  reference constructs ``nn.Linear(hidden, vocab)`` with a default bias that
  never receives checkpoint weights (ref: modeling_gemma.py:484, a bug vs
  HF); we follow HF semantics.
* Layer stack runs under ``lax.scan`` over stacked params — fast compiles
  and a natural ``jax.checkpoint`` (remat) boundary for training.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GemmaConfig
from ..kernels.quant import matmul_any
from ..ops import attention
from ..ops.activations import gelu_tanh
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin

Params = Dict[str, Any]
KVCache = Dict[str, jnp.ndarray]  # {"k": (L,B,S,n_kv,d), "v": (L,B,S,n_kv,d)}


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------
def init_params(key: jax.Array, cfg: GemmaConfig, dtype=jnp.float32) -> Params:
    h = cfg.hidden_size
    inter = cfg.intermediate_size
    hq = cfg.num_attention_heads * cfg.head_dim
    hkv = cfg.num_key_value_heads * cfg.head_dim
    n_layers = cfg.num_hidden_layers
    k_embed, k_layers = jax.random.split(key)

    def one_layer(k):
        ks = jax.random.split(k, 7)
        s = h**-0.5
        return {
            "input_norm": jnp.zeros((h,), dtype),  # Gemma (1+w) => zero init
            "attn": {
                "q": jax.random.normal(ks[0], (h, hq), dtype) * s,
                "k": jax.random.normal(ks[1], (h, hkv), dtype) * s,
                "v": jax.random.normal(ks[2], (h, hkv), dtype) * s,
                "o": jax.random.normal(ks[3], (hq, h), dtype) * (hq**-0.5),
            },
            "post_norm": jnp.zeros((h,), dtype),
            "mlp": {
                "gate": jax.random.normal(ks[4], (h, inter), dtype) * s,
                "up": jax.random.normal(ks[5], (h, inter), dtype) * s,
                "down": jax.random.normal(ks[6], (inter, h), dtype) * (inter**-0.5),
            },
        }

    layer_keys = jax.random.split(k_layers, n_layers)
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *[one_layer(k) for k in layer_keys])
    return {
        "embed": jax.random.normal(k_embed, (cfg.vocab_size, h), dtype) * 0.02,
        "layers": layers,
        "final_norm": jnp.zeros((h,), dtype),
    }


def init_kv_cache(
    cfg: GemmaConfig, batch: int, max_seq: int, dtype=jnp.float32
) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_seq, cfg.num_key_value_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------
def _lora_delta(y: jnp.ndarray, lora_lp: Optional[Params], name: str) -> jnp.ndarray:
    """Low-rank update ``y @ A @ B * (alpha/r)`` for projection ``name``, or 0.

    LoRA runs un-merged: two skinny matmuls per target instead of
    materializing W + AB (the rank-r path is free next to the base GEMMs).
    Mirrors the reference Q-LoRA targets q/k/v/o/gate/up/down
    (ref: Paligemma_FT.ipynb cell 41).
    """
    if lora_lp is None or name not in lora_lp:
        return 0.0
    a, b = lora_lp[name]["a"], lora_lp[name]["b"]
    scale = lora_lp[name]["alpha"] / a.shape[-1]
    if a.ndim == 3:
        # multi-adapter bank slice (N, in, r): every row of the batch uses
        # ITS OWN adapter, selected by the (B,) ids the serving engine
        # threads in as lora_lp["__ids__"] (id 0 = the all-zero base
        # adapter). The gather reads B*in*r adapter elements per target —
        # ~2% of the base weight stream at r=8 — so multi-LoRA decode
        # stays weight-bandwidth-bound (train/lora.py stack_lora_bank).
        ids = lora_lp["__ids__"]
        if "a_cat" in lora_lp[name]:
            # concat-basis: two regular matmuls over the whole (N+1)-wide
            # adapter basis + a per-row 0/1 block mask (alpha pre-folded
            # into b_cat at stack_lora_bank) — MXU-shaped, no per-row
            # gathers in the latency-bound tick. Extra traffic is the
            # (N+1)/1-wide basis instead of the row's slice: ~(N+1)*r
            # columns of in+out, still ~2% of the base stream at N=4 r=8.
            a_cat = lora_lp[name]["a_cat"]  # (in, (N+1)*r)
            b_cat = lora_lp[name]["b_cat"]  # ((N+1)*r, out)
            r = a.shape[-1]
            col_ad = jnp.arange(a_cat.shape[-1], dtype=jnp.int32) // r
            mask = (col_ad[None] == ids[:, None]).astype(a_cat.dtype)
            z = (y.astype(a_cat.dtype) @ a_cat) * mask[:, None, :]
            return (z @ b_cat).astype(y.dtype)
        a_rows = a[ids]  # (B, in, r)
        b_rows = b[ids]  # (B, r, out)
        s_rows = scale[ids].astype(a.dtype)  # (B,)
        delta = jnp.einsum("bsi,bir->bsr", y.astype(a.dtype), a_rows)
        delta = jnp.einsum("bsr,bro->bso", delta, b_rows)
        return (delta * s_rows[:, None, None]).astype(y.dtype)
    # adapters may be fp32 over a bf16 base: compute in adapter dtype for
    # gradient quality, return in activation dtype
    delta = ((y.astype(a.dtype) @ a) @ b) * scale.astype(a.dtype)
    return delta.astype(y.dtype)


def _attn_proj(
    cfg: GemmaConfig, y: jnp.ndarray, lp: Params, lora_lp: Optional[Params],
    int8_act: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """q/k/v projections (+LoRA), handling both the unfused layout and the
    serving-side fused ``qkv`` layout (runtime.quantize.fuse_qkv — one
    weight stream instead of three kernel launches per layer).
    Returns (B,S,nh,hd), (B,S,nkv,hd), (B,S,nkv,hd)."""
    b, s, _ = y.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if "qkv" in lp["attn"]:
        qkv = matmul_any(y, lp["attn"]["qkv"], int8_act=int8_act)
        nq = nh * hd
        q = qkv[..., :nq] + _lora_delta(y, lora_lp, "q")
        k = qkv[..., nq : nq + nkv * hd] + _lora_delta(y, lora_lp, "k")
        v = qkv[..., nq + nkv * hd :] + _lora_delta(y, lora_lp, "v")
    else:
        q = matmul_any(y, lp["attn"]["q"], int8_act=int8_act) + _lora_delta(y, lora_lp, "q")
        k = matmul_any(y, lp["attn"]["k"], int8_act=int8_act) + _lora_delta(y, lora_lp, "k")
        v = matmul_any(y, lp["attn"]["v"], int8_act=int8_act) + _lora_delta(y, lora_lp, "v")
    return (q.reshape(b, s, nh, hd), k.reshape(b, s, nkv, hd),
            v.reshape(b, s, nkv, hd))


def _mlp(
    cfg: GemmaConfig, y: jnp.ndarray, lp: Params, lora_lp: Optional[Params],
    int8_act: bool = False,
) -> jnp.ndarray:
    """GeGLU MLP (+LoRA), fused ``gateup`` or unfused layout."""
    if "gateup" in lp["mlp"]:
        gu_fused = matmul_any(y, lp["mlp"]["gateup"], int8_act=int8_act)
        inter = gu_fused.shape[-1] // 2
        gate = gelu_tanh(gu_fused[..., :inter] + _lora_delta(y, lora_lp, "gate"))
        up = gu_fused[..., inter:] + _lora_delta(y, lora_lp, "up")
    else:
        gate = gelu_tanh(matmul_any(y, lp["mlp"]["gate"], int8_act=int8_act) + _lora_delta(y, lora_lp, "gate"))
        up = matmul_any(y, lp["mlp"]["up"], int8_act=int8_act) + _lora_delta(y, lora_lp, "up")
    gu = gate * up
    return matmul_any(gu, lp["mlp"]["down"], int8_act=int8_act) + _lora_delta(gu, lora_lp, "down")


def _decoder_block(
    cfg: GemmaConfig,
    x: jnp.ndarray,  # (B, S, H)
    lp: Params,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    k_all: Optional[jnp.ndarray],  # (L, B, max_seq, n_kv, d) or None (train)
    v_all: Optional[jnp.ndarray],
    layer_idx: Optional[jnp.ndarray],  # scalar int32 into the L axis
    cache_pos: Optional[jnp.ndarray],  # scalar int32: write offset into the cache
    mask: Optional[jnp.ndarray],  # (B, 1, S, Sk) additive fp32 (XLA path)
    lora_lp: Optional[Params] = None,
    flash_lens: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    mesh=None,
    kv_bucket: Optional[int] = None,  # static: attend over cache[:, :bucket]
    mlp_full: Optional[Params] = None,  # full stacked int8 MLP (fused kernel)
    int8_act: bool = False,  # W8A8 projections at prefill-sized shapes
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """One pre-norm decoder block.

    The KV cache is passed as the FULL stacked (L, ...) arrays plus a layer
    index, and this block writes only its token region in place — the cache
    lives in the scan *carry*, which XLA aliases across iterations with no
    copies. (Scanning the cache through xs/ys instead costs a full
    cache-sized copy pair per decode step: measured 58 us/step at a
    2048-slot 3B cache.)
    """
    b, s, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    residual = x
    y = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
    q, k, v = _attn_proj(cfg, y, lp, lora_lp, int8_act=int8_act)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if k_all is not None:
        # Cache write at a traced offset — replaces the torch.cat append
        # (ref: modeling_gemma.py:54-55). A scalar offset writes the whole
        # (B, S) block (prefill / lockstep decode); a (B,) vector scatters
        # each row's S-token block at per-row positions (continuous
        # batching: S==1 per tick; speculative verify: S==draft_k+1).
        # Writes go straight into the stacked (L, ...) carry at layer_idx.
        zero = jnp.zeros((), jnp.int32)
        if cache_pos.ndim == 1:
            # per-row writes (continuous batching: sequences at different
            # lengths): unrolled dynamic_update_slice per row — in-place
            # updates XLA can alias, unlike a gather/scatter (slow on TPU)
            # or a one-hot full-cache select (defeats aliasing in the scan).
            for r in range(b):
                kr = k[None, r : r + 1, :].astype(k_all.dtype)
                vr = v[None, r : r + 1, :].astype(v_all.dtype)
                idx = (layer_idx, jnp.asarray(r, jnp.int32), cache_pos[r],
                       zero, zero)
                k_all = jax.lax.dynamic_update_slice(k_all, kr, idx)
                v_all = jax.lax.dynamic_update_slice(v_all, vr, idx)
        else:
            idx = (layer_idx, zero, cache_pos, zero, zero)
            k_all = jax.lax.dynamic_update_slice(
                k_all, k[None].astype(k_all.dtype), idx
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, v[None].astype(v_all.dtype), idx
            )
        # Length-aware decode: slice only (layer, :, :bucket) out of the
        # stacked cache in ONE dynamic_slice — the caller picks the static
        # bucket >= write_pos+1 host-side; masked tail positions contribute
        # exp(NEG_INF) == 0 exactly, so numerics are identical to attending
        # over the whole cache. This replaces the reference's ever-growing
        # torch.cat cache reads (ref: modeling_gemma.py:54-55) with bounded,
        # mostly-live reads.
        window = min(kv_bucket or k_all.shape[2], k_all.shape[2])
        sizes = (1, b, window, nkv, hd)
        start = (layer_idx, zero, zero, zero, zero)
        k_att = jax.lax.dynamic_slice(k_all, start, sizes)[0].astype(q.dtype)
        v_att = jax.lax.dynamic_slice(v_all, start, sizes)[0].astype(q.dtype)
    else:
        k_att, v_att = k, v

    if flash_lens is not None:
        # Pallas flash path. During prefill the fresh k/v cover exactly the
        # cache slots [0, S) so attending over them (not the whole max_seq
        # cache) is equivalent and cheaper.
        from ..kernels.flash_attention import flash_attention, flash_attention_sharded

        prefix_lens, seq_lens = flash_lens
        if mesh is not None:
            a = flash_attention_sharded(q, k, v, prefix_lens, seq_lens, mesh,
                                        scale=hd**-0.5)
        else:
            a = flash_attention(q, k, v, prefix_lens, seq_lens, scale=hd**-0.5)
    else:
        a = attention.gqa(q, k_att, v_att, mask, scale=hd**-0.5)
    a = a.reshape(b, s, nh * hd)
    x = residual + (matmul_any(a, lp["attn"]["o"], int8_act=int8_act)
                    + _lora_delta(a, lora_lp, "o"))

    residual = x
    y = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
    if mlp_full is not None:
        # Single-token decode: one fused Pallas kernel streams gate/up/down
        # with double-buffered DMA instead of three XLA matmuls — removes
        # the ~20 us/layer of inter-op pipeline bubbles (kernels/decode_mlp)
        from ..kernels.decode_mlp import mlp_decode_fused

        return residual + mlp_decode_fused(y, mlp_full, layer_idx), k_all, v_all
    return residual + _mlp(cfg, y, lp, lora_lp, int8_act=int8_act), k_all, v_all


def forward(
    params: Params,
    cfg: GemmaConfig,
    input_embeds: jnp.ndarray,  # (B, S, H) — pre-merged (VLM injects image embeds)
    position_ids: jnp.ndarray,  # (B, S) int32
    kv_cache: KVCache,
    cache_pos: jnp.ndarray,  # scalar int32 write offset
    kv_valid: jnp.ndarray,  # (B, max_seq) bool: attendable cache slots AFTER write
    remat: bool = False,
    flash_lens: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    logits_idx: Optional[jnp.ndarray] = None,  # (B,) positions to project
    mesh=None,
    kv_bucket: Optional[int] = None,  # static attend-window (decode fast path)
    scan_block: int = 1,  # decoder layers per scan body (see below)
    fused_mlp: bool = False,  # use the fused decode-MLP kernel (S==1, int8)
    fused_layer: bool = False,  # whole-layer decode kernel (S==1, B==1, int8)
    greedy_head: bool = False,  # return the argmax token id, not logits
    lora: Optional[Params] = None,  # un-merged adapters or a per-row bank
    int8_act: bool = False,  # W8A8 int8-weight projections at prefill shapes
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the decoder stack. Returns (fp32 logits (B,S,vocab), new cache).

    Masking: PaliGemma prefix-LM semantics — queries attend to every *valid*
    cache slot, bidirectionally during prefill and over [0, len) during
    decode (the reference materializes all-zero masks for both phases,
    ref: modeling_paligemma.py:149-169; padding never occurs at B=1 there).
    ``kv_valid`` generalizes this to padded batches.
    """
    dtype = input_embeds.dtype
    normalizer = jnp.asarray(cfg.hidden_size**0.5, dtype)
    x = input_embeds * normalizer

    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, dtype)
    s = input_embeds.shape[1]
    if kv_bucket is not None:
        kv_bucket = min(kv_bucket, kv_valid.shape[-1])
    if flash_lens is not None:
        mask = None
    else:
        # kv_valid: (B, max_seq) row-validity (every query sees every valid
        # slot — PaliGemma prefix-LM + decode), or pairwise (B, S, max_seq)
        # (recompute prefills: bidirectional prefix + causal suffix)
        kv_vis = (
            kv_valid[..., :kv_bucket] if kv_bucket is not None else kv_valid
        )
        if kv_vis.ndim == 2:
            kv_vis = jnp.broadcast_to(
                kv_vis[:, None, :], (kv_vis.shape[0], s, kv_vis.shape[1])
            )
        mask = attention.make_additive_mask(kv_vis)

    # Fused decode-MLP: the full stacked int8 MLP weights are captured as
    # loop-invariant kernel operands (NOT scan xs — a per-iteration xs
    # slice would make XLA materialize a 100 MB copy for the custom call)
    # and the kernel picks its layer by index. Guarded to the exact decode
    # shape the kernel is built for.
    # Whole-layer fused decode kernel (kernels/decode_layer): one Pallas
    # call does ALL layers' norm/qkv/rope/attention/o/MLP with manually
    # scheduled DMA; B rows decode in lockstep through the shared weight
    # stream (exact for padded batches — the kernel takes the real
    # validity-mask window and per-row positions).
    b = input_embeds.shape[0]
    # multi-LoRA banks pre-packed for the fused kernel keep the fused
    # path (in-kernel concat-basis deltas); other lora trees fall to XLA
    lora_fused = (
        lora is not None
        and "__fused_pack__" in lora
        and "__ids__" in lora.get("layers", {})
    )
    if (
        fused_layer and s == 1 and b <= 32 and mesh is None
        and (lora is None or lora_fused) and "qkv_s" in params["layers"]
    ):
        # b <= 32 mirrors decode_layer.supported: beyond that the lockstep
        # VMEM window rings blow the scratch cap — oversized batches must
        # silently take the XLA scan path below, not die at compile
        from ..kernels import decode_layer

        n_layers = kv_cache["k"].shape[0]
        S = kv_cache["k"].shape[2]
        hd = cfg.head_dim
        k_flat = kv_cache["k"].reshape(n_layers, b, S, hd)
        v_flat = kv_cache["v"].reshape(n_layers, b, S, hd)
        window = min(kv_bucket or S, S)
        valid_w = (
            kv_valid[:, :window]
            if kv_valid.ndim == 2
            else kv_valid[:, 0, :window]
        )

        zero = jnp.zeros((), jnp.int32)
        # merged-head variant: final norm + int8 head + running argmax run
        # inside the SAME grid-over-layers kernel, so the greedy step is
        # ONE pallas_call instead of two (one ~217 us launch floor erased;
        # head chunk 0 streams behind the last layer's MLP). Falls back to
        # the split decode_head kernel when the head ring would blow VMEM.
        lora_kw = {}
        if lora_fused:
            lora_kw = dict(
                lora_pack=lora["__fused_pack__"],
                adapter_ids=lora["layers"]["__ids__"][0],
            )
        merged = (
            greedy_head
            and decode_layer.merged_head_fits(
                params["layers"], params.get("head_q"), b, window, hd,
                cache_bytes=k_flat.dtype.itemsize,
                lora_pack=lora_kw.get("lora_pack"),
            )
        )
        tok = None
        if merged:
            x, k_news, v_news, tok, _ = decode_layer.layers_decode_fused(
                x, params["layers"], k_flat, v_flat, cache_pos, valid_w,
                cos[:, 0], sin[:, 0], window, cfg.num_attention_heads,
                hd, cfg.rms_norm_eps,
                head_blk=params["head_q"], final_norm=params["final_norm"],
                **lora_kw,
            )
        else:
            x, k_news, v_news = decode_layer.layers_decode_fused(
                x, params["layers"], k_flat, v_flat, cache_pos, valid_w,
                cos[:, 0], sin[:, 0], window, cfg.num_attention_heads,
                hd, cfg.rms_norm_eps, **lora_kw,
            )
        k_news = k_news[:, :, None, :].astype(k_flat.dtype)  # (L, B, 1, D)
        v_news = v_news[:, :, None, :].astype(v_flat.dtype)
        if jnp.ndim(cache_pos) == 0:
            k_flat = jax.lax.dynamic_update_slice(
                k_flat, k_news, (zero, zero, cache_pos, zero)
            )
            v_flat = jax.lax.dynamic_update_slice(
                v_flat, v_news, (zero, zero, cache_pos, zero)
            )
        else:
            # per-row positions (continuous batching): unrolled row writes
            for r in range(b):
                idx = (zero, jnp.asarray(r, jnp.int32), cache_pos[r], zero)
                k_flat = jax.lax.dynamic_update_slice(
                    k_flat, k_news[:, r : r + 1], idx
                )
                v_flat = jax.lax.dynamic_update_slice(
                    v_flat, v_news[:, r : r + 1], idx
                )
        new_cache = {
            "k": k_flat.reshape(kv_cache["k"].shape),
            "v": v_flat.reshape(kv_cache["v"].shape),
        }
        if merged:
            return tok, new_cache
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if greedy_head and "w8_blk" in params.get("head_q", {}):
            # greedy decode: stream the int8 head with a fused running
            # argmax — the 1 MB logits row is never materialized
            from ..kernels.decode_head import head_argmax_fused

            tok = head_argmax_fused(x, params["head_q"])  # (1,)
            return tok, new_cache
        if logits_idx is not None:
            x = jnp.take_along_axis(x, logits_idx[:, None, None], axis=1)
        logits = lm_head(params, x).astype(jnp.float32)
        if greedy_head:
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), new_cache
        return logits, new_cache

    mlp_full = None
    layers_for_scan = params["layers"]
    if fused_mlp and s == 1 and mesh is None and lora is None:
        # the engine repacks layers.mlp via kernels.decode_mlp.repack; a
        # packed tree carries "gate_blk" and only the fused path reads it
        if "gate_blk" in params["layers"]["mlp"]:
            mlp_full = params["layers"]["mlp"]
            layers_for_scan = dict(params["layers"])
            layers_for_scan["mlp"] = {}

    block = functools.partial(
        _decoder_block, cfg, kv_bucket=kv_bucket, mlp_full=mlp_full,
        int8_act=int8_act,
    )
    if remat:
        block = jax.checkpoint(block)

    n_layers = kv_cache["k"].shape[0]

    # ``scan_block`` groups g layers into one scan body: the while-loop runs
    # L/g iterations, amortizing per-iteration loop overhead (decode is
    # latency-sensitive at B=1). UNLIKE jax.lax.scan's unroll= (which
    # replicates the carry and breaks cache aliasing — measured 262 -> 117
    # tok/s at unroll=3), the grouped body still threads ONE carry linearly,
    # so the in-place cache updates stay aliased.
    g = scan_block if n_layers % scan_block == 0 else 1
    if lora is not None:
        g = 1  # adapters ride the scan xs un-grouped (rank-r, cost-free)
    layers_g = jax.tree.map(
        lambda a: a.reshape((n_layers // g, g) + a.shape[1:]),
        layers_for_scan,
    ) if g > 1 else layers_for_scan

    def body(carry, layer):
        h, k_all, v_all = carry
        if lora is not None:
            lp_g, lora_lp, base = layer
        else:
            lp_g, base = layer
            lora_lp = None
        for j in range(g):
            lp = jax.tree.map(lambda a: a[j], lp_g) if g > 1 else lp_g
            h, k_all, v_all = block(
                h, lp, cos, sin, k_all, v_all,
                base * g + j if g > 1 else base,
                cache_pos, mask, lora_lp=lora_lp, flash_lens=flash_lens,
                mesh=mesh,
            )
        return (h, k_all, v_all), None

    # The cache rides the scan CARRY (in-place aliased across iterations);
    # scanning it through xs/ys instead costs a cache-sized copy pair per
    # step.
    idxs = jnp.arange(n_layers // g, dtype=jnp.int32)
    xs = (
        (layers_g, lora["layers"], idxs) if lora is not None
        else (layers_g, idxs)
    )
    (x, new_k, new_v), _ = jax.lax.scan(
        body, (x, kv_cache["k"], kv_cache["v"]), xs
    )
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if logits_idx is not None:
        # project only the requested positions — at prefill the engine needs
        # just each row's last valid token, and the 257k-vocab head over the
        # full prompt is ~15% of prefill time
        x = jnp.take_along_axis(x, logits_idx[:, None, None], axis=1)
    logits = lm_head(params, x).astype(jnp.float32)
    if greedy_head:  # XLA fallback when the fused greedy path isn't taken
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), {
            "k": new_k, "v": new_v,
        }
    return logits, {"k": new_k, "v": new_v}


def forward_paged_decode_staged(
    params: Params,
    cfg: GemmaConfig,
    input_embeds: jnp.ndarray,  # (B, 1, H)
    position_ids: jnp.ndarray,  # (B, 1) int32
    pool: KVCache,  # page pool (L, n_pages, page_size, n_kv, d)
    page_table: jnp.ndarray,  # (B, P_max) int32
    write_pos: jnp.ndarray,  # (B,) int32
    pages_bucket: int,
) -> Tuple[jnp.ndarray, KVCache]:
    """Paged decode through the FUSED dense layer kernel via staging.

    The grid-over-layers kernel (kernels/decode_layer) reads its attention
    window as two contiguous (B, W, D) DMAs per layer — a page-table-aware
    window read would need ~B x pages x 2 x L separate DMA issues per tick
    at ~0.5-1 us of *issue* cost each on this toolchain (measured round 3,
    docs/PERFORMANCE.md "Kernel note"). Instead, STAGE: gather every
    active row's pages into a dense (L, B, W, D) scratch with ONE XLA
    gather per tick (pages are staged in logical order, so the scratch is
    exactly the dense cache prefix the kernel already understands), run
    the unmodified fused kernel over it, then scatter each row's fresh
    K/V back into its current page. Extra traffic: one window
    read + write (~0.3 GB at B16/W1024) against the ~2.5 GB weight stream
    the fused kernel saves its XLA-boundary bubbles on.
    """
    from ..kernels import decode_layer

    b = input_embeds.shape[0]
    nkv, hd = cfg.num_key_value_heads, cfg.head_dim
    n_layers = pool["k"].shape[0]
    ps = pool["k"].shape[2]
    p_max = page_table.shape[1]
    pb = min(pages_bucket, p_max)
    window = pb * ps
    dtype = input_embeds.dtype

    x = input_embeds * jnp.asarray(cfg.hidden_size**0.5, dtype)
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, dtype)
    write_pos = write_pos.astype(jnp.int32)

    # -- stage: (L, n_pages, ps, nkv, d) -> (L, B, W, D) dense window
    page_ids = page_table[:, :pb].astype(jnp.int32).reshape(-1)  # (B*pb,)
    k_st = jnp.take(pool["k"], page_ids, axis=1).reshape(
        n_layers, b, window, nkv * hd
    )
    v_st = jnp.take(pool["v"], page_ids, axis=1).reshape(
        n_layers, b, window, nkv * hd
    )

    # validity incl. this token's slot (the kernel overrides the stale
    # cache read at slot write_pos with the fresh score arithmetically)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (b, window), 1)
        <= write_pos[:, None]
    )

    h, k_news, v_news = decode_layer.layers_decode_fused(
        x, params["layers"], k_st, v_st, write_pos, valid,
        cos[:, 0], sin[:, 0], window, cfg.num_attention_heads, hd,
        cfg.rms_norm_eps,
    )

    # -- scatter the fresh K/V into each row's current page (pages are
    # shared across layers, so one (L,1,1,nkv,d) write per row suffices)
    page_of = jnp.take_along_axis(
        page_table.astype(jnp.int32),
        (write_pos[:, None] // ps), axis=1,
    )[:, 0]
    off_of = write_pos % ps
    zero = jnp.zeros((), jnp.int32)
    new_k, new_v = pool["k"], pool["v"]
    for r in range(b):
        kr = k_news[:, r].reshape(n_layers, 1, 1, nkv, hd).astype(new_k.dtype)
        vr = v_news[:, r].reshape(n_layers, 1, 1, nkv, hd).astype(new_v.dtype)
        idx = (zero, page_of[r], off_of[r], zero, zero)
        new_k = jax.lax.dynamic_update_slice(new_k, kr, idx)
        new_v = jax.lax.dynamic_update_slice(new_v, vr, idx)

    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head(params, h).astype(jnp.float32)
    return logits, {"k": new_k, "v": new_v}


def forward_paged_decode_fused(
    params: Params,
    cfg: GemmaConfig,
    input_embeds: jnp.ndarray,  # (B, 1, H)
    position_ids: jnp.ndarray,  # (B, 1) int32
    pool: KVCache,  # page pool (L, n_pages, page_size, n_kv, d)
    page_table: jnp.ndarray,  # (B, P_max) int32
    write_pos: jnp.ndarray,  # (B,) int32
    pages_bucket: int,
    lora_pack=None,  # kernels/decode_layer.repack_lora_bank_fused output
    adapter_ids=None,  # (B,) int32 bank rows
    greedy_head: bool = False,  # return argmax token ids, not logits
) -> Tuple[jnp.ndarray, KVCache]:
    """Paged decode through the grid-over-layers fused kernel with
    IN-KERNEL page-table window reads (kernels/decode_layer_paged).

    ``greedy_head=True`` streams the int8 head with the fused running
    argmax (kernels/decode_head) instead of materializing the (B, 257k)
    fp32 logits — the greedy serving fast path (mirrors the dense
    engine's decode_step_greedy tick). Requires params["head_q"] with
    the blocked repack.

    Supersedes the staging hybrid for the common case: a pallas_call
    costs ~217 us of launch floor on this runtime
    (.bench/call_floor_probe.py), so the per-layer page-walk tick pays
    ~3.9 ms/tick in floors at 18 layers, and staging pays a
    DMA-issue-bound XLA gather (docs/PERFORMANCE.md). Here the ONE fused
    kernel fetches each row's window as a single DMA per tensor per layer
    when the row's pages are physically consecutive — which the
    contiguity-preferring allocator (runtime/paged_cache.PageAllocator)
    makes the common case — falling back to per-page copies otherwise.

    Caller contract matches forward_paged_decode_staged: params["layers"]
    must be repacked via kernels.decode_layer.repack_layers.
    """
    from ..kernels import decode_layer_paged

    b = input_embeds.shape[0]
    nkv, hd = cfg.num_key_value_heads, cfg.head_dim
    assert nkv == 1, "fused paged decode is MQA-only (Gemma)"
    n_layers = pool["k"].shape[0]
    n_pages, ps = pool["k"].shape[1], pool["k"].shape[2]
    p_max = page_table.shape[1]
    pb = min(pages_bucket, p_max)
    dtype = input_embeds.dtype

    x = input_embeds * jnp.asarray(cfg.hidden_size**0.5, dtype)
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, dtype)
    write_pos = write_pos.astype(jnp.int32)

    k_flat = pool["k"].reshape(n_layers, n_pages, ps, hd)
    v_flat = pool["v"].reshape(n_layers, n_pages, ps, hd)
    h, k_news, v_news = decode_layer_paged.layers_decode_fused_paged(
        x, params["layers"], k_flat, v_flat,
        page_table[:, :pb].astype(jnp.int32), write_pos,
        cos[:, 0], sin[:, 0], cfg.num_attention_heads, hd, cfg.rms_norm_eps,
        lora_pack=lora_pack, adapter_ids=adapter_ids,
    )

    # scatter the fresh K/V into each row's current page (pages shared
    # across layers => one (L,1,1,nkv,d) write per row)
    page_of = jnp.take_along_axis(
        page_table.astype(jnp.int32), (write_pos[:, None] // ps), axis=1
    )[:, 0]
    off_of = write_pos % ps
    zero = jnp.zeros((), jnp.int32)
    new_k, new_v = pool["k"], pool["v"]
    for r in range(b):
        kr = k_news[:, r].reshape(n_layers, 1, 1, nkv, hd).astype(new_k.dtype)
        vr = v_news[:, r].reshape(n_layers, 1, 1, nkv, hd).astype(new_v.dtype)
        idx = (zero, page_of[r], off_of[r], zero, zero)
        new_k = jax.lax.dynamic_update_slice(new_k, kr, idx)
        new_v = jax.lax.dynamic_update_slice(new_v, vr, idx)

    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if greedy_head and "w8_blk" in params.get("head_q", {}):
        from ..kernels.decode_head import head_argmax_fused

        tok = head_argmax_fused(h, params["head_q"])  # (B,)
        return tok, {"k": new_k, "v": new_v}
    logits = lm_head(params, h).astype(jnp.float32)
    if greedy_head:
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), {
            "k": new_k, "v": new_v,
        }
    return logits, {"k": new_k, "v": new_v}


def forward_paged_decode(
    params: Params,
    cfg: GemmaConfig,
    input_embeds: jnp.ndarray,  # (B, 1, H) — one token per row
    position_ids: jnp.ndarray,  # (B, 1) int32
    pool: KVCache,  # {"k","v"}: (L, n_pages, page_size, n_kv, d) page pool
    page_table: jnp.ndarray,  # (B, P_max) int32 physical page per logical page
    write_pos: jnp.ndarray,  # (B,) int32: slot-local position this token lands at
    use_kernel: Optional[bool] = None,
    pages_bucket: Optional[int] = None,  # static bound on logical pages walked
    paged_kernel: str = "multi",  # "one"|"multi"|"batched"|"runs" (A/B knob)
    lora: Optional[Params] = None,  # un-merged adapters or a per-row bank
) -> Tuple[jnp.ndarray, KVCache]:
    """Single-token decode over the PAGED KV pool (runtime.paged_cache).

    Per layer: write this token's K/V into page ``table[r, pos//ps]`` at
    offset ``pos % ps``, then attend over the row's logical pages with the
    Pallas paged kernel (kernels/paged_attention; XLA gather fallback off
    TPU). The pool rides the scan carry exactly like the dense cache —
    in-place aliased writes, and the kernel's BlockSpec index map reads
    pages straight out of the stacked (L, ...) pool (no per-layer slice
    copy). Rows attend ``[0, write_pos+1)`` — serving slots are contiguous
    by construction.

    The reference's cache grows by torch.cat per step and is per-request
    (ref: modeling_gemma.py:8-64); paging replaces the slot-pool engine's
    ``max_slots x max_seq_len`` HBM reservation with proportional-to-live-
    tokens usage (VERDICT r1 item 9).
    """
    from ..kernels import paged_attention as paged_attn

    b = input_embeds.shape[0]
    nkv, hd = cfg.num_key_value_heads, cfg.head_dim
    ps = pool["k"].shape[2]
    dtype = input_embeds.dtype
    if use_kernel is None:
        use_kernel = (
            jax.default_backend() == "tpu"
            and paged_attn.supported(ps, hd)
        )
    x = input_embeds * jnp.asarray(cfg.hidden_size**0.5, dtype)
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, dtype)
    kv_len = write_pos.astype(jnp.int32) + 1
    page_of = jnp.take_along_axis(
        page_table.astype(jnp.int32),
        (write_pos[:, None] // ps).astype(jnp.int32), axis=1,
    )[:, 0]  # (B,) physical page this token lands in
    off_of = (write_pos % ps).astype(jnp.int32)
    if pages_bucket is not None:
        # length-aware walk: the caller guarantees every row's pages fit in
        # the bucket (host bookkeeping, same discipline as the dense path's
        # kv_bucket) — one compiled step per bucket, reads scale with LIVE
        # tokens instead of the table's static width
        page_table = page_table[:, : min(pages_bucket, page_table.shape[1])]

    n_layers = pool["k"].shape[0]

    def body(carry, layer):
        h, k_pool, v_pool = carry
        if lora is not None:
            lp, lora_lp, idx = layer
        else:
            lp, idx = layer
            lora_lp = None
        residual = h
        y = rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _attn_proj(cfg, y, lp, lora_lp)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        zero = jnp.zeros((), jnp.int32)
        for r in range(b):
            kr = k[r].reshape(1, 1, 1, nkv, hd).astype(k_pool.dtype)
            vr = v[r].reshape(1, 1, 1, nkv, hd).astype(v_pool.dtype)
            w_idx = (idx, page_of[r], off_of[r], zero, zero)
            k_pool = jax.lax.dynamic_update_slice(k_pool, kr, w_idx)
            v_pool = jax.lax.dynamic_update_slice(v_pool, vr, w_idx)
        if use_kernel:
            # "multi": one grid step hand-gathers 8 pages, so the fixed
            # per-step Mosaic cost amortizes 8x (the one-page kernel
            # measured ~140 GB/s effective against that bound); "one" and
            # "batched" kept selectable for A/B (docs/PERFORMANCE.md)
            kfn = {
                "one": paged_attn.paged_decode_attention,
                "multi": paged_attn.paged_decode_attention_multi,
                "batched": paged_attn.paged_decode_attention_batched,
                # "runs": ONE DMA issue per physically-consecutive
                # super-block (the allocator hands out runs) + stacked
                # block-diagonal matmuls across rows — attacks both
                # measured page-walk bounds (DMA issue cost and
                # small-matmul serialization)
                "runs": paged_attn.paged_decode_attention_runs,
            }[paged_kernel]
            a = kfn(
                q[:, 0], k_pool, v_pool, page_table, kv_len,
                scale=hd**-0.5, layer_idx=idx,
            )[:, None]
        else:
            a = paged_attn.reference_paged_decode_attention(
                q[:, 0], k_pool, v_pool, page_table, kv_len,
                scale=hd**-0.5, layer_idx=idx,
            )[:, None]
        a = a.reshape(b, 1, -1)
        h = residual + (matmul_any(a, lp["attn"]["o"])
                        + _lora_delta(a, lora_lp, "o"))
        residual = h
        y = rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
        h = residual + _mlp(cfg, y, lp, lora_lp)
        return (h, k_pool, v_pool), None

    idxs = jnp.arange(n_layers, dtype=jnp.int32)
    xs = (
        (params["layers"], lora["layers"], idxs) if lora is not None
        else (params["layers"], idxs)
    )
    (x, new_k, new_v), _ = jax.lax.scan(
        body, (x, pool["k"], pool["v"]), xs
    )
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head(params, x).astype(jnp.float32)
    return logits, {"k": new_k, "v": new_v}


def forward_paged_verify(
    params: Params,
    cfg: GemmaConfig,
    input_embeds: jnp.ndarray,  # (B, s, H) — s = 1 seed + s-1 draft tokens
    position_ids: jnp.ndarray,  # (B, s) int32 RoPE positions
    pool: KVCache,  # {"k","v"}: (L, n_pages, page_size, n_kv, d)
    page_table: jnp.ndarray,  # (B, P_max) int32
    write_pos: jnp.ndarray,  # (B,) int32: slot-local position of tokens[:, 0]
    pages_bucket: Optional[int] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Multi-token verify forward over the PAGED pool (speculative
    decoding's one-weight-stream check of s candidate tokens — the paged
    analog of the dense ``decode_verify`` path used by
    runtime/serving.py's spec windows).

    Per layer: write all s tokens' K/V into their pages (token j of row r
    lands in page ``table[r, (wp+j)//ps]`` — a block may CROSS one page
    boundary; the scheduler pre-reserves the overshoot pages), then
    attend with a per-query causal bound: query i sees logical positions
    ``[0, wp+i]`` — paged rows are contiguous by construction, so no
    validity bitmap exists and rejected-draft K/V beyond the accepted
    prefix is simply never inside a later bound until overwritten.

    XLA path only: the verify forward already amortizes the weight
    stream over s tokens, which is the entire speculative win — the
    single-token fused kernels don't apply (docs/PERFORMANCE.md
    "Speculative decoding"). The reference has neither paging nor
    speculation (ref: modeling_gemma.py:8-64, inference.py:51-87).
    """
    from ..ops import attention as xla_attention

    b, s = input_embeds.shape[:2]
    nkv, hd = cfg.num_key_value_heads, cfg.head_dim
    ps = pool["k"].shape[2]
    dtype = input_embeds.dtype
    x = input_embeds * jnp.asarray(cfg.hidden_size**0.5, dtype)
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, dtype)
    tokpos = write_pos[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    pages = jnp.take_along_axis(
        page_table.astype(jnp.int32), tokpos // ps, axis=1
    )  # (B, s) physical page per written token
    offs = (tokpos % ps).astype(jnp.int32)
    if pages_bucket is not None:
        page_table = page_table[:, : min(pages_bucket, page_table.shape[1])]
    w = page_table.shape[1] * ps
    col = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    # query i attends [0, wp + i] — its own fresh slot and everything before
    vis = col <= (tokpos[:, :, None])
    mask = jnp.where(vis, 0.0, xla_attention.NEG_INF)[:, None]  # (B,1,s,W)

    n_layers = pool["k"].shape[0]

    def body(carry, layer):
        h, k_pool, v_pool = carry
        lp, idx = layer
        residual = h
        y = rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _attn_proj(cfg, y, lp, None)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        zero = jnp.zeros((), jnp.int32)
        # per-token page writes: aliasable dynamic_update_slice chains
        # (like the dense per-row scatter), unrolled B*s per layer —
        # a jnp scatter would defeat the scan carry's in-place aliasing
        for r in range(b):
            for j in range(s):
                kr = k[r, j].reshape(1, 1, 1, nkv, hd).astype(k_pool.dtype)
                vr = v[r, j].reshape(1, 1, 1, nkv, hd).astype(v_pool.dtype)
                w_idx = (idx, pages[r, j], offs[r, j], zero, zero)
                k_pool = jax.lax.dynamic_update_slice(k_pool, kr, w_idx)
                v_pool = jax.lax.dynamic_update_slice(v_pool, vr, w_idx)
        k_g = k_pool[idx, page_table]  # (B, Pb, ps, nkv, hd)
        v_g = v_pool[idx, page_table]
        k_g = k_g.reshape(b, w, nkv, hd)
        v_g = v_g.reshape(b, w, nkv, hd)
        a = xla_attention.gqa(q, k_g, v_g, mask, scale=hd**-0.5)
        a = a.reshape(b, s, -1)
        h = residual + matmul_any(a, lp["attn"]["o"])
        residual = h
        y = rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
        h = residual + _mlp(cfg, y, lp, None)
        return (h, k_pool, v_pool), None

    (x, new_k, new_v), _ = jax.lax.scan(
        body,
        (x, pool["k"], pool["v"]),
        (params["layers"], jnp.arange(n_layers, dtype=jnp.int32)),
    )
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head(params, x).astype(jnp.float32)
    return logits, {"k": new_k, "v": new_v}


def lm_head(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Tied bias-free LM head; uses the int8 copy ("head_q") when present —
    at Gemma's 257k vocab the head is ~1 GB of HBM traffic per decode step
    in bf16, the single largest weight read."""
    if "head_q" in params:
        return matmul_any(x, params["head_q"])
    return x @ params["embed"].T.astype(x.dtype)


def forward_train(
    params: Params,
    cfg: GemmaConfig,
    input_embeds: jnp.ndarray,  # (B, S, H)
    position_ids: jnp.ndarray,  # (B, S)
    pairwise_valid: Optional[jnp.ndarray],  # (B, S, S) bool: q row may attend k col
    lora: Optional[Params] = None,
    remat: bool = True,
    flash_lens: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    mesh=None,
) -> jnp.ndarray:
    """No-cache forward for training (prefix-LM mask: bidirectional prefix +
    causal suffix, built by the caller). Returns fp32 logits (B, S, vocab).

    ``remat=True`` applies jax.checkpoint per decoder block — the gradient
    checkpointing the reference README advertises but never implements
    (ref: README.md:20, absent from the FT notebook).
    """
    dtype = input_embeds.dtype
    x = input_embeds * jnp.asarray(cfg.hidden_size**0.5, dtype)
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, dtype)
    mask = None if flash_lens is not None else attention.make_additive_mask(pairwise_valid)

    def block(h, lp, lora_lp):
        h, _, _ = _decoder_block(cfg, h, lp, cos, sin, None, None, None,
                                 None, mask, lora_lp, flash_lens=flash_lens,
                                 mesh=mesh)
        return h

    if remat:
        block = jax.checkpoint(block)

    if lora is not None:
        def body(h, layer):
            lp, lora_lp = layer
            return block(h, lp, lora_lp), None
        x, _ = jax.lax.scan(body, x, (params["layers"], lora["layers"]))
    else:
        def body(h, lp):
            return block(h, lp, None), None
        x, _ = jax.lax.scan(body, x, params["layers"])

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return lm_head(params, x).astype(jnp.float32)
