"""Tensor-parallel fused decode: per-layer Pallas kernels under shard_map.

The single-chip production decode path is ONE grid-over-layers kernel
(kernels/decode_layer.py) — unshardable as-is, because each layer's o-proj
and down-proj partial sums need a cross-chip reduction *before* the next
(nonlinear) rmsnorm, and a collective cannot run inside that kernel. This
module is the mesh-sharded variant the BASELINE "int8 continuous-batched
serving sharded over 8 chips" config uses: the layer is split at its two
reduction points into

  [attn kernel: norm -> local-head qkv -> RoPE -> MQA attention -> o-proj
   partial]  --psum-->  residual -> norm ->
  [MLP kernel (kernels/decode_mlp): local gate/up -> GeGLU -> down partial]
   --psum-->  residual

with the psums riding ICI in the XLA glue between kernel calls. Sharding
is Megatron-style, matching core/mesh.py: q heads and gate/up columns on
"model", o and down rows on "model", k/v replicated (Gemma MQA: one KV
head — every shard computes the same k/v and holds the same cache), the
vocab-sharded head streamed by the fused argmax kernel per shard and
combined with an all_gather of (winning id, winning logit) pairs. The
batch shards on "data".

Numerics: partial projections leave each kernel in fp32 and are cast to
the activation dtype only after the psum — on a 1-shard mesh this is
bit-identical to the single-chip fused path's (matmul fp32 -> scale ->
cast) order.

Reference parity: the reference has no tensor parallelism at all (its only
distribution is a 25-line DDP demo, ref: test.py:6-25); this path exists
to hit the multi-chip serving bar in BASELINE.md.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.norms import rms_norm
from ..ops.rope import rope_cos_sin
from . import decode_head, decode_mlp


def supported(cfg, mesh: Optional[Mesh], layers, batch: int) -> bool:
    """Static gate for the TP fused decode path (mirrors
    decode_layer.supported, plus the shard-alignment requirements)."""
    if mesh is None:
        return False
    m = int(mesh.shape.get("model", 1))
    d = int(mesh.shape.get("data", 1))
    inter = None
    mlp = layers.get("mlp", {})
    if isinstance(mlp.get("down"), dict) and "w8" in mlp["down"]:
        inter = mlp["down"]["w8"].shape[-2]
    return (
        1 <= batch <= 32 * d
        and batch % d == 0
        and cfg.num_key_value_heads == 1
        and cfg.head_dim % 128 == 0
        and cfg.num_attention_heads % m == 0
        and cfg.vocab_size % m == 0
        and isinstance(layers.get("attn", {}).get("qkv"), dict)
        and "w8" in layers["attn"]["qkv"]
        and inter is not None
        and inter % m == 0
        and decode_mlp.pick_block(inter // m) is not None
    )


# ---------------------------------------------------------------------------
# Per-layer attention kernel (one TP shard's heads)
# ---------------------------------------------------------------------------
def _attn_kernel(
    idx_ref,  # (1,) int32 scalar prefetch: layer index
    x_ref,  # (B, K) — raw hidden state (pre-norm)
    cos_ref,  # (B, D)
    sin_ref,  # (B, D)
    cos_rep_ref,  # (B*Hl, D) — per-row tables repeated per local head
    sin_rep_ref,  # (B*Hl, D)
    bias_ref,  # (B, W) f32 additive mask: 0 attendable, -inf not
    posmask_ref,  # (B, W) f32: 1.0 at the row's write slot, else 0.0
    in_norm_ref,  # (1, 1, K) block at layer l
    q_w8_ref,  # (L, K, NQl) int8 HBM — local q heads
    q_s_ref,  # (1, 1, NQl) block at l
    kv_w8_ref,  # (L, K, 2D) int8 HBM — replicated k|v
    kv_s_ref,  # (1, 1, 2D) block at l
    o_w8_ref,  # (L, NQl, K) int8 HBM — local o rows
    o_s_ref,  # (1, 1, K) block at l
    k_cache_ref,  # (L, B, S, D) HBM
    v_cache_ref,  # (L, B, S, D) HBM
    part_ref,  # (B, K) f32 out — o-proj partial (scale applied, no resid)
    k_new_ref,  # (B, D) out
    v_new_ref,  # (B, D) out
    # scratch
    qw_buf,  # (K, NQl) int8
    kvw_buf,  # (K, 2D) int8
    o_buf,  # (NQl, K) int8
    kwin,  # (B, W, D)
    vwin,  # (B, W, D)
    a_buf,  # (B, NQl)
    sems,  # DMA (5,)
    *,
    window: int,
    n_heads: int,  # LOCAL head count
    head_dim: int,
    eps: float,
    scale: float,
    batch: int,
):
    l = idx_ref[0]
    pltpu.make_async_copy(q_w8_ref.at[l], qw_buf, sems.at[0]).start()
    pltpu.make_async_copy(kv_w8_ref.at[l], kvw_buf, sems.at[1]).start()
    pltpu.make_async_copy(o_w8_ref.at[l], o_buf, sems.at[2]).start()
    pltpu.make_async_copy(
        k_cache_ref.at[l, :, pl.ds(0, window)], kwin, sems.at[3]
    ).start()
    pltpu.make_async_copy(
        v_cache_ref.at[l, :, pl.ds(0, window)], vwin, sems.at[4]
    ).start()

    x = x_ref[...]
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (
        xf * jax.lax.rsqrt(ms + eps)
        * (1.0 + in_norm_ref[0].astype(jnp.float32))
    ).astype(x.dtype)

    half = head_dim // 2

    def rope2(t, c, s):  # 2-D rows only (Mosaic-safe)
        rot = jnp.concatenate([-t[:, half:], t[:, :half]], axis=-1)
        return t * c + rot * s

    pltpu.make_async_copy(kv_w8_ref.at[l], kvw_buf, sems.at[1]).wait()
    kv = jax.lax.dot_general(
        y, kvw_buf[...].astype(y.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    kv = (kv * kv_s_ref[0]).astype(y.dtype)  # (B, 2D)
    k_new = rope2(kv[:, :head_dim], cos_ref[...], sin_ref[...])
    v_new = kv[:, head_dim:]
    k_new_ref[...] = k_new.astype(k_new_ref.dtype)
    v_new_ref[...] = v_new.astype(v_new_ref.dtype)

    pltpu.make_async_copy(q_w8_ref.at[l], qw_buf, sems.at[0]).wait()
    nq = n_heads * head_dim
    q = jax.lax.dot_general(
        y, qw_buf[...].astype(y.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q = (q * q_s_ref[0]).astype(y.dtype)  # (B, NQl)
    # ONE full-array reshape (per-row sliced reshapes crash Mosaic here)
    q_all = rope2(
        q.reshape(batch * n_heads, head_dim),
        cos_rep_ref[...], sin_rep_ref[...],
    )

    pltpu.make_async_copy(
        k_cache_ref.at[l, :, pl.ds(0, window)], kwin, sems.at[3]
    ).wait()
    pltpu.make_async_copy(
        v_cache_ref.at[l, :, pl.ds(0, window)], vwin, sems.at[4]
    ).wait()

    # Per-row MQA attention. The window copy predates this step's cache
    # write, so the fresh token's score/value enter arithmetically via the
    # f32 posmask (no bool where() — (1, W) BOOL broadcasts abort this
    # Mosaic build, and local Hl can be 1).
    for b in range(batch):
        q_b = q_all[b * n_heads : (b + 1) * n_heads]  # (Hl, D)
        k_b = k_new[b : b + 1]  # (1, D)
        pm = posmask_ref[b : b + 1]  # (1, W) f32
        raw = jax.lax.dot_general(
            q_b, kwin[b].astype(q_b.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Hl, W)
        s_new = jnp.sum(
            q_b.astype(jnp.float32) * k_b.astype(jnp.float32),
            -1, keepdims=True,
        )  # (Hl, 1)
        raw = raw * (1.0 - pm) + s_new * pm
        scores = raw * scale + bias_ref[b : b + 1]
        mx = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - mx)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        p_pos = jnp.sum(
            probs.astype(jnp.float32) * pm, -1, keepdims=True
        ).astype(x.dtype)  # (Hl, 1)
        probs = probs * (1.0 - pm).astype(x.dtype)
        attn_b = jax.lax.dot_general(
            probs, vwin[b].astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + p_pos * v_new[b : b + 1].astype(x.dtype)
        a_buf[b : b + 1, :] = attn_b.reshape(1, nq)

    pltpu.make_async_copy(o_w8_ref.at[l], o_buf, sems.at[2]).wait()
    o = jax.lax.dot_general(
        a_buf[...], o_buf[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    part_ref[...] = o * o_s_ref[0]  # fp32 partial; caller psums then casts


def attn_decode_tp(
    x: jnp.ndarray,  # (B, K) raw hidden
    packed: Dict[str, jnp.ndarray],  # repack_for_tp() LOCAL tree
    k_cache: jnp.ndarray,  # (L, B, S, D)
    v_cache: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    bias: jnp.ndarray,  # (B, W) f32 additive validity mask
    posmask: jnp.ndarray,  # (B, W) f32: 1.0 at each row's write slot
    cos: jnp.ndarray,  # (B, D)
    sin: jnp.ndarray,
    window: int,
    head_dim: int,
    eps: float,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder layer's attention half on one TP shard.

    Returns (o-proj partial (B, K) f32, k_new (B, D), v_new (B, D))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k = x.shape
    q_w8 = packed["q_w8"]
    L, _, nql = q_w8.shape
    hl = nql // head_dim
    S = k_cache.shape[2]
    window = min(window, S)
    assert bias.shape == (b, window), (bias.shape, (b, window))
    cdtype = k_cache.dtype
    cos2 = cos.astype(x.dtype).reshape(b, head_dim)
    sin2 = sin.astype(x.dtype).reshape(b, head_dim)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, k), lambda g, idx: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda g, idx: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda g, idx: (0, 0)),
            pl.BlockSpec((b * hl, head_dim), lambda g, idx: (0, 0)),
            pl.BlockSpec((b * hl, head_dim), lambda g, idx: (0, 0)),
            pl.BlockSpec((b, window), lambda g, idx: (0, 0)),
            pl.BlockSpec((b, window), lambda g, idx: (0, 0)),
            pl.BlockSpec((1, 1, k), lambda g, idx: (idx[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, nql), lambda g, idx: (idx[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, 2 * head_dim), lambda g, idx: (idx[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, k), lambda g, idx: (idx[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda g, idx: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda g, idx: (0, 0)),
            pl.BlockSpec((b, head_dim), lambda g, idx: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, nql), jnp.int8),
            pltpu.VMEM((k, 2 * head_dim), jnp.int8),
            pltpu.VMEM((nql, k), jnp.int8),
            pltpu.VMEM((b, window, head_dim), cdtype),
            pltpu.VMEM((b, window, head_dim), cdtype),
            pltpu.VMEM((b, nql), x.dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    part, k_new, v_new = pl.pallas_call(
        functools.partial(
            _attn_kernel, window=window, n_heads=hl, head_dim=head_dim,
            eps=eps, scale=head_dim**-0.5, batch=b,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, head_dim), cdtype),
            jax.ShapeDtypeStruct((b, head_dim), cdtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        x,
        cos2,
        sin2,
        jnp.repeat(cos2, hl, axis=0),
        jnp.repeat(sin2, hl, axis=0),
        bias,
        posmask,
        packed["input_norm"],
        q_w8,
        packed["q_s"],
        packed["kv_w8"],
        packed["kv_s"],
        packed["o_w8"],
        packed["o_s"],
        k_cache,
        v_cache,
    )
    return part, k_new, v_new


# ---------------------------------------------------------------------------
# Host-side repack: int8 serving tree -> TP-shardable packed tree + specs
# ---------------------------------------------------------------------------
def repack_for_tp(lm: Dict[str, Any], cfg, mesh: Mesh):
    """Split the fused qkv/gateup tensors at head / gate-up boundaries
    (the plain column sharding of the fused matrices would cut across
    them), shard Megatron-style, and chunk-major-repack each shard's MLP
    and head locally.

    Returns (packed_tree, specs_tree) — global arrays with NamedShardings
    plus the matching PartitionSpec tree for the decode step's shard_map."""
    m = int(mesh.shape["model"])
    layers = lm["layers"]
    qkv, o = layers["attn"]["qkv"], layers["attn"]["o"]
    hd_all = cfg.num_attention_heads * cfg.head_dim
    d = cfg.head_dim
    L, K = layers["input_norm"].shape
    dn = layers["mlp"]["down"]
    gu = layers["mlp"]["gateup"]
    inter = dn["w8"].shape[1]
    il = inter // m
    bs = decode_mlp.pick_block(il)
    nc = il // bs

    def global_pack(qkv_w8, qkv_s, o_w8, o_s, gu_w8, gu_s, dn_w8, dn_s,
                    in_n, post_n):
        return {
            "q_w8": qkv_w8[:, :, :hd_all],
            "q_s": qkv_s[:, :hd_all].reshape(L, 1, hd_all).astype(jnp.float32),
            "kv_w8": qkv_w8[:, :, hd_all:],
            "kv_s": qkv_s[:, hd_all:].reshape(L, 1, 2 * d).astype(jnp.float32),
            "o_w8": o_w8,
            "o_s": o_s.reshape(L, 1, K).astype(jnp.float32),
            "gate_w8": gu_w8[:, :, :inter],
            "up_w8": gu_w8[:, :, inter:],
            "gs": gu_s[:, :inter],
            "us": gu_s[:, inter:],
            "down_w8": dn_w8,
            "ds": dn_s.reshape(L, 1, K).astype(jnp.float32),
            "input_norm": in_n.reshape(L, 1, K),
            "post_norm": post_n.reshape(L, 1, K),
        }

    g = jax.jit(global_pack)(
        qkv["w8"], qkv["s"], o["w8"], o["s"], gu["w8"], gu["s"],
        dn["w8"], dn["s"], layers["input_norm"], layers["post_norm"],
    )

    specs = {
        "q_w8": P(None, None, "model"),
        "q_s": P(None, None, "model"),
        "kv_w8": P(None, None, None),
        "kv_s": P(None, None, None),
        "o_w8": P(None, "model", None),
        "o_s": P(None, None, None),
        "input_norm": P(None, None, None),
        "post_norm": P(None, None, None),
        # local chunk-major MLP (built below): chunk axis on "model"
        "mlp": {
            "gate_blk": P(None, "model", None, None),
            "up_blk": P(None, "model", None, None),
            "down_w8": P(None, "model", None),
            "gs": P(None, "model", None),
            "us": P(None, "model", None),
            "ds": P(None, None, None),
        },
        "head": {
            "w8_blk": P("model", None, None),
            "s_blk": P("model", None, None),
            "w8": P(None, "model"),
            "s": P("model"),
        },
        "final_norm": P(None),
        "embed": P("model", None),
    }

    def local_mlp_repack(gate_w8, up_w8, dn_w8, gs, us, ds):
        def blk(w):  # (L, K, Il) -> (L, nc, K, bs) contiguous chunks
            return w.reshape(L, K, nc, bs).transpose(0, 2, 1, 3)

        return {
            "gate_blk": blk(gate_w8),
            "up_blk": blk(up_w8),
            "down_w8": dn_w8,
            "gs": gs.reshape(L, nc, bs).astype(jnp.float32),
            "us": us.reshape(L, nc, bs).astype(jnp.float32),
            "ds": ds,
        }

    mlp_in_specs = (
        P(None, None, "model"), P(None, None, "model"),
        P(None, "model", None), P(None, "model"), P(None, "model"),
        P(None, None, None),
    )
    mlp = jax.jit(
        jax.shard_map(
            local_mlp_repack, mesh=mesh, in_specs=mlp_in_specs,
            out_specs=specs["mlp"], check_vma=False,
        )
    )(g["gate_w8"], g["up_w8"], g["down_w8"], g["gs"], g["us"], g["ds"])

    head = None
    if isinstance(lm.get("head_q"), dict) and "w8" in lm["head_q"]:
        head = jax.jit(
            jax.shard_map(
                decode_head.repack_head, mesh=mesh,
                in_specs=({"w8": P(None, "model"), "s": P("model")},),
                out_specs=specs["head"], check_vma=False,
            )
        )(
            {"w8": lm["head_q"]["w8"], "s": lm["head_q"]["s"]}
        )
    else:
        del specs["head"]

    packed = {
        kname: g[kname]
        for kname in (
            "q_w8", "q_s", "kv_w8", "kv_s", "o_w8", "o_s",
            "input_norm", "post_norm",
        )
    }
    packed["mlp"] = mlp
    if head is not None:
        packed["head"] = head
    packed["final_norm"] = lm["final_norm"]
    packed["embed"] = lm["embed"]

    from jax.sharding import NamedSharding

    packed = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), packed, specs
    )
    return packed, specs


# ---------------------------------------------------------------------------
# The full TP decode step (one shard_map region)
# ---------------------------------------------------------------------------
def decode_step_greedy_tp(
    packed: Dict[str, Any],  # repack_for_tp() tree (with "head")
    specs: Dict[str, Any],
    cfg,  # GemmaConfig (text config)
    token: jnp.ndarray,  # (B,) int32
    kv_cache: Dict[str, jnp.ndarray],  # k/v (L, B, S, nkv, d)
    cache_pos: jnp.ndarray,  # scalar or (B,) int32 write position(s)
    kv_valid: jnp.ndarray,  # (B, max_seq) bool incl. this token's slot
    position_ids: jnp.ndarray,  # (B,) int32
    kv_bucket: Optional[int],
    mesh: Mesh,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Greedy single-token decode, fused kernels per shard, collectives in
    the glue. Returns (next_token (B,), new cache). Token selection is the
    fused head+argmax kernel per vocab shard + a cross-shard (max, id)
    combine with jnp.argmax tie-breaking (first maximal index globally)."""
    b = token.shape[0]
    L = kv_cache["k"].shape[0]
    S = kv_cache["k"].shape[2]
    d = cfg.head_dim
    window = min(kv_bucket or S, S)
    vshard = cfg.vocab_size // int(mesh.shape["model"])

    k_flat = kv_cache["k"].reshape(L, b, S, d)
    v_flat = kv_cache["v"].reshape(L, b, S, d)
    pos_vec = jnp.broadcast_to(
        jnp.asarray(cache_pos, jnp.int32).reshape(-1), (b,)
    )
    valid_w = kv_valid[:, :window]
    bias = jnp.where(valid_w, 0.0, -jnp.inf).astype(jnp.float32)
    posmask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, window), 1)
        == pos_vec[:, None]
    ).astype(jnp.float32)
    dtype = packed["input_norm"].dtype
    cos, sin = rope_cos_sin(
        position_ids[:, None], d, cfg.rope_theta, dtype
    )
    cos = cos[:, 0]
    sin = sin[:, 0]
    eps = cfg.rms_norm_eps
    normalizer = cfg.hidden_size**0.5

    def local_fn(emb, k_flat, v_flat, pos_vec, bias, posmask, cos, sin, pk):
        x = (emb * jnp.asarray(normalizer, emb.dtype)).astype(emb.dtype)

        def layer_body(l, carry):
            x, kc, vc = carry
            li = jnp.asarray(l, jnp.int32)
            part, k_new, v_new = attn_decode_tp(
                x, pk, kc, vc, li, bias, posmask, cos, sin,
                window, d, eps, interpret=interpret,
            )
            part = jax.lax.psum(part, "model")
            x = x + part.astype(x.dtype)
            # cache write: one row per batch element at its own position
            zero = jnp.zeros((), jnp.int32)
            for r in range(b_local):
                idx = (li, jnp.asarray(r, jnp.int32), pos_vec[r], zero)
                kc = jax.lax.dynamic_update_slice(
                    kc, k_new[None, r : r + 1, None].astype(kc.dtype), idx
                )
                vc = jax.lax.dynamic_update_slice(
                    vc, v_new[None, r : r + 1, None].astype(vc.dtype), idx
                )
            y2 = rms_norm(x, pk["post_norm"][li, 0], eps)
            pm = decode_mlp.mlp_decode_fused(
                y2, pk["mlp"], li, interpret=interpret,
                out_dtype=jnp.float32,
            )
            pm = jax.lax.psum(pm, "model")
            x = x + pm.astype(x.dtype)
            return x, kc, vc

        x, k_flat, v_flat = jax.lax.fori_loop(
            0, L, layer_body, (x, k_flat, v_flat)
        )
        y = rms_norm(x, pk["final_norm"], eps)
        tok_l, m_l = decode_head.head_argmax_fused(
            y, pk["head"], interpret=interpret, return_max=True,
        )
        cand = tok_l + jax.lax.axis_index("model") * vshard
        ms = jax.lax.all_gather(m_l, "model")  # (m, B)
        cs = jax.lax.all_gather(cand, "model")
        win = jnp.argmax(ms, axis=0)  # first max -> lowest vocab shard
        tok = jnp.take_along_axis(cs, win[None], axis=0)[0]
        return tok, k_flat, v_flat

    b_local = b // int(mesh.shape.get("data", 1))

    # embed lookup outside the shard_map: XLA turns the vocab-sharded
    # gather into its own collective
    emb = jnp.take(packed["embed"], token, axis=0).astype(dtype)

    bspec = P("data", *([None]))
    tok, k_flat, v_flat = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(
            P("data", None),
            P(None, "data", None, None),
            P(None, "data", None, None),
            P("data"),
            bspec,
            bspec,
            bspec,
            bspec,
            {kk: vv for kk, vv in specs.items() if kk != "embed"},
        ),
        out_specs=(
            P("data"),
            P(None, "data", None, None),
            P(None, "data", None, None),
        ),
        check_vma=False,
    )(
        emb, k_flat, v_flat, pos_vec, bias, posmask, cos, sin,
        {kk: vv for kk, vv in packed.items() if kk != "embed"},
    )
    new_cache = {
        "k": k_flat.reshape(kv_cache["k"].shape),
        "v": v_flat.reshape(kv_cache["v"].shape),
    }
    return tok, new_cache
