"""PaliGemma multimodal composition — functional JAX, TPU-first.

Capabilities mirror the reference top model (ref: modeling_paligemma.py):
SigLIP tower -> bias-free linear projector -> merge projected image features
(scaled by projection_dim**-0.5, ref: modeling_paligemma.py:116-117) into the
token-embedding sequence at <image>-token slots -> Gemma decoder.

Design differences (intentional, TPU-native):

* The vision tower runs exactly ONCE, at prefill. The reference re-runs the
  full 27-layer tower + projector on every decode step even though the
  result is discarded (ref: modeling_paligemma.py:281-282 with q_len==1) —
  here prefill and decode are separate jitted functions and decode never
  touches pixels.
* Merging uses a per-row gather instead of torch.masked_scatter
  (ref: modeling_paligemma.py:121): identical placement semantics for
  aligned batches (each row receives its own image's features in order).
* Works for any batch size; the reference asserts B == 1
  (ref: processing_paligemma.py:174, inference.py:69).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import PaliGemmaConfig
from . import gemma, siglip

Params = Dict[str, Any]


def init_params(key: jax.Array, cfg: PaliGemmaConfig, dtype=jnp.float32) -> Params:
    kv, kt, kp = jax.random.split(key, 3)
    return {
        "vision": siglip.init_params(kv, cfg.vision_config, dtype),
        "projector": {
            "kernel": jax.random.normal(
                kp, (cfg.vision_config.hidden_size, cfg.projection_dim), dtype
            )
            * cfg.vision_config.hidden_size**-0.5
        },
        "lm": gemma.init_params(kt, cfg.text_config, dtype),
    }


def project_image_features(params: Params, image_features: jnp.ndarray) -> jnp.ndarray:
    """Linear projection to text-embedding space (ref: modeling_paligemma.py:52-65).

    The reference builds this bias-free; the HF checkpoint ships a bias
    (which the reference silently drops via strict=False). We apply the bias
    when present, matching HF."""
    out = image_features @ params["projector"]["kernel"]
    if "bias" in params["projector"]:
        out = out + params["projector"]["bias"]
    return out


def merge_embeddings(
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,  # (B, S) int32
    text_embeds: jnp.ndarray,  # (B, S, H) — embedding lookup of input_ids
    image_embeds: jnp.ndarray,  # (B, N_img, H) — projected image features
) -> jnp.ndarray:
    """Build the merged sequence (ref: modeling_paligemma.py:99-128).

    text slots keep their embedding; <image> slots receive the n-th image
    feature scaled by projection_dim**-0.5; pad slots are zeroed.
    """
    is_pad = input_ids == cfg.pad_token_id
    is_image = input_ids == cfg.image_token_index

    scale = cfg.projection_dim**-0.5
    scaled_img = (image_embeds * scale).astype(text_embeds.dtype)

    # n-th image token in each row <- n-th image feature of that row
    # (masked_scatter semantics for aligned batches).
    img_slot = jnp.cumsum(is_image.astype(jnp.int32), axis=-1) - 1  # (B, S)
    img_slot = jnp.clip(img_slot, 0, scaled_img.shape[1] - 1)
    gathered = jnp.take_along_axis(scaled_img, img_slot[:, :, None], axis=1)

    merged = jnp.where(is_image[:, :, None], gathered, text_embeds)
    merged = jnp.where(is_pad[:, :, None], jnp.zeros_like(merged), merged)
    return merged


def prefill_position_ids(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Positions = cumsum over the validity mask, pads forced to 1
    (1-indexed; ref: modeling_paligemma.py:193-195)."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1)
    return jnp.where(attention_mask == 0, 1, pos)


def _vision_attn_mode(cfg: PaliGemmaConfig, mesh, use_flash: bool) -> str:
    """Pick the VISION tower attention path ("xla" | "flash" | "fused").

    At SigLIP-So400m's head_dim=72 the XLA materialized attention WINS on
    this chip — measured twice: the generic flash kernel pads head_dim to
    the 128-lane tile and is 29% slower at the 448px tower
    (.bench/vision_probe.py), and the dedicated fused tower kernel
    (kernels/ablation/vision_attention.py) recovers at most 9% of
    attention-only time at S=1024 while losing 5x at S=256 and crashing
    this Mosaic build at head_block >= 8 (.bench/vision_attn_probe.py;
    numbers in the kernel docstring). XLA attention at these small-matmul
    shapes is already near roofline, so "xla" is the single-chip answer
    whenever head_dim doesn't fill the lane tile. Under a mesh the sharded
    flash path is kept: its head-partitioned shard_map collectives are
    built around that kernel. ``siglip.encode(use_flash=True)`` called
    directly still honors the explicit request (tests exercise the generic
    kernel there); ``attn="fused"`` runs the ablation kernel.
    """
    if not use_flash:
        return "xla"
    if mesh is not None:
        return "flash"
    if cfg.vision_config.head_dim % 128 == 0:
        return "flash"  # no pad waste; generic kernel is fine
    if cfg.vision_config.num_patches >= 2048:
        # long patch sequences flip the tradeoff: the materialized
        # (H, S, S) scores dominate and flash wins despite the d-pad —
        # measured at 896px/S=4096: 1190 vs 7728 us/layer attention-only,
        # full tower 57.3 vs 100.0 ms (.bench/vision_attn_probe.py)
        return "flash"
    return "xla"


def prefill(
    params: Params,
    cfg: PaliGemmaConfig,
    pixel_values: jnp.ndarray,  # (B, C, H, W)
    input_ids: jnp.ndarray,  # (B, S)
    attention_mask: jnp.ndarray,  # (B, S) 1=real token
    kv_cache: gemma.KVCache,
    use_flash: bool = False,
    last_only: bool = False,
    mesh=None,
    prefix_lens: Optional[jnp.ndarray] = None,  # (B,) int32
    lora: Optional[Params] = None,  # adapter tree or multi-adapter bank
    adapter_ids: Optional[jnp.ndarray] = None,  # (B,) rows into the bank
    int8_act: bool = False,  # W8A8 LM projections (int8 weights only)
) -> Tuple[jnp.ndarray, gemma.KVCache]:
    """Vision encode + merge + decoder prefill. Returns (logits, cache).

    ``last_only=True`` projects logits only at each row's last valid token
    (shape (B, 1, vocab)) — what generation needs.

    ``prefix_lens``: bidirectional-prefix length per row. Default (None) =
    the whole prompt, PaliGemma's prefix-LM convention (the reference
    materializes all-zero masks, ref: modeling_paligemma.py:149-169).
    A recompute prefill (a preempted serving request re-entering with
    ``prompt + tokens generated so far``, runtime/serving_paged.py) MUST
    pass the ORIGINAL prompt length here: the regenerated suffix was
    produced causally, so re-encoding it bidirectionally would change the
    logits the request resumes from."""
    dtype = params["lm"]["embed"].dtype
    image_features = siglip.encode(
        params["vision"], cfg.vision_config, pixel_values.astype(dtype),
        mesh=mesh, attn=_vision_attn_mode(cfg, mesh, use_flash),
    )
    image_embeds = project_image_features(params, image_features)

    text_embeds = params["lm"]["embed"][input_ids]
    merged = merge_embeddings(cfg, input_ids, text_embeds, image_embeds)

    position_ids = prefill_position_ids(attention_mask)
    max_seq = kv_cache["k"].shape[2]
    b, s = input_ids.shape
    n_valid = jnp.sum(attention_mask, axis=-1).astype(jnp.int32)
    if use_flash:
        kv_valid = jnp.zeros((b, max_seq), bool)
        kv_valid = jax.lax.dynamic_update_slice(
            kv_valid, attention_mask.astype(bool),
            (jnp.zeros((), jnp.int32),) * 2,
        )
        pfx = n_valid if prefix_lens is None else prefix_lens.astype(jnp.int32)
        flash_lens = (pfx, n_valid)
    else:
        flash_lens = None
        if prefix_lens is None:
            # whole prompt bidirectional: row-validity bitmap broadcast over
            # queries inside gemma.forward (cheapest form)
            kv_valid = jnp.zeros((b, max_seq), bool)
            kv_valid = jax.lax.dynamic_update_slice(
                kv_valid, attention_mask.astype(bool),
                (jnp.zeros((), jnp.int32),) * 2,
            )
        else:
            # pairwise prefix-LM mask: query i sees key j iff j is a real
            # token AND (j < prefix  OR  j <= i) — prompt rows are written
            # densely at cache [0, s), so key cache index == prompt index
            i = jnp.arange(s)[None, :, None]
            j = jnp.arange(max_seq)[None, None, :]
            kv_valid = (
                (j < n_valid[:, None, None])
                & ((j < prefix_lens[:, None, None].astype(jnp.int32))
                   | (j <= i))
            )
    logits_idx = None
    if last_only:
        logits_idx = jnp.clip(
            jnp.sum(attention_mask, axis=-1).astype(jnp.int32) - 1, 0
        )
    logits, kv_cache = gemma.forward(
        params["lm"],
        cfg.text_config,
        merged,
        position_ids,
        kv_cache,
        cache_pos=jnp.zeros((), jnp.int32),
        kv_valid=kv_valid,
        flash_lens=flash_lens,
        logits_idx=logits_idx,
        mesh=mesh,
        lora=lora_with_ids(
            lora, adapter_ids, cfg.text_config.num_hidden_layers
        ),
        int8_act=int8_act,
    )
    return logits, kv_cache


def lora_with_ids(
    lora: Optional[Params], adapter_ids: Optional[jnp.ndarray],
    n_layers: int,
) -> Optional[Params]:
    """Attach per-row adapter ids to a multi-LoRA bank for the decoder scan.

    A bank (train/lora.py stack_lora_bank) has per-layer (N, ...) adapter
    stacks; ``adapter_ids`` (B,) picks each batch row's adapter (0 = the
    zero/base row). The ids ride the scan xs broadcast to (L, B) so every
    layer's slice carries them (gemma._lora_delta). With ``adapter_ids``
    None the tree passes through untouched — the plain single-adapter
    layout gemma.forward_train uses."""
    if lora is None or adapter_ids is None:
        return lora
    out = dict(lora)  # preserves extras, e.g. "__fused_pack__"
    layers = dict(lora["layers"])
    layers["__ids__"] = jnp.broadcast_to(
        adapter_ids[None, :], (n_layers, adapter_ids.shape[0])
    )
    out["layers"] = layers
    return out


def train_attention_mask(
    attention_mask: jnp.ndarray,  # (B, S) 1=real token
    token_type_ids: jnp.ndarray,  # (B, S) 0=prefix (image+prompt), 1=suffix
) -> jnp.ndarray:
    """PaliGemma training mask: bidirectional over the prefix, causal over
    the suffix (the convention the reference trains under via HF,
    ref: Paligemma_FT.ipynb cell 27's token_type_ids). Returns (B,S,S) bool."""
    valid_k = attention_mask.astype(bool)[:, None, :]  # (B, 1, S)
    is_prefix_k = (token_type_ids == 0)[:, None, :]  # (B, 1, S)
    s = attention_mask.shape[1]
    causal = (
        jnp.arange(s)[None, :, None] >= jnp.arange(s)[None, None, :]
    )  # (1, S, S): q >= k
    return valid_k & (is_prefix_k | causal)


def forward_train(
    params: Params,
    cfg: PaliGemmaConfig,
    pixel_values: jnp.ndarray,  # (B, C, H, W)
    input_ids: jnp.ndarray,  # (B, S)
    attention_mask: jnp.ndarray,  # (B, S)
    token_type_ids: jnp.ndarray,  # (B, S) 0=prefix, 1=suffix
    lora: Optional[Dict[str, Any]] = None,
    remat: bool = True,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Supervised forward (no KV cache): returns fp32 logits (B, S, vocab).

    The flash path assumes the prefix (image + prompt tokens) is contiguous
    at the start of each row — true for processor-built batches.
    """
    dtype = params["lm"]["embed"].dtype
    image_features = siglip.encode(
        params["vision"], cfg.vision_config, pixel_values.astype(dtype),
        attn="xla" if not use_flash else (
            # training differentiates through the tower: the fused kernel
            # has no custom VJP, so the flash path (which does) is used
            # when its padding is free, XLA otherwise
            "flash" if cfg.vision_config.head_dim % 128 == 0 else "xla"
        ),
    )
    image_embeds = project_image_features(params, image_features)
    text_embeds = params["lm"]["embed"][input_ids]
    merged = merge_embeddings(cfg, input_ids, text_embeds, image_embeds)
    position_ids = prefill_position_ids(attention_mask)
    if use_flash:
        prefix_lens = jnp.sum(
            (token_type_ids == 0) & (attention_mask == 1), axis=-1
        ).astype(jnp.int32)
        kv_lens = jnp.sum(attention_mask, axis=-1).astype(jnp.int32)
        return gemma.forward_train(
            params["lm"], cfg.text_config, merged, position_ids, None,
            lora=lora, remat=remat, flash_lens=(prefix_lens, kv_lens),
        )
    pairwise = train_attention_mask(attention_mask, token_type_ids)
    return gemma.forward_train(
        params["lm"], cfg.text_config, merged, position_ids, pairwise,
        lora=lora, remat=remat,
    )


def decode_step(
    params: Params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,  # (B,) int32 — last sampled token
    kv_cache: gemma.KVCache,
    cache_pos: jnp.ndarray,  # scalar int32: index this token is written at
    kv_valid: jnp.ndarray,  # (B, max_seq) bool incl. this token's slot
    position_ids: jnp.ndarray,  # (B,) int32 RoPE position of this token
    kv_bucket: Optional[int] = None,  # static attend-window (<= max_seq)
    scan_block: int = 1,  # decoder layers per scan body (gemma.forward)
    fused_mlp: bool = False,  # fused int8 decode-MLP kernel (gemma.forward)
    fused_layer: bool = False,  # whole-layer decode kernel (gemma.forward)
    lora: Optional[Params] = None,  # adapter tree or multi-adapter bank
    adapter_ids: Optional[jnp.ndarray] = None,  # (B,) rows into the bank
) -> Tuple[jnp.ndarray, gemma.KVCache]:
    """Single-token decode. Returns ((B, vocab) logits, new cache).

    ``kv_bucket``: static bound on the attended cache prefix — must satisfy
    bucket > every row's write position. Identical numerics, bounded HBM
    reads (see gemma._decoder_block)."""
    embeds = params["lm"]["embed"][token][:, None, :]  # (B, 1, H)
    logits, kv_cache = gemma.forward(
        params["lm"],
        cfg.text_config,
        embeds,
        position_ids[:, None],
        kv_cache,
        cache_pos=cache_pos,
        kv_valid=kv_valid,
        kv_bucket=kv_bucket,
        scan_block=scan_block,
        fused_mlp=fused_mlp,
        fused_layer=fused_layer,
        lora=lora_with_ids(
            lora, adapter_ids, cfg.text_config.num_hidden_layers
        ),
    )
    return logits[:, 0, :], kv_cache


def decode_step_greedy(
    params: Params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,  # (B,) int32
    kv_cache: gemma.KVCache,
    cache_pos: jnp.ndarray,
    kv_valid: jnp.ndarray,
    position_ids: jnp.ndarray,
    kv_bucket: Optional[int] = None,
    fused_layer: bool = True,
    lora: Optional[Params] = None,  # multi-adapter bank (+"__fused_pack__")
    adapter_ids: Optional[jnp.ndarray] = None,  # (B,) rows into the bank
) -> Tuple[jnp.ndarray, gemma.KVCache]:
    """Greedy single-token decode: returns (next_token (B,), new cache).

    With the fused decode kernels active this never materializes the
    (B, 257k) logits row — the int8 head streams through a running-argmax
    Pallas kernel (kernels/decode_head.py). Falls back to XLA logits +
    argmax for shapes the kernels don't cover; tokens are identical either
    way (the kernel reproduces the XLA path's bf16 logit rounding).

    A multi-LoRA bank carrying the fused-kernel pack
    (kernels/decode_layer.repack_lora_bank_fused under "__fused_pack__")
    keeps the fused tick: each row's adapter applies inside the kernel."""
    embeds = params["lm"]["embed"][token][:, None, :]
    tok, kv_cache = gemma.forward(
        params["lm"],
        cfg.text_config,
        embeds,
        position_ids[:, None],
        kv_cache,
        cache_pos=cache_pos,
        kv_valid=kv_valid,
        kv_bucket=kv_bucket,
        fused_layer=fused_layer,
        greedy_head=True,
        lora=lora_with_ids(
            lora, adapter_ids, cfg.text_config.num_hidden_layers
        ),
    )
    return tok, kv_cache


def decode_verify(
    params: Params,
    cfg: PaliGemmaConfig,
    tokens: jnp.ndarray,  # (B, s) int32 — last accepted token + s-1 draft
    kv_cache: gemma.KVCache,
    cache_pos: jnp.ndarray,  # scalar OR (B,) int32: index tokens[:, 0] writes at
    kv_valid: jnp.ndarray,  # (B, max_seq) bool — valid slots BEFORE this block
    position_ids: jnp.ndarray,  # (B,) int32 RoPE position of tokens[:, 0]
    kv_bucket: Optional[int] = None,
) -> Tuple[jnp.ndarray, gemma.KVCache]:
    """Multi-token decode for speculative verification: run ``s`` tokens
    through the decoder in ONE forward (one weight stream — the whole point
    of speculation: decode is weight-bandwidth-bound, so verifying k drafts
    costs the same HBM traffic as decoding one token).

    Masking is causal WITHIN the block and full over the previously valid
    cache (decode continues the causal suffix of the prefix-LM layout —
    same pairwise kv_valid machinery the recompute prefills use,
    gemma.forward). KV for all ``s`` positions is written; the caller
    advances ``write_pos``/``kv_valid`` only over the ACCEPTED prefix, so
    rejected positions stay invalid and are overwritten by the next cycle
    (the next block starts at the first rejected slot).

    Returns ((B, s, vocab) fp32 logits, new cache): ``argmax(logits[:, i])``
    is the model's token AFTER ``tokens[:, i]`` — compare with
    ``tokens[:, i+1]`` to accept drafts. No reference analog (the reference
    decodes strictly one token per forward, ref: inference.py:51-87).
    """
    b, s = tokens.shape
    embeds = params["lm"]["embed"][tokens]  # (B, s, H)
    pos = position_ids[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    max_seq = kv_cache["k"].shape[2]
    idx = jnp.arange(max_seq, dtype=jnp.int32)[None, None, :]
    # scalar cache_pos: one shared block start (engine.generate_spec);
    # (B,): per-row block starts (continuous-batching spec windows)
    start = cache_pos if jnp.ndim(cache_pos) == 0 else cache_pos[:, None, None]
    off = idx - start  # slot's index within the new block
    in_block = (off >= 0) & (off <= jnp.arange(s, dtype=jnp.int32)[None, :, None])
    vis = kv_valid[:, None, :] | in_block  # (B, s, max_seq) pairwise
    logits, kv_cache = gemma.forward(
        params["lm"],
        cfg.text_config,
        embeds,
        pos,
        kv_cache,
        cache_pos=cache_pos,
        kv_valid=vis,
        kv_bucket=kv_bucket,
    )
    return logits, kv_cache


def decode_step_paged(
    params: Params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,  # (B,) int32 — last sampled token
    pool: gemma.KVCache,  # paged pool (L, n_pages, page_size, n_kv, d)
    page_table: jnp.ndarray,  # (B, P_max) int32
    write_pos: jnp.ndarray,  # (B,) int32 slot-local position of this token
    position_ids: jnp.ndarray,  # (B,) int32 RoPE position of this token
    pages_bucket=None,  # static bound on logical pages walked (host-managed)
    paged_kernel: str = "multi",  # kernel variant (gemma.forward_paged_decode)
    lora: Optional[Params] = None,  # adapter tree or multi-adapter bank
    adapter_ids: Optional[jnp.ndarray] = None,  # (B,) rows into the bank
) -> Tuple[jnp.ndarray, gemma.KVCache]:
    """Single-token decode over the paged KV pool (runtime.paged_cache).
    Returns ((B, vocab) logits, new pool). See gemma.forward_paged_decode.

    ``lora`` on the page-walk/XLA variants rides the XLA projections (the
    rank-r deltas compose there). On ``paged_kernel="fused"`` a bank
    carrying "__fused_pack__" (kernels/decode_layer
    repack_lora_bank_fused) applies IN-KERNEL via the concat-basis dots;
    a bank without the pack, or the "staged" hybrid, still rejects.

    ``paged_kernel="staged"`` takes the staging hybrid instead of the
    page-walk kernels: gather the window dense, run the fused dense layer
    kernel, scatter the fresh K/V back (gemma.forward_paged_decode_staged).
    The caller (PagedServingEngine) is responsible for having repacked
    ``params["lm"]["layers"]`` via kernels.decode_layer.repack_layers."""
    embeds = params["lm"]["embed"][token][:, None, :]  # (B, 1, H)
    lora_fused = lora is not None and "__fused_pack__" in lora
    if lora is not None and (
        paged_kernel == "staged"
        or (paged_kernel == "fused" and not lora_fused)
    ):
        raise ValueError(
            "LoRA adapters do not thread through the staged paged kernel "
            "(or a fused tick without the __fused_pack__ operands) — use "
            "a page-walk variant (multi/runs/batched/xla) or attach the "
            "fused pack"
        )
    if paged_kernel == "fused":
        # grid-over-layers fused kernel with in-kernel page-table window
        # reads — ONE pallas_call per tick instead of one per layer
        # (gemma.forward_paged_decode_fused); same repacked-layers
        # contract as "staged"
        logits, pool = gemma.forward_paged_decode_fused(
            params["lm"],
            cfg.text_config,
            embeds,
            position_ids[:, None],
            pool,
            page_table,
            write_pos,
            pages_bucket=pages_bucket or page_table.shape[1],
            lora_pack=lora["__fused_pack__"] if lora_fused else None,
            adapter_ids=adapter_ids if lora_fused else None,
        )
    elif paged_kernel == "staged":
        logits, pool = gemma.forward_paged_decode_staged(
            params["lm"],
            cfg.text_config,
            embeds,
            position_ids[:, None],
            pool,
            page_table,
            write_pos,
            pages_bucket=pages_bucket or page_table.shape[1],
        )
    else:
        # "xla": pure-XLA gather attention (no Pallas call) — the variant
        # a mesh can auto-partition (GSPMD); used by PagedServingEngine's
        # sharded fallback when the TP paged kernels don't apply
        logits, pool = gemma.forward_paged_decode(
            params["lm"],
            cfg.text_config,
            embeds,
            position_ids[:, None],
            pool,
            page_table,
            write_pos,
            pages_bucket=pages_bucket,
            use_kernel=False if paged_kernel == "xla" else None,
            paged_kernel="multi" if paged_kernel == "xla" else paged_kernel,
            lora=lora_with_ids(
                lora, adapter_ids, cfg.text_config.num_hidden_layers
            ),
        )
    return logits[:, 0, :], pool


def decode_step_greedy_paged(
    params: Params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,  # (B,) int32
    pool: gemma.KVCache,
    page_table: jnp.ndarray,  # (B, P_max) int32
    write_pos: jnp.ndarray,  # (B,) int32
    position_ids: jnp.ndarray,  # (B,) int32
    pages_bucket=None,
    lora: Optional[Params] = None,  # bank carrying "__fused_pack__"
    adapter_ids: Optional[jnp.ndarray] = None,  # (B,) rows into the bank
) -> Tuple[jnp.ndarray, gemma.KVCache]:
    """Greedy paged tick: returns (next_token (B,), new pool) WITHOUT
    materializing the (B, 257k) logits — the fused paged layer kernel
    feeds the int8 head's running-argmax kernel (kernels/decode_head),
    mirroring the dense engine's decode_step_greedy. Tokens are identical
    to ``argmax(decode_step_paged(...))`` (the head kernel reproduces the
    XLA path's bf16 logit rounding). Caller contract: repacked layers
    (kernels.decode_layer.repack_layers) — the "fused" tick geometry."""
    embeds = params["lm"]["embed"][token][:, None, :]
    lora_fused = lora is not None and "__fused_pack__" in lora
    if lora is not None and not lora_fused:
        raise ValueError(
            "greedy paged tick needs the fused bank pack (__fused_pack__)"
        )
    tok, pool = gemma.forward_paged_decode_fused(
        params["lm"],
        cfg.text_config,
        embeds,
        position_ids[:, None],
        pool,
        page_table,
        write_pos,
        pages_bucket=pages_bucket or page_table.shape[1],
        lora_pack=lora["__fused_pack__"] if lora_fused else None,
        adapter_ids=adapter_ids if lora_fused else None,
        greedy_head=True,
    )
    return tok, pool


def decode_verify_paged(
    params: Params,
    cfg: PaliGemmaConfig,
    tokens: jnp.ndarray,  # (B, s) int32 — last accepted token + s-1 drafts
    pool: gemma.KVCache,
    page_table: jnp.ndarray,  # (B, P_max) int32
    write_pos: jnp.ndarray,  # (B,) int32: position tokens[:, 0] writes at
    position_ids: jnp.ndarray,  # (B,) int32 RoPE position of tokens[:, 0]
    pages_bucket=None,
) -> Tuple[jnp.ndarray, gemma.KVCache]:
    """Speculative verify over the paged pool: one forward scores all s
    candidate tokens per row (gemma.forward_paged_verify — per-query
    causal bounds replace the dense path's kv_valid|in_block pairwise
    mask; paged rows are contiguous so no validity bitmap exists).
    Returns ((B, s, vocab) fp32 logits, new pool). Pages covering
    ``write_pos + s - 1`` must be pre-reserved by the scheduler."""
    embeds = params["lm"]["embed"][tokens].astype(
        params["lm"]["embed"].dtype
    )  # (B, s, H)
    s = tokens.shape[1]
    pos = position_ids[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    return gemma.forward_paged_verify(
        params["lm"], cfg.text_config, embeds, pos, pool, page_table,
        write_pos, pages_bucket=pages_bucket,
    )
