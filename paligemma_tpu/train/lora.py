"""LoRA adapters for the Gemma decoder.

Mirrors the reference Q-LoRA setup (ref: Paligemma_FT.ipynb cell 41):
rank r=8, alpha=8, targets q/k/v/o/gate/up/down projections of every decoder
layer. Adapters are a separate pytree (stacked over layers, matching the
scanned base params) threaded through the forward un-merged — two skinny
matmuls per target — so only the adapter tree receives gradients and
optimizer state.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GemmaConfig

DEFAULT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def _target_dims(cfg: GemmaConfig, name: str) -> Tuple[int, int]:
    h = cfg.hidden_size
    hq = cfg.num_attention_heads * cfg.head_dim
    hkv = cfg.num_key_value_heads * cfg.head_dim
    return {
        "q": (h, hq),
        "k": (h, hkv),
        "v": (h, hkv),
        "o": (hq, h),
        "gate": (h, cfg.intermediate_size),
        "up": (h, cfg.intermediate_size),
        "down": (cfg.intermediate_size, h),
    }[name]


def init_lora(
    key: jax.Array,
    cfg: GemmaConfig,
    rank: int = 8,
    alpha: float = 8.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """A: gaussian/sqrt(in), B: zeros (standard LoRA init — delta starts at 0)."""
    n_layers = cfg.num_hidden_layers
    layers = {}
    for t_idx, name in enumerate(targets):
        in_dim, out_dim = _target_dims(cfg, name)
        k = jax.random.fold_in(key, t_idx)
        layers[name] = {
            "a": jax.random.normal(k, (n_layers, in_dim, rank), dtype) * (in_dim**-0.5),
            "b": jnp.zeros((n_layers, rank, out_dim), dtype),
            "alpha": jnp.full((n_layers,), alpha, dtype),
        }
    return {"layers": layers}


def stack_lora_bank(
    adapters: Sequence[Dict[str, Any]], dtype=None
) -> Dict[str, Any]:
    """Stack adapters into a multi-LoRA serving bank.

    Returns ``{"layers": {name: {"a": (L, N+1, in, r), "b": (L, N+1, r,
    out), "alpha": (L, N+1)}}}`` — adapter axis SECOND so the per-layer
    scan in gemma.forward slices ``(N+1, ...)`` banks that per-row ids
    gather from (gemma._lora_delta). Index 0 is an all-zero adapter: rows
    serving the base model select it and get delta 0 with no branch, so
    one compiled tick serves every base/adapter mix. Adapters must share
    rank and targets (per-tensor shapes must match to stack); the serving
    engine maps user-facing adapter names to indices 1..N.
    """
    if not adapters:
        raise ValueError("stack_lora_bank needs at least one adapter")
    ref = adapters[0]["layers"]
    for i, ad in enumerate(adapters[1:], start=1):
        for name, p in ad["layers"].items():
            if name not in ref:
                raise ValueError(
                    f"adapter {i} has target '{name}' the first adapter "
                    "lacks; multi-LoRA serving needs identical targets"
                )
            if p["a"].shape != ref[name]["a"].shape:
                raise ValueError(
                    f"adapter {i} target '{name}' rank/shape "
                    f"{p['a'].shape} != {ref[name]['a'].shape}; multi-LoRA "
                    "serving needs one shared rank (pad or retrain)"
                )
        if set(ad["layers"]) != set(ref):
            raise ValueError(
                "adapters disagree on target sets; multi-LoRA serving "
                "needs identical targets"
            )
    zero = jax.tree.map(jnp.zeros_like, adapters[0])
    trees = [zero, *adapters]
    bank = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *trees)
    if dtype is not None:
        bank = jax.tree.map(lambda x: x.astype(dtype), bank)
    # Concat-basis layout: ALL adapters' A columns side by side
    # (L, in, (N+1)*r) and an alpha-folded stacked B (L, (N+1)*r, out).
    # A row's delta is then two REGULAR batched matmuls shared by every
    # row — z = y @ a_cat, mask z to the row's adapter block, @ b_cat —
    # instead of B per-row (in, r) gathers + tiny batched einsums, which
    # dominate the latency-bound decode tick (~15% measured,
    # docs/PERFORMANCE.md "multi-LoRA serving"). gemma._lora_delta picks
    # this path when present; the gathered layout stays for training.
    for name, p in bank["layers"].items():
        L, n1, in_dim, r = p["a"].shape
        out = p["b"].shape[-1]
        p["a_cat"] = (
            p["a"].transpose(0, 2, 1, 3).reshape(L, in_dim, n1 * r)
        )
        scale = (p["alpha"] / r)[:, :, None, None].astype(p["b"].dtype)
        p["b_cat"] = (p["b"] * scale).reshape(L, n1 * r, out)
    return bank


def num_trainable_params(lora: Dict[str, Any]) -> int:
    leaves = [x.size for name, p in lora["layers"].items() for x in (p["a"], p["b"])]
    return sum(leaves)


def merge_lora(
    base_lm_params: Dict[str, Any], lora: Dict[str, Any]
) -> Dict[str, Any]:
    """Fold adapters into the base weights (for export / fast inference).

    Fused quantized bases ("qkv"/"gateup" slabs from ``fuse=True``
    quantization) are supported: the slab dequantizes to bf16 and splits
    back into per-projection weights before the deltas fold in (the q/k/v
    split point comes from o_proj's input dim == q's output dim; k and v
    are equal halves of the rest, gate/up equal halves of "gateup"). The
    merged tree is always UNFUSED dense — re-fuse for serving with
    runtime.quantize.quantize_lm_for_serving.
    """
    from ..kernels.quant import dequantize, dequantize_4bit

    def dense(w):
        if isinstance(w, dict):  # quantized base: dequantize to merge
            return (
                dequantize_4bit(w, jnp.bfloat16) if "w4" in w
                else dequantize(w, jnp.bfloat16)
            )
        return w

    def in_dim(w):  # (L, K, N) weights; w4 packs two K rows per byte
        if isinstance(w, dict):
            return 2 * w["w4"].shape[-2] if "w4" in w else w["w8"].shape[-2]
        return w.shape[-2]

    merged = jax.tree.map(lambda x: x, base_lm_params)  # shallow copy tree
    layers = dict(merged["layers"])
    attn = dict(layers["attn"])
    mlp = dict(layers["mlp"])
    if "qkv" in attn:
        qkv = dense(attn.pop("qkv"))  # (L, H, dq + 2*dkv)
        dq = in_dim(attn["o"])
        dkv = (qkv.shape[-1] - dq) // 2
        attn["q"], attn["k"], attn["v"] = (
            qkv[..., :dq], qkv[..., dq:dq + dkv], qkv[..., dq + dkv:]
        )
    if "gateup" in mlp:
        gu = dense(mlp.pop("gateup"))  # (L, H, 2*I)
        half = gu.shape[-1] // 2
        mlp["gate"], mlp["up"] = gu[..., :half], gu[..., half:]

    def add_delta(base, delta):
        base = dense(base)
        return base + delta.astype(base.dtype)

    for name, p in lora["layers"].items():
        scale = (p["alpha"] / p["a"].shape[-1])[:, None, None]
        delta = jnp.einsum("lir,lro->lio", p["a"], p["b"]) * scale
        if name in ("q", "k", "v", "o"):
            attn[name] = add_delta(attn[name], delta)
        else:
            mlp[name] = add_delta(mlp[name], delta)
    layers["attn"] = attn
    layers["mlp"] = mlp
    merged["layers"] = layers
    return merged
