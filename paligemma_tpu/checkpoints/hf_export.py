"""Export a params pytree back to an HF-format checkpoint directory.

The reference's only way to publish a fine-tuned model is a live push to the
HF hub (ref: Paligemma_FT.ipynb cell 45, PushToHubCallback). This writes the
same artifact locally — ``model.safetensors`` (classic PaliGemma key layout:
``vision_tower.vision_model...``, ``language_model.model...``) plus
``config.json`` — so the result loads in HF transformers or back into this
framework (checkpoints.hf_loader). Works offline; pushing the directory to
the hub afterwards is one ``huggingface_hub`` call when network exists.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import jax
import numpy as np

from ..core.config import PaliGemmaConfig


def _np32(x) -> np.ndarray:
    return np.asarray(jax.device_get(x)).astype(np.float32)


def state_dict_from_params(
    cfg: PaliGemmaConfig, params: Dict[str, Any]
) -> Dict[str, np.ndarray]:
    """Inverse of hf_loader.params_from_state_dict (classic key layout)."""
    sd: Dict[str, np.ndarray] = {}
    vcfg, tcfg = cfg.vision_config, cfg.text_config

    # ---- vision ----
    v = params["vision"]
    p, c, d = vcfg.patch_size, vcfg.num_channels, vcfg.hidden_size
    sd["vision_tower.vision_model.embeddings.patch_embedding.weight"] = (
        _np32(v["patch_embed"]["kernel"]).reshape(p, p, c, d).transpose(3, 2, 0, 1)
    )
    sd["vision_tower.vision_model.embeddings.patch_embedding.bias"] = _np32(
        v["patch_embed"]["bias"]
    )
    sd["vision_tower.vision_model.embeddings.position_embedding.weight"] = _np32(
        v["pos_embed"]
    )
    for i in range(vcfg.num_hidden_layers):
        lp = jax.tree.map(lambda x: x[i], v["layers"])
        pre = f"vision_tower.vision_model.encoder.layers.{i}"
        sd[f"{pre}.layer_norm1.weight"] = _np32(lp["ln1"]["scale"])
        sd[f"{pre}.layer_norm1.bias"] = _np32(lp["ln1"]["bias"])
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                             ("o", "out_proj")):
            sd[f"{pre}.self_attn.{theirs}.weight"] = _np32(
                lp["attn"][ours]["kernel"]).T
            sd[f"{pre}.self_attn.{theirs}.bias"] = _np32(lp["attn"][ours]["bias"])
        sd[f"{pre}.layer_norm2.weight"] = _np32(lp["ln2"]["scale"])
        sd[f"{pre}.layer_norm2.bias"] = _np32(lp["ln2"]["bias"])
        for fc in ("fc1", "fc2"):
            sd[f"{pre}.mlp.{fc}.weight"] = _np32(lp["mlp"][fc]["kernel"]).T
            sd[f"{pre}.mlp.{fc}.bias"] = _np32(lp["mlp"][fc]["bias"])
    sd["vision_tower.vision_model.post_layernorm.weight"] = _np32(
        v["post_ln"]["scale"]
    )
    sd["vision_tower.vision_model.post_layernorm.bias"] = _np32(v["post_ln"]["bias"])

    # ---- projector ----
    sd["multi_modal_projector.linear.weight"] = _np32(
        params["projector"]["kernel"]).T
    if "bias" in params["projector"]:
        sd["multi_modal_projector.linear.bias"] = _np32(params["projector"]["bias"])

    # ---- language model ----
    lm = params["lm"]
    sd["language_model.model.embed_tokens.weight"] = _np32(lm["embed"])
    for i in range(tcfg.num_hidden_layers):
        lp = jax.tree.map(lambda x: x[i], lm["layers"])
        pre = f"language_model.model.layers.{i}"
        sd[f"{pre}.input_layernorm.weight"] = _np32(lp["input_norm"])
        sd[f"{pre}.post_attention_layernorm.weight"] = _np32(lp["post_norm"])
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                             ("o", "o_proj")):
            sd[f"{pre}.self_attn.{theirs}.weight"] = _np32(lp["attn"][ours]).T
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
            sd[f"{pre}.mlp.{theirs}.weight"] = _np32(lp["mlp"][ours]).T
    sd["language_model.model.norm.weight"] = _np32(lm["final_norm"])
    return sd


def export_hf_checkpoint(
    cfg: PaliGemmaConfig, params: Dict[str, Any], out_dir: str
) -> None:
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = state_dict_from_params(cfg, params)
    # safetensors serializes the raw buffer: transposed views MUST be made
    # contiguous or they are written in their original memory order
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, os.path.join(out_dir, "model.safetensors"))

    vd = dataclasses.asdict(cfg.vision_config)
    td = dataclasses.asdict(cfg.text_config)
    config = {
        "model_type": "paligemma",
        "projection_dim": cfg.projection_dim,
        "ignore_index": cfg.ignore_index,
        "image_token_index": cfg.image_token_index,
        "pad_token_id": cfg.pad_token_id,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "vision_config": vd,
        "text_config": td,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
