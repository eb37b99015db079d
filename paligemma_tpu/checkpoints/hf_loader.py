"""HF safetensors checkpoint -> paligemma_tpu parameter pytree.

TPU-native replacement for the reference loader (ref: utils.py:9-37), which
globs ``*.safetensors`` into a flat state dict and ``load_state_dict`` s it.
Here the flat dict is remapped onto the stacked-layer pytree:

* torch ``nn.Linear`` weights are (out, in); ours are (in, out) -> transpose.
* the patch-embedding conv kernel (D, C, p, p) becomes a (p*p*C, D) matmul
  kernel matching models/siglip.patchify's (ph, pw, c) flattening order.
* per-layer tensors are stacked along a leading layer axis for lax.scan.
* ``lm_head.weight`` is ignored: the head is tied to ``embed_tokens``
  (ref: modeling_gemma.py:492-499). The reference's accidental random
  lm_head bias (modeling_gemma.py:484 + strict=False load) is NOT
  reproduced — we match HF semantics (bias-free tied head).

Both HF key layouts are accepted: the classic checkpoint layout
(``language_model.model.layers...``) and transformers>=4.52's nested layout
(``model.language_model.layers...``).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.config import PaliGemmaConfig


def normalize_key(key: str) -> str:
    """Map either HF layout onto canonical ``language_model.layers...`` names."""
    if key.startswith("model."):
        key = key[len("model."):]
    key = key.replace("language_model.model.", "language_model.")
    return key


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def params_from_state_dict(
    cfg: PaliGemmaConfig, state_dict: Mapping[str, Any], dtype=jnp.float32
) -> Dict[str, Any]:
    """Build the model pytree from a flat HF state dict (torch or numpy)."""
    sd = {normalize_key(k): v for k, v in state_dict.items()}

    def get(key):
        return _np(sd[key])

    def linear_t(key):  # torch (out, in) -> (in, out)
        return get(key).T

    vcfg, tcfg = cfg.vision_config, cfg.text_config

    # ---- vision tower ----
    conv = get("vision_tower.vision_model.embeddings.patch_embedding.weight")
    d, c, p, _ = conv.shape
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(p * p * c, d)

    def vlayer(i):
        pre = f"vision_tower.vision_model.encoder.layers.{i}"
        return {
            "ln1": {"scale": get(f"{pre}.layer_norm1.weight"),
                    "bias": get(f"{pre}.layer_norm1.bias")},
            "attn": {
                "q": {"kernel": linear_t(f"{pre}.self_attn.q_proj.weight"),
                      "bias": get(f"{pre}.self_attn.q_proj.bias")},
                "k": {"kernel": linear_t(f"{pre}.self_attn.k_proj.weight"),
                      "bias": get(f"{pre}.self_attn.k_proj.bias")},
                "v": {"kernel": linear_t(f"{pre}.self_attn.v_proj.weight"),
                      "bias": get(f"{pre}.self_attn.v_proj.bias")},
                "o": {"kernel": linear_t(f"{pre}.self_attn.out_proj.weight"),
                      "bias": get(f"{pre}.self_attn.out_proj.bias")},
            },
            "ln2": {"scale": get(f"{pre}.layer_norm2.weight"),
                    "bias": get(f"{pre}.layer_norm2.bias")},
            "mlp": {
                "fc1": {"kernel": linear_t(f"{pre}.mlp.fc1.weight"),
                        "bias": get(f"{pre}.mlp.fc1.bias")},
                "fc2": {"kernel": linear_t(f"{pre}.mlp.fc2.weight"),
                        "bias": get(f"{pre}.mlp.fc2.bias")},
            },
        }

    import jax

    vision_layers = jax.tree.map(
        lambda *xs: np.stack(xs), *[vlayer(i) for i in range(vcfg.num_hidden_layers)]
    )
    vision = {
        "patch_embed": {"kernel": patch_kernel,
                        "bias": get("vision_tower.vision_model.embeddings.patch_embedding.bias")},
        "pos_embed": get("vision_tower.vision_model.embeddings.position_embedding.weight"),
        "layers": vision_layers,
        "post_ln": {"scale": get("vision_tower.vision_model.post_layernorm.weight"),
                    "bias": get("vision_tower.vision_model.post_layernorm.bias")},
    }

    # ---- projector ----
    projector = {"kernel": linear_t("multi_modal_projector.linear.weight")}
    if "multi_modal_projector.linear.bias" in sd:
        projector["bias"] = get("multi_modal_projector.linear.bias")

    # ---- language model ----
    def tlayer(i):
        pre = f"language_model.layers.{i}"
        return {
            "input_norm": get(f"{pre}.input_layernorm.weight"),
            "attn": {
                "q": linear_t(f"{pre}.self_attn.q_proj.weight"),
                "k": linear_t(f"{pre}.self_attn.k_proj.weight"),
                "v": linear_t(f"{pre}.self_attn.v_proj.weight"),
                "o": linear_t(f"{pre}.self_attn.o_proj.weight"),
            },
            "post_norm": get(f"{pre}.post_attention_layernorm.weight"),
            "mlp": {
                "gate": linear_t(f"{pre}.mlp.gate_proj.weight"),
                "up": linear_t(f"{pre}.mlp.up_proj.weight"),
                "down": linear_t(f"{pre}.mlp.down_proj.weight"),
            },
        }

    lm_layers = jax.tree.map(
        lambda *xs: np.stack(xs), *[tlayer(i) for i in range(tcfg.num_hidden_layers)]
    )
    lm = {
        "embed": get("language_model.embed_tokens.weight"),
        "layers": lm_layers,
        "final_norm": get("language_model.norm.weight"),
    }

    params = {"vision": vision, "projector": projector, "lm": lm}
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def load_state_dict_from_safetensors(model_path: str) -> Dict[str, np.ndarray]:
    """Glob ``*.safetensors`` under a directory into one flat dict
    (ref: utils.py:15-22)."""
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {model_path}")
    for fn in files:
        with safe_open(fn, framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


def load_hf_model(
    model_path: str, dtype=jnp.bfloat16
) -> Tuple[Dict[str, Any], PaliGemmaConfig]:
    """Load config + weights from an HF checkpoint directory
    (ref: utils.py:9-37). Returns (params pytree, config)."""
    cfg = PaliGemmaConfig.from_hf_json(model_path)
    sd = load_state_dict_from_safetensors(model_path)
    params = params_from_state_dict(cfg, sd, dtype)
    return params, cfg
