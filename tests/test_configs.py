"""Config tests: flagship architectures, HF config.json ingestion, 448px."""

import dataclasses
import json

from paligemma_tpu.core.config import (
    PaliGemmaConfig,
    paligemma_3b_224,
    paligemma_3b_448,
)


def test_3b_224_architecture():
    cfg = paligemma_3b_224()
    # SigLIP-So400m/14 @ 224 => 256 image tokens (ref: modeling_paligemma.py:44)
    assert cfg.vision_config.num_patches == 256
    assert cfg.text_config.num_image_tokens == 256
    assert cfg.vision_config.hidden_size == 1152
    assert cfg.text_config.head_dim == 256
    assert cfg.text_config.num_kv_groups == 8  # MQA: 8 q heads, 1 kv head
    assert cfg.vocab_size == 257152
    assert cfg.image_token_index == 256000


def test_3b_448_has_1024_image_tokens():
    cfg = paligemma_3b_448()
    assert cfg.vision_config.num_patches == 1024
    assert cfg.text_config.num_image_tokens == 1024


def test_3b_896_has_4096_image_tokens():
    """google/paligemma-3b-pt-896: highest-res official checkpoint."""
    from paligemma_tpu.core.config import paligemma_3b_896

    cfg = paligemma_3b_896()
    assert cfg.vision_config.num_patches == 4096
    assert cfg.text_config.num_image_tokens == 4096
    # towers are identical to 224/448 — only image_size differs (HF config)
    assert cfg.vision_config.hidden_size == 1152
    assert cfg.text_config.hidden_size == 2048
    # long patch sequences take the flash vision path off-mesh
    # (measured 57.3 vs 100.0 ms full tower — models/paligemma docstring)
    from paligemma_tpu.models.paligemma import _vision_attn_mode

    assert _vision_attn_mode(cfg, None, True) == "flash"


def test_from_hf_dict_mirrors_checkpoint_config():
    """Shape of google/paligemma-3b-pt-224's config.json."""
    hf = {
        "image_token_index": 257152 - 1152,  # arbitrary-but-valid values
        "pad_token_id": 0,
        "projection_dim": 2048,
        "hidden_size": 2048,
        "vocab_size": 257152,
        "vision_config": {
            "hidden_size": 1152, "intermediate_size": 4304,
            "num_attention_heads": 16, "num_hidden_layers": 27,
            "patch_size": 14, "image_size": 224,
            "num_image_tokens": 256, "projection_dim": 2048,
        },
        "text_config": {
            "hidden_size": 2048, "intermediate_size": 16384,
            "num_attention_heads": 8, "num_hidden_layers": 18,
            "num_key_value_heads": 1, "vocab_size": 257152,
            "num_image_tokens": 256,
        },
    }
    cfg = PaliGemmaConfig.from_hf_dict(hf)
    assert cfg.vision_config.num_hidden_layers == 27
    assert cfg.text_config.num_key_value_heads == 1
    assert cfg.text_config.pad_token_id == 0
    assert cfg.vision_config.projection_dim == 2048
    # derived field recomputed
    assert cfg.text_config.num_image_tokens == 256


def test_config_is_hashable_and_frozen():
    cfg = paligemma_3b_224()
    hash(cfg)  # usable as a jit static argument
    try:
        cfg.vocab_size = 1
        raised = False
    except dataclasses.FrozenInstanceError:
        raised = True
    assert raised
