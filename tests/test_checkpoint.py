"""Checkpoint tests: orbax pytree round trip and trainer save/resume."""

import numpy as np

import jax
import jax.numpy as jnp

from paligemma_tpu.checkpoints.hf_export import export_hf_checkpoint
from paligemma_tpu.checkpoints.local import restore_pytree, save_pytree
from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.train.trainer import TrainConfig, Trainer

from test_train import _batch

CFG = tiny_test_config()


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "nested": {"b": jnp.ones((2, 2), jnp.bfloat16)},
    }
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    back = restore_pytree(path, like=tree)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        tree, back,
    )
    assert back["nested"]["b"].dtype == jnp.bfloat16


def test_trainer_resume_continues_identically(tmp_path):
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    batch = _batch()

    tr = Trainer(params, CFG, TrainConfig(lora_rank=4, learning_rate=1e-3))
    tr.train_step(batch)
    tr.save(str(tmp_path / "step1"))
    loss_a = tr.train_step(batch)

    tr2 = Trainer(params, CFG, TrainConfig(lora_rank=4, learning_rate=1e-3))
    tr2.restore(str(tmp_path / "step1"))
    loss_b = tr2.train_step(batch)

    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tr.lora["layers"]["q"]["b"]),
        np.asarray(tr2.lora["layers"]["q"]["b"]),
        atol=1e-7,
    )


def test_hf_export_roundtrip(tmp_path):
    """params -> HF safetensors dir -> params: identical outputs."""
    import jax.numpy as jnp

    from paligemma_tpu.checkpoints.hf_export import export_hf_checkpoint
    from paligemma_tpu.checkpoints.hf_loader import load_hf_model
    from paligemma_tpu.models import gemma

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    out = str(tmp_path / "export")
    export_hf_checkpoint(CFG, params, out)

    params2, cfg2 = load_hf_model(out, jnp.float32)
    assert cfg2.text_config.num_hidden_layers == CFG.text_config.num_hidden_layers

    rng = np.random.default_rng(0)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((1, n_img), CFG.image_token_index), rng.integers(3, 100, (1, 5))],
        axis=1,
    ).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    cache_a = gemma.init_kv_cache(CFG.text_config, 1, 16)
    cache_b = gemma.init_kv_cache(CFG.text_config, 1, 16)
    lo_a, _ = paligemma.prefill(params, CFG, jnp.asarray(pixels), jnp.asarray(ids),
                                jnp.asarray(mask), cache_a)
    lo_b, _ = paligemma.prefill(params2, cfg2, jnp.asarray(pixels), jnp.asarray(ids),
                                jnp.asarray(mask), cache_b)
    np.testing.assert_allclose(np.asarray(lo_a), np.asarray(lo_b), atol=1e-4)


def test_hf_export_loads_in_transformers(tmp_path):
    """The exported checkpoint must load in HF transformers itself."""
    import pytest
    transformers = pytest.importorskip("transformers")
    import torch

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    out = str(tmp_path / "export_hf")
    export_hf_checkpoint(CFG, params, out)
    from paligemma_tpu.checkpoints.hf_export import export_hf_checkpoint as _  # noqa

    model = transformers.PaliGemmaForConditionalGeneration.from_pretrained(
        out, torch_dtype=torch.float32
    )
    assert model is not None


def test_full_ft_resume(tmp_path):
    """Save/restore for the full-FT (non-LoRA) path."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    tr = Trainer(params, CFG, TrainConfig(lora_rank=None, learning_rate=1e-3))
    tr.train_step(batch)
    tr.save(str(tmp_path / "s1"))
    loss_a = tr.train_step(batch)

    tr2 = Trainer(params, CFG, TrainConfig(lora_rank=None, learning_rate=1e-3))
    tr2.restore(str(tmp_path / "s1"))
    loss_b = tr2.train_step(batch)
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-6)
