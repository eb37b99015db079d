"""Checkpoint tests: orbax pytree round trip and trainer save/resume."""

import numpy as np

import jax
import jax.numpy as jnp

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
