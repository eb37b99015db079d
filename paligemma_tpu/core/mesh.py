"""Device mesh + sharding rules.

The reference's only parallelism is a 25-line gloo DDP demo
(ref: test.py:6-25). Here parallelism is mesh-native: one ``Mesh`` with a
``data`` axis (batch / DP) and a ``model`` axis (tensor parallel), the same
code path from 1 chip to a v5e-8 slice. Parameters and inputs carry
``NamedSharding`` s; XLA inserts the all-reduce/all-gather collectives over
ICI (no NCCL/MPI analog needed — the mesh is the communication backend).

Sharding layout (Megatron-style TP):

* attention q/k/v kernels: output (head) dim over ``model``; o kernel: input
  dim over ``model`` — attention is head-parallel with one psum at o_proj.
* MLP gate/up: output dim over ``model``; down: input dim — one psum at down.
* embedding: vocab dim over ``model`` (logits computed shard-local, then
  all-gathered by XLA where needed).
* activations/batch: ``data`` axis; norms replicated.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import PaliGemmaConfig


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------
def _vision_layer_specs() -> Dict[str, Any]:
    col = {"kernel": P(None, None, "model"), "bias": P(None, "model")}
    row = {"kernel": P(None, "model", None), "bias": P(None)}
    rep = {"scale": P(None), "bias": P(None)}
    return {
        "ln1": rep,
        "attn": {"q": col, "k": col, "v": col, "o": row},
        "ln2": rep,
        "mlp": {"fc1": col, "fc2": row},
    }


def _lm_layer_specs() -> Dict[str, Any]:
    return {
        "input_norm": P(None),
        "attn": {
            "q": P(None, None, "model"),
            "k": P(None, None, "model"),
            "v": P(None, None, "model"),
            "o": P(None, "model", None),
        },
        "post_norm": P(None),
        "mlp": {
            "gate": P(None, None, "model"),
            "up": P(None, None, "model"),
            "down": P(None, "model", None),
        },
    }


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a paligemma params pytree."""
    specs: Dict[str, Any] = {
        "vision": {
            "patch_embed": {"kernel": P(None, "model"), "bias": P("model")},
            "pos_embed": P(None, None),
            "layers": _vision_layer_specs(),
            "post_ln": {"scale": P(None), "bias": P(None)},
        },
        "projector": {"kernel": P(None, None)},
        "lm": {
            "embed": P("model", None),  # vocab-sharded
            "layers": _lm_layer_specs(),
            "final_norm": P(None),
        },
    }
    if "bias" in params.get("projector", {}):
        specs["projector"]["bias"] = P(None)
    return specs


def lora_specs(lora: Dict[str, Any]) -> Dict[str, Any]:
    """LoRA adapters: A replicated, B sharded like the target's output dim
    where that dim is model-sharded (q/k/v/gate/up); row-parallel targets
    (o/down) shard A's input dim instead."""
    out: Dict[str, Any] = {"layers": {}}
    for name in lora["layers"]:
        if name in ("o", "down"):
            spec = {"a": P(None, "model", None), "b": P(None, None, None),
                    "alpha": P(None)}
        else:
            spec = {"a": P(None, None, None), "b": P(None, None, "model"),
                    "alpha": P(None)}
        out["layers"][name] = spec
    return out


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a params pytree onto the mesh with TP shardings."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec() -> P:
    return P("data")


def kv_cache_specs() -> Dict[str, P]:
    # (L, B, S, n_kv, d): batch over data. Gemma-2B is MQA (n_kv=1,
    # ref config num_key_value_heads=1) so KV heads replicate over model.
    spec = P(None, "data", None, None, None)
    return {"k": spec, "v": spec}
