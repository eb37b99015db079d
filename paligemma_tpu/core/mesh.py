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

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P



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
# Which matmul operand dimension is TP-sharded per projection:
# "col" = output dim on "model" (q/k/v/gate/up/fc1), "row" = input dim on
# "model" (o/down/fc2). Quantized entries (w8 / w8t / s) follow the same
# logical dims.
_COL_PROJ = {"q", "k", "v", "gate", "up", "fc1", "qkv", "gateup"}
_ROW_PROJ = {"o", "down", "fc2"}


def _spec_for_leaf(names, leaf) -> P:
    """Sharding rule from the pytree path (works for dense + int8 trees)."""
    nset = set(names)
    ndim = leaf.ndim

    def axis_spec(shard_dim_from_end: int) -> P:
        spec = [None] * ndim
        spec[ndim - 1 - shard_dim_from_end] = "model"
        return P(*spec)

    if "head_q" in nset:
        if names[-1] == "s":
            return P("model")
        # w8 (H, V) -> vocab on model; w8t (V, H) -> vocab on model (dim 0)
        return axis_spec(0) if names[-1] == "w8" else P("model", None)
    if "embed" == names[-1]:
        return P("model", None)  # vocab-sharded
    if "pos_embed" == names[-1] or "final_norm" == names[-1]:
        return P(*([None] * ndim))
    if "patch_embed" in nset:
        return axis_spec(0)  # kernel (ppc, D) / bias (D,) -> D on model

    if names[-1] == "grid":
        return P(*([None] * ndim))  # 4-bit codebook: tiny, replicated

    proj = next((n for n in names if n in _COL_PROJ | _ROW_PROJ), None)
    if proj is None:
        return P(*([None] * ndim))  # norms, projector, alphas

    col = proj in _COL_PROJ
    last = names[-1]
    if last == "s":  # scales: per-output-channel
        return axis_spec(0) if col else P(*([None] * ndim))
    if last == "w8t":  # (..., N, K)
        return axis_spec(1) if col else axis_spec(0)
    if last == "bias":
        return axis_spec(0) if col else P(*([None] * ndim))
    # dense kernel or w8: (..., K, N)
    return axis_spec(0) if col else axis_spec(1)


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a (dense or int8-quantized) params tree."""

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return _spec_for_leaf(names, leaf)

    return jax.tree_util.tree_map_with_path(rule, params)


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


def fsdp_param_specs(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """ZeRO-3-style fully-sharded specs: extend the TP specs by sharding one
    remaining axis of every large tensor over ``data``.

    With parameters (and therefore gradients and optimizer state — optax
    states mirror the param shardings) sharded over BOTH axes, per-device
    state memory drops by ``data x model``; XLA all-gathers each weight at
    use and reduce-scatters its gradient, the standard GSPMD lowering of
    FSDP/ZeRO-3 (the "How to Scale Your Model" recipe — no hand-written
    collectives). The reference has no analog (its distribution story is a
    25-line gloo DDP demo, ref: test.py:6-25); this exists so FULL
    fine-tunes fit when optimizer state would exceed one chip's HBM.

    Rule: pick the LARGEST axis not already model-sharded whose size
    divides the data-axis size (ties -> earliest); tensors smaller than
    64 KiB stay replicated (all-gather latency would dominate)."""
    d = int(mesh.shape["data"])
    base = param_specs(params)
    if d == 1:
        return base

    def rule(leaf, spec):
        if leaf.ndim == 0 or leaf.size * leaf.dtype.itemsize < (1 << 16):
            return spec
        full = list(spec) + [None] * (leaf.ndim - len(spec))
        cands = [
            i for i in range(leaf.ndim)
            if full[i] is None and leaf.shape[i] % d == 0 and leaf.shape[i] > 1
        ]
        if not cands:
            return spec
        ax = max(cands, key=lambda i: leaf.shape[i])
        full[ax] = "data"
        return P(*full)

    return jax.tree.map(rule, params, base)


def batch_spec() -> P:
    return P("data")


def kv_cache_specs() -> Dict[str, P]:
    # (L, B, S, n_kv, d): batch over data. Gemma-2B is MQA (n_kv=1,
    # ref config num_key_value_heads=1) so KV heads replicate over model.
    spec = P(None, "data", None, None, None)
    return {"k": spec, "v": spec}
