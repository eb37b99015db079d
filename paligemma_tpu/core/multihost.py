"""Multi-host (DCN) meshes: scale past one host's chips.

The reference's distributed story is a single-host gloo DDP demo
(ref: test.py:6-25). The TPU-native extension is multi-*process* SPMD:
every host runs the same program, ``jax.distributed.initialize`` wires the
processes into one runtime, and a single global ``Mesh`` spans all chips.
Everything downstream (``core.mesh`` shardings, the engine, the trainer)
already works on a global mesh — the only genuinely multi-host concerns
are (a) building a mesh whose slow DCN hops carry only the
bandwidth-light axis, and (b) feeding each process its local slice of the
global batch. This module owns both.

Axis placement: data-parallel gradients are one psum of size(params) per
step and overlap with backward compute, so ``data`` goes on DCN (across
hosts); tensor-parallel collectives sit on the critical path of every
matmul, so ``model`` stays inside a host's ICI domain. This is the
standard DP-over-DCN x TP-over-ICI hybrid (scaling-book recipe), built
with ``mesh_utils.create_hybrid_device_mesh``.

Single-process fallback: with one process this degrades to
``core.mesh.make_mesh`` exactly, so library code can call these helpers
unconditionally.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Join this process to the global JAX runtime.

    On TPU pods all arguments auto-detect from the metadata server, so call
    with no args. Off-pod (e.g. CPU hosts, tests) pass them explicitly.
    Idempotent: a second call is a no-op instead of an error. Must run
    before anything touches the XLA backend (jax.devices() etc.) — this
    function deliberately avoids such calls itself.
    """
    if getattr(initialize, "_done", False):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    initialize._done = True


def make_multihost_mesh(
    data: Optional[int] = None, model: Optional[int] = None
) -> Mesh:
    """Global ('data', 'model') mesh with model confined to each host.

    ``data`` defaults to the process count, ``model`` to the per-host
    device count (pure DP across hosts, pure TP inside). ``model`` must
    divide the per-host device count — TP traffic is per-matmul and must
    not cross DCN.
    """
    n_hosts = jax.process_count()
    per_host = jax.local_device_count()
    model = per_host if model is None else model
    data = (n_hosts * per_host) // model if data is None else data
    assert per_host % model == 0, (
        f"model={model} must divide local device count {per_host}: the "
        "model axis must stay inside one host's ICI domain"
    )
    if n_hosts == 1:
        devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
        return Mesh(devs, axis_names=("data", "model"))
    ici_data = per_host // model
    dcn_data = data // max(ici_data, 1)
    assert dcn_data * ici_data == data and dcn_data <= n_hosts, (
        f"data={data} unreachable with {n_hosts} hosts x {per_host} local "
        f"devices at model={model}"
    )
    try:
        # TPU pods: group by slice_index so DCN hops carry only 'data'
        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici_data, model),
            dcn_mesh_shape=(dcn_data, 1),
            devices=jax.devices(),
        )
    except ValueError:
        # Backends without slice_index (CPU multi-process tests): group by
        # process — same property, the slow hop only ever crosses 'data'.
        by_proc = [[] for _ in range(n_hosts)]
        for d in jax.devices():
            by_proc[d.process_index].append(d)
        rows = [h[i * model : (i + 1) * model]
                for h in by_proc[:dcn_data] for i in range(ici_data)]
        devs = np.asarray(rows)
    return Mesh(devs.reshape(data, model), axis_names=("data", "model"))


def global_batch_from_local(
    mesh: Mesh, local_batch: Any, spec: P = P("data")
) -> Any:
    """Assemble per-process host arrays into one global sharded array.

    Each process passes its *local* shard of the batch (leading dim =
    global_batch / process_count for the default spec); the result is a
    global jax.Array laid out per ``spec`` with no cross-host data motion
    (each chip reads from its own host's buffer).
    """
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        ),
        local_batch,
    )


def process_local_rows(global_rows: int) -> slice:
    """Row range of a globally-indexed dataset this process should load.

    Deterministic contiguous split; the tail remainder goes to the last
    processes one row at a time (so sizes differ by at most 1 — pair with
    per-process padding or drop-last at the caller).
    """
    n, p = jax.process_count(), jax.process_index()
    base, rem = divmod(global_rows, n)
    start = p * base + min(p, rem)
    return slice(start, start + base + (1 if p < rem else 0))
