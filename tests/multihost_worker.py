"""Worker for tests/test_multihost.py: one of N CPU processes.

Run as:  python multihost_worker.py <coordinator> <num_procs> <pid>

Forces a 4-virtual-device CPU backend, joins the distributed runtime,
builds the hybrid ('data','model') mesh, runs one TP+DP-sharded gemma
train-loss step on a process-local batch slice, and prints LOSS/ROWS
lines the parent asserts on (equal loss on every host = the DCN psum
worked; distinct row slices = the data split worked).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from paligemma_tpu.core import multihost
from paligemma_tpu.core.config import GemmaConfig
from paligemma_tpu.core.mesh import param_specs
from paligemma_tpu.models import gemma


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    multihost.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    mesh = multihost.make_multihost_mesh()  # data=nproc, model=4
    assert mesh.shape == {"data": nproc, "model": 4}, mesh.shape

    cfg = GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
    )
    params = gemma.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    specs = param_specs(params)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )

    # global batch 2*nproc rows, each process materializes only its slice
    B, S = 2 * nproc, 16
    rows = multihost.process_local_rows(B)
    print(f"ROWS {pid} {rows.start} {rows.stop}", flush=True)
    rng = np.random.default_rng(0)  # same stream everywhere, slice per host
    all_ids = rng.integers(0, 256, (B, S)).astype(np.int32)
    batch = multihost.global_batch_from_local(mesh, all_ids[rows])

    @jax.jit
    def loss_fn(p, ids):
        b, s = ids.shape
        embeds = jnp.take(p["embed"], ids, axis=0).astype(jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        causal = jnp.tril(jnp.ones((s, s), bool))[None]
        logits = gemma.forward_train(
            p, cfg, embeds, pos, jnp.broadcast_to(causal, (b, s, s))
        )
        tgt = jnp.roll(ids, -1, axis=1)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        return nll[:, :-1].mean()

    loss = float(jax.device_get(loss_fn(params, batch)))
    assert np.isfinite(loss)
    print(f"LOSS {pid} {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
