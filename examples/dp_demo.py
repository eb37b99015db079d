"""Data-parallel demo — the TPU-native analog of the reference's DDP demo
(ref: test.py:6-25, gloo process group + DistributedDataParallel).

On TPU there is no process-per-device or gradient hook machinery: a single
program jits one step over a Mesh with the batch sharded on the "data" axis
and XLA inserts the gradient all-reduce over ICI. Runs anywhere — on a CPU
host it uses 8 virtual devices (the JAX analog of gloo-for-testing):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/dp_demo.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from paligemma_tpu.core.mesh import make_mesh


def main():
    n = len(jax.devices())
    mesh = make_mesh(data=n, model=1)
    print(f"mesh: {mesh}")

    # toy model: Linear(100 -> 10), like the reference demo
    key = jax.random.PRNGKey(0)
    w = jax.device_put(
        jax.random.normal(key, (100, 10)) * 0.1, NamedSharding(mesh, P(None, None))
    )

    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (8 * n, 100)),
        NamedSharding(mesh, P("data", None)),
    )
    y = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (8 * n, 10)),
        NamedSharding(mesh, P("data", None)),
    )

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * grads, loss  # grad all-reduce inserted by XLA

    for i in range(5):
        w, loss = step(w, x, y)
        print(f"step {i} loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
