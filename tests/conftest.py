"""Test configuration: run everything on the XLA CPU backend with 8 virtual
devices so multi-chip sharding tests run without a TPU pod (the JAX analog of
the reference's gloo-on-CPU DDP demo, ref: test.py:8).

Note: in this environment the JAX_PLATFORMS env var is ignored by the TPU
plugin, so the platform is forced via jax.config before the backend
initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
