"""Test harness config: force an 8-fake-device CPU backend BEFORE jax import.

This is the TPU answer to "distributed tests without a cluster"
(SURVEY.md §4): all sharding/pjit tests run against a virtual 8-device mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
