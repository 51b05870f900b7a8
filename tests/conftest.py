"""Test harness config: force an 8-fake-device CPU backend BEFORE jax import.

This is the TPU answer to "distributed tests without a cluster"
(SURVEY.md §4): all sharding/pjit tests run against a virtual 8-device mesh.
Note the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel), so we must
overwrite — not setdefault. Run with VITX_TEST_TPU=1 to execute the suite on
the real chip instead (sharding tests then skip if fewer than 2 devices).
"""

import os

if not os.environ.get("VITX_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not os.environ.get("VITX_TEST_TPU"):
    # The axon TPU plugin overrides JAX_PLATFORMS; the config flag wins.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
