"""Test environment: CPU backend with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh), float64 enabled so the SciPy oracle comparisons
can be tight — mirroring the reference's host-backend test strategy
(SURVEY.md §4)."""

import os

# force CPU even when the ambient environment points JAX at a TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the ambient sitecustomize registers the TPU tunnel regardless of the env
# var, so pin the platform through the config as well
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
