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

# persistent XLA compile cache: the tuner walks compile one executable per
# configuration, which dominates test wall time; cached executables make
# repeat runs cheap (keyed on HLO hash, so stale entries are impossible).
# Opt out with CUSP_TPU_TEST_NO_COMPILE_CACHE=1.
if not os.environ.get("CUSP_TPU_TEST_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
