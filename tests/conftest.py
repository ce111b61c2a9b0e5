"""Test configuration: CPU backend with 8 virtual devices + float64.

Tests validate numeric parity with the float64 reference formulas, so they
run on the CPU backend with x64 enabled; sharding tests use the 8 virtual
host devices (SURVEY §4: multi-device testing via host-platform override).
Must run before jax initializes its backends — and must *override* any
JAX_PLATFORMS inherited from the launching environment (e.g. a TPU tunnel).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env may pin JAX_PLATFORMS=axon (TPU tunnel) via a site hook; the
# config update after import reliably overrides it before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/bb25_jax_tests")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
