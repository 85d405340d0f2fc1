"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (the TPU-world
analog of the reference's single-host multi-process "distributed" tests,
SURVEY §4): XLA_FLAGS --xla_force_host_platform_device_count=8.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend before conftest
# runs, overriding JAX_PLATFORMS; this config update wins over it so tests
# really run on the virtual 8-device CPU mesh (and compile locally).
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

# This environment pays a ~5s fixed cost per XLA:CPU compilation; the
# persistent cache makes reruns of the suite fast (first run pays once).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
