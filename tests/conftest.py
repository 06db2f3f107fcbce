"""Test harness config: run on CPU with 8 virtual devices.

SURVEY.md SS4 "Distributed" row: multi-chip sharding is validated on a
virtual CPU mesh (`xla_force_host_platform_device_count=8`), which is how to
test domain decomposition without a TPU pod. Must run before jax imports.
"""

import os

# The sandbox pre-sets JAX_PLATFORMS=axon (the TPU tunnel); tests must run on
# CPU with virtual devices, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize hook sets jax_platforms="axon,cpu" programmatically
# (env vars are ignored); override it back to CPU before any backend init.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)
# Compilation on this host is slow (1 core); cache compiled executables on
# disk so repeated test runs skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
