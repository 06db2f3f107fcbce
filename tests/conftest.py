"""Test harness config: run on CPU with 8 virtual devices.

SURVEY.md SS4 "Distributed" row: multi-chip sharding is validated on a
virtual CPU mesh (`xla_force_host_platform_device_count=8`), which is how to
test domain decomposition without a TPU pod. Must run before jax imports.
"""

import os
import resource

# XLA's CPU compile (LLVM passes, often on the calling thread) sporadically
# SEGFAULTS on this box with the default 8 MB stack -- nondeterministic
# crash location across runs, 125 GB RAM free, classic deep-recursion stack
# overflow signature. Raise the limit BEFORE jax spawns any compile worker
# threads (their stacks are sized from the rlimit at pthread_create).
resource.setrlimit(resource.RLIMIT_STACK,
                   (resource.RLIM_INFINITY, resource.RLIM_INFINITY))

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
# disk so repeated test runs skip XLA compilation. NSS_TEST_CACHE_DIR lets
# the timing harness (scripts/time_tests.py) point at a throwaway dir to
# measure genuine cold-cache wall-clocks.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("NSS_TEST_CACHE_DIR", "/tmp/jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The zstandard C extension on this box SEGFAULTS inside the persistent
# cache's compress/decompress of large executables (observed twice, in
# both get_executable_and_time and put_executable_and_time, killing the
# whole pytest process). jax falls back to zlib when zstandard is absent;
# force that fallback. A zstandard crash mid-put also TEARS the entry on
# disk, and a torn executable then segfaults XLA deserialize_executable
# on every later read -- hence the tests-only cache dir above: every
# writer of that dir runs with zstandard disabled, so no torn entries.
from jax._src import compilation_cache as _cc  # noqa: E402

_cc.zstandard = None
