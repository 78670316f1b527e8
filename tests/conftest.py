"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment so sharding code paths
are exercised without TPU hardware.
"""

import os

# Force CPU even when the shell pre-sets JAX_PLATFORMS=axon (the TPU tunnel):
# tests exercise the virtual 8-device mesh and host callbacks, both CPU-only.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize prepends 'axon' to jax_platforms regardless of the
# env var; override the config directly so tests really run on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the test suite re-compiles many small graphs;
# caching them across runs cuts suite time drastically.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
