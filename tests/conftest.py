"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: this jax build's axon TPU plugin ignores the JAX_PLATFORMS env var, so
we must force the platform via jax.config before any backend initialization.
Multi-chip logic (pjit shardings, collectives) is validated on CPU exactly as
the driver's dryrun does.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compile cache: the heavy model tests are compile-bound on
# CPU; caching executables across runs cuts suite wall time dramatically
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".xla_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
