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
