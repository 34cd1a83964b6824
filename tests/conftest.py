"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic (pjit shardings, collectives) is validated on CPU exactly as
the driver's dryrun does; kernels are validated against fp64 references here
and against the reference math on real TPU via bench.py.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
