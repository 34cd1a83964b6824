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
# CPU; caching executables across runs cuts suite wall time dramatically.
# Keying rationale (cross-host SIGILL/SIGABRT hazard) lives with the shared
# helper in uninext_tpu/utils/cache_key.py (ADVICE r4 dedupe).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from uninext_tpu.utils.cache_key import cache_tag  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 f".xla_cache_cpu-{cache_tag('cpu')}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


# ---- fast lane ------------------------------------------------------------
# The model-building tests are compile-bound (tens of minutes cold on one
# CPU core). They are auto-marked "heavy" so CI and humans get a quick lane:
#   python -m pytest tests/ -q -m "not heavy"     (~2-3 min, no model jits)
# Full-suite timing is recorded honestly in tests/README.md.
_HEAVY_FILES = {
    "test_model.py", "test_video_model.py", "test_torch_mirror_full.py",
    "test_torch_mirror_vid.py", "test_trainer_loop.py", "test_eval_loop.py",
    "test_tp_sharding.py", "test_scan_encoder.py", "test_mini_coco.py",
    "test_registry_recipe.py", "test_vit_parity.py", "test_sot.py",
    "test_vis_driver.py", "test_real_format_outputs.py", "test_tools_cli.py",
    "test_bert_parity.py", "test_msda.py", "test_convert_scan.py",
    "test_sp_serving.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        if os.path.basename(str(item.fspath)) in _HEAVY_FILES:
            item.add_marker(_pytest.mark.heavy)
