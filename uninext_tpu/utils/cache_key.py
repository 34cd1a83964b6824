"""Compilation-cache directory keying shared by tests/conftest.py and
__graft_entry__.py (ADVICE r4: the two copies had drifted, and keying on
/proc/cpuinfo alone does not capture XLA's compile-target feature set).

XLA:CPU caches AOT machine code; an executable compiled on one
microarchitecture (e.g. an AMX-capable host) aborts the loading process
(SIGILL/SIGABRT) on another — observed cross-host in round 4 when the
sandbox moved machines while sharing this repo's disk. The key therefore
folds together everything known to influence the emitted code:

  * jaxlib version   — XLA's own codegen preferences (+prefer-no-scatter
                       etc.) change across releases, invisible to cpuinfo
  * backend platform — cpu vs tpu executables never interchange
  * /proc/cpuinfo flags line — host ISA extensions

This narrows (not provably closes) the cross-host window; a residual
mismatch still surfaces as a cache MISS + recompile or a loud abort on
first load, never silent wrong numerics.
"""
from __future__ import annotations

import hashlib


def cache_tag(platform: str = "cpu") -> str:
    """Stable 8-hex tag for the XLA compile target on this host."""
    parts = [platform]
    try:
        import jaxlib
        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:
        parts.append("?")
    flags = "generic"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        import platform as _pl
        flags = _pl.processor() or "generic"
    parts.append(flags)
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:8]
