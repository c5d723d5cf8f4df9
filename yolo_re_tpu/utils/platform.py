"""JAX platform selection that actually works in this environment.

The TPU here is attached through an external PJRT plugin that registers as
platform 'tpu' and wins device selection regardless of the JAX_PLATFORMS
environment variable. `jax.config.update("jax_platforms", ...)` *is*
honored (until the backend initializes), so platform forcing must go
through the config API, before any jax computation.

Scripts call `select_platform()` first thing; users set
YOLO_JAX_PLATFORM=cpu (or pass platform="cpu") for host-side runs like
parity checks.
"""

from __future__ import annotations

import hashlib
import os


def _cpu_fingerprint() -> str:
    """Hash of the host's CPU feature flags.

    The persistent compilation cache stores XLA:CPU AOT executables
    compiled for the machine features detected at compile time. This VM
    migrates across physical hosts with different feature sets; reusing
    an artifact across that boundary intermittently SIGILLs ("Fatal
    Python error: Aborted" mid-suite). Keying the cache dir on the flags
    keeps each host population separate.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nofpr"


def cache_dir() -> str:
    # `or` (not a dict default): an EMPTY env var must also fall back,
    # else the fingerprint suffix becomes a relative "-<hash>" directory
    # created in whatever cwd the process runs from.
    base = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/jax_comp_cache"))
    return f"{base}-{_cpu_fingerprint()}"


def select_platform(platform: str | None = None) -> None:
    """Force the JAX platform via the config API.

    Priority: explicit arg > YOLO_JAX_PLATFORM env > JAX_PLATFORMS env when
    it names a standard backend (cpu/gpu/tpu) > leave default.
    """
    import jax

    if platform is None:
        platform = os.environ.get("YOLO_JAX_PLATFORM")
    if platform is None:
        env = os.environ.get("JAX_PLATFORMS", "")
        if env in ("cpu", "gpu", "tpu"):
            platform = env
    if platform:
        jax.config.update("jax_platforms", platform)

    jax.config.update("jax_compilation_cache_dir", cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
