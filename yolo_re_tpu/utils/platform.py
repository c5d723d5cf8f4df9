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
    """Hash of the host CPU's identity AND feature flags.

    The persistent compilation cache stores XLA:CPU AOT executables
    compiled for the machine features detected at compile time. This VM
    migrates across physical hosts; reusing an artifact across that
    boundary intermittently SIGILLs/aborts ("Fatal Python error:
    Aborted" mid-suite) — the loader only WARNS on a feature mismatch
    and runs the stale code anyway (cpu_aot_loader.cc:210).

    Hashing the `flags` line alone proved insufficient: LLVM derives
    tuning features (e.g. `prefer-no-gather`, the Gather Data Sampling
    mitigation) from the CPUID family/model — two hosts can share an
    identical flags line yet produce incompatible AOT artifacts (seen
    live 2026-08: an 8-device all-reduce program cached on the previous
    host aborted inside AllReduceThunk on this one, same flags hash).
    Include every CPUID identity line in the key.
    """
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "cpu family", "model",
                                    "stepping", "microcode",
                                    "cpuid level")):
                    ident.append(line.strip())
                if line.strip() == "" and ident:
                    break  # first core only; all cores are identical here
    except OSError:
        pass
    if not ident:
        return "nofpr"
    return hashlib.sha1("\n".join(ident).encode()).hexdigest()[:8]


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
