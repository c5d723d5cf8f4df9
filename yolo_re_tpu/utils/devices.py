"""Device discovery helpers (reference analogue: src/yolo/utils/device.py).

The reference picks one of cuda/mps/cpu; here "device" means the JAX
backend + the set of chips a mesh can span.
"""

from __future__ import annotations

import jax


def get_device(prefer: str = "auto") -> jax.Device:
    """First device of the preferred backend: tpu > gpu > cpu for 'auto'."""
    if prefer != "auto":
        return jax.devices(prefer)[0]
    for backend in ("tpu", "gpu"):
        try:
            devs = jax.devices(backend)
            if devs:
                return devs[0]
        except RuntimeError:
            continue
    return jax.devices("cpu")[0]


def device_summary() -> str:
    devs = jax.devices()
    kinds = {}
    for d in devs:
        kinds.setdefault(d.device_kind, 0)
        kinds[d.device_kind] += 1
    parts = [f"{n}x {k}" for k, n in kinds.items()]
    return f"{jax.default_backend()}: " + ", ".join(parts)
