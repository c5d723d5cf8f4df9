"""Device mesh + sharding helpers for data-parallel training.

The reference is single-device (SURVEY §2.2 — no torch.distributed at
all); scaling here is the JAX-native recipe: a 1-D `Mesh` over the batch
axis, `NamedSharding` annotations on batch inputs, replicated parameters,
and `jax.jit` letting XLA insert the gradient `psum`s and compute *global*
BatchNorm statistics (the sharded-batch mean reductions become
cross-device collectives automatically — SyncBatchNorm for free).

All collectives ride ICI; nothing here talks to a host network.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Place a host batch onto the mesh, batch axis sharded."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Replicate a parameter pytree on every device of the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def pad_batch_to(batch: dict[str, Any], size: int) -> dict[str, Any]:
    """Pad the batch axis up to `size` (divisibility for sharding).

    For INFERENCE paths only (serving/eval): BN is frozen there and padded
    rows are sliced off the results. Training must never see padded rows —
    they would enter the global BN batch statistics and the loss
    `* batch_size` scaling; Trainer enforces divisible batches with
    drop_last instead and raises on a non-divisible batch.
    """
    b = next(iter(batch.values())).shape[0]
    if b == size:
        return batch
    out = {}
    for k, v in batch.items():
        pad = [(0, size - b)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(np.asarray(v), pad)
    return out
