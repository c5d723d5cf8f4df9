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

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     shutdown_timeout_seconds: int = 300) -> tuple[int, int]:
    """Join the cross-host runtime for multi-host data parallelism.

    Call ONCE per process before any other JAX operation. On TPU pods the
    arguments are auto-detected from the environment (pass nothing); on
    CPU/GPU clusters pass the coordinator's host:port plus this process's
    id. After this, `jax.devices()` spans every host (ICI within a slice,
    DCN across) and `make_mesh()` builds the global mesh.

    Returns (process_index, process_count). The reference has no
    distributed path at all (SURVEY §2.2); this is the TPU-native
    equivalent of a torch.distributed init.
    """
    # Must not touch the backend (jax.devices/process_count) before
    # initialize — that would bind a single-process runtime first.
    already = getattr(jax.distributed, "is_initialized", lambda: False)()
    if not already and (coordinator_address
                        or num_processes
                        or os.environ.get("JAX_COORDINATOR_ADDRESS")
                        or os.environ.get("COORDINATOR_ADDRESS")):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            # Exiting is a cluster-wide barrier; a process doing post-train
            # host work (checkpoint writes) must not let faster peers trip
            # the default deadline.
            shutdown_timeout_seconds=shutdown_timeout_seconds)
    return jax.process_index(), jax.process_count()


def warmup_collectives(mesh: Mesh) -> None:
    """Prime the cross-process collective context with one trivial
    all-reduce over the FULL mesh clique.

    Gloo (the CPU multi-process backend) initializes a TCP context per
    device clique inside a hard 30s rendezvous window at the clique's
    FIRST collective. If that first collective sits inside a big program
    (the train step), a process that finishes compiling early enters the
    window while a peer is still compiling — on a contended host the skew
    blows the deadline. Priming the clique with this sub-second program
    bounds the skew; every later collective over the mesh reuses the
    established context (verified: a 40s injected skew after warmup is
    harmless, fatal without). Cheap and safe on TPU (one tiny ICI
    all-reduce), no-op in single-process runs.
    """
    if jax.process_count() == 1:
        return
    x = jax.make_array_from_process_local_data(
        batch_sharding(mesh),
        np.ones((len(mesh.local_devices), 8), np.float32))
    float(jax.jit(lambda a: a.sum())(x))


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the batch axis.

    Uses `jax.devices()` — after `init_distributed` that is the GLOBAL
    device list across all hosts, so the same call builds the single-host
    and the multi-host mesh."""
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
    """Place a host batch onto the mesh, batch axis sharded.

    Single process: the whole global batch is on this host; device_put
    splits it. Multi-process: each host passes its LOCAL slice of the
    global batch (the loader's `shard=` option yields exactly that) and
    the runtime assembles the global array — no image bytes cross hosts.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
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
