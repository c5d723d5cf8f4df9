"""Checkpoint save/load: full training state in one flat .npz.

Reference policy (src/yolo/train/trainer.py:336-371): epoch, global_step,
best_fitness, model/optimizer/EMA state + config in one file; best.pt on
map50 improvement, epoch{N}.pt every save_period, last.pt at end. Same
policy here, stored as numpy pytrees (framework-neutral, no pickle of
code objects).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np

from yolo_re_tpu.convert.torch_import import flatten_tree, unflatten_tree

_SECTIONS = ("params", "stats", "ema_params", "ema_stats", "opt")


def save_checkpoint(
    path: str | Path,
    *,
    params,
    stats,
    ema,
    opt_bufs,
    epoch: int,
    global_step: int,
    best_fitness: float,
    config: dict | None = None,
) -> None:
    flat: dict[str, Any] = {}
    for name, tree in (
        ("params", params), ("stats", stats),
        ("ema_params", ema["params"]), ("ema_stats", ema["stats"]),
        ("opt", opt_bufs),
    ):
        for k, v in flatten_tree(tree).items():
            flat[f"{name}/{k}"] = np.asarray(v)
    flat["meta/epoch"] = np.int64(epoch)
    flat["meta/global_step"] = np.int64(global_step)
    flat["meta/best_fitness"] = np.float64(best_fitness)
    flat["meta/ema_updates"] = np.asarray(ema["updates"])
    flat["meta/config_json"] = np.frombuffer(
        json.dumps(config or {}, default=str).encode(), dtype=np.uint8)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **flat)
    tmp.replace(path)


def save_checkpoint_orbax(
    path: str | Path,
    *,
    params,
    stats,
    ema,
    opt_bufs,
    epoch: int,
    global_step: int,
    best_fitness: float,
    config: dict | None = None,
) -> None:
    """Orbax backend: a checkpoint DIRECTORY instead of one .npz.

    Same contract as `save_checkpoint`. Use for large / sharded state —
    orbax writes per-array (optionally sharded across hosts) and restores
    lazily, the standard TPU-fleet checkpoint format (SURVEY §5). The
    .npz backend stays the default: single-file, dependency-light,
    framework-neutral.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    state = {
        "params": params,
        "stats": stats,
        "ema_params": ema["params"],
        "ema_stats": ema["stats"],
        "ema_updates": np.asarray(ema["updates"]),
        "opt": opt_bufs,
        "epoch": np.int64(epoch),
        "global_step": np.int64(global_step),
        "best_fitness": np.float64(best_fitness),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    (path / "config.json").write_text(json.dumps(config or {}, default=str))


def load_checkpoint_orbax(path: str | Path) -> dict:
    """Restore an orbax checkpoint into the `load_checkpoint` contract."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    state = ocp.PyTreeCheckpointer().restore(path)
    cfg_file = path / "config.json"
    return {
        "params": state["params"],
        "stats": state["stats"],
        "opt": state["opt"],
        "epoch": int(state["epoch"]),
        "global_step": int(state["global_step"]),
        "best_fitness": float(state["best_fitness"]),
        "ema": {
            "params": state["ema_params"],
            "stats": state["ema_stats"],
            "updates": np.asarray(state["ema_updates"]),
        },
        "config": (json.loads(cfg_file.read_text())
                   if cfg_file.exists() else {}),
    }


def load_checkpoint(path: str | Path) -> dict:
    if Path(path).is_dir():  # orbax checkpoints are directories
        return load_checkpoint_orbax(path)
    data = np.load(path)
    sections: dict[str, dict] = {s: {} for s in _SECTIONS}
    meta: dict[str, Any] = {}
    for k in data.files:
        head, _, rest = k.partition("/")
        if head in sections:
            sections[head][rest] = data[k]
        elif head == "meta":
            meta[rest] = data[k]
    out = {name: unflatten_tree(tree) if tree else {}
           for name, tree in sections.items()}
    out["epoch"] = int(meta["epoch"])
    out["global_step"] = int(meta["global_step"])
    out["best_fitness"] = float(meta["best_fitness"])
    out["ema"] = {
        "params": out.pop("ema_params"),
        "stats": out.pop("ema_stats"),
        "updates": np.asarray(meta["ema_updates"]),
    }
    cfg_bytes = meta.get("config_json")
    out["config"] = (json.loads(bytes(cfg_bytes).decode())
                     if cfg_bytes is not None and len(cfg_bytes) else {})
    return out


def load_weights(path: str | Path) -> tuple[dict, dict]:
    """Load inference weights (params, stats) from any supported artifact,
    dispatching on the file's CONTENTS rather than try/except fallthrough
    (a corrupt file surfaces its real error, not a secondary KeyError):

    - orbax checkpoint directory          -> EMA weights
    - full training-checkpoint .npz       -> EMA weights
    - bare converted-weights .npz         -> params/stats as stored
    """
    p = Path(path)
    if p.is_dir():
        ckpt = load_checkpoint(p)
        return ckpt["ema"]["params"], ckpt["ema"]["stats"]
    try:
        data = np.load(p)
        files = set(data.files)
    except Exception as e:
        raise ValueError(f"{path} is not a readable .npz weights file") from e
    if any(k.startswith("ema_params/") for k in files):
        ckpt = load_checkpoint(p)
        return ckpt["ema"]["params"], ckpt["ema"]["stats"]
    if not any(k.startswith("params/") for k in files):
        raise ValueError(
            f"{path} contains neither a training checkpoint (ema_params/*) "
            f"nor bare weights (params/*); keys start with "
            f"{sorted({k.partition('/')[0] for k in files})[:5]}")
    from yolo_re_tpu.convert.torch_import import load_params

    return load_params(str(p))
