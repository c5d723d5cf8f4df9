"""Exponential moving average of (params, stats) as a pure pytree update.

Reference: src/yolo/train/ema.py — decay 0.9999 with ramp
`decay * (1 - exp(-updates / tau))`, applied to every float tensor in the
state_dict (so BN running stats are EMA'd too, SURVEY §7 hard-part 3).
Here EMA state is an explicit pytree updated inside the jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def init_ema(params: Params, stats: Params) -> dict:
    # Real copies, not aliases: the train step donates params/stats AND the
    # EMA tree; aliased buffers would be donated twice.
    copy = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), t)
    return {
        "params": copy(params),
        "stats": copy(stats),
        "updates": jnp.zeros((), jnp.int32),
    }


def ema_update(ema: dict, params: Params, stats: Params,
               decay: float = 0.9999, tau: float = 2000.0) -> dict:
    updates = ema["updates"] + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))

    def blend(e, v):
        return e * d + (1.0 - d) * v

    return {
        "params": jax.tree_util.tree_map(blend, ema["params"], params),
        "stats": jax.tree_util.tree_map(blend, ema["stats"], stats),
        "updates": updates,
    }
