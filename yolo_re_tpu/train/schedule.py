"""Warmup + cosine LR/momentum schedule as a pure traced function.

The reference mutates optimizer param-group state imperatively every step
(src/yolo/train/scheduler.py:74-121). Here the schedule is a pure function
of the step counter, evaluated *inside* the jitted train step — no host
round-trip, no mutable state.

Semantics cloned exactly, including the reference quirk that the first
optimizer step runs at the base LR/momentum (its Trainer calls
`scheduler.step()` *after* `optimizer.step()`, trainer.py:271, so update 0
sees the constructor values): update k uses schedule(k) with schedule(0) =
base values.

Per-group behavior: the bias group warms from `warmup_bias_lr`, all other
groups from 0 (scheduler.py:83-91); momentum warms 0.8 -> base
(scheduler.py:93-97).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class WarmupCosineSchedule:
    base_lr: float
    total_steps: int
    warmup_steps: int
    warmup_momentum: float = 0.8
    base_momentum: float = 0.937
    warmup_bias_lr: float = 0.1
    lrf: float = 0.01

    def _cosine(self, step):
        denom = max(self.total_steps - self.warmup_steps, 1)
        progress = jnp.clip((step - self.warmup_steps) / denom, 0.0, 1.0)
        return self.lrf + (1 - self.lrf) * 0.5 * (1 + jnp.cos(math.pi * progress))

    def __call__(self, step):
        """step: traced int (0-based update index).

        Returns (lr, bias_lr, momentum) as f32 scalars.
        """
        step = jnp.asarray(step, jnp.float32)
        in_warmup = (step <= self.warmup_steps) & (self.warmup_steps > 0)
        xi = step / max(self.warmup_steps, 1)

        cos_lr = self.base_lr * self._cosine(step)
        lr = jnp.where(in_warmup, self.base_lr * xi, cos_lr)
        bias_lr = jnp.where(
            in_warmup,
            self.warmup_bias_lr + (self.base_lr - self.warmup_bias_lr) * xi,
            cos_lr)
        momentum = jnp.where(
            in_warmup,
            self.warmup_momentum + (self.base_momentum - self.warmup_momentum) * xi,
            self.base_momentum)

        # Reference quirk: update 0 runs at constructor values.
        first = step == 0
        lr = jnp.where(first, self.base_lr, lr)
        bias_lr = jnp.where(first, self.base_lr, bias_lr)
        momentum = jnp.where(first, self.base_momentum, momentum)
        return lr, bias_lr, momentum


def one_cycle_lr(epoch: float, total_epochs: int, lrf: float = 0.01) -> float:
    """Epoch-based cosine multiplier (reference: scheduler.py:124-138)."""
    return lrf + (1 - lrf) * 0.5 * (1 + math.cos(math.pi * epoch / total_epochs))
