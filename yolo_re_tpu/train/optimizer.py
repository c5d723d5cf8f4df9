"""SGD with grouped hyperparameters, torch-exact semantics, jit-native.

The reference relies on torch.optim.SGD over three param groups
(weights+decay / BN no-decay / bias no-decay; reference:
src/yolo/model/model.py:165-203, src/yolo/train/trainer.py:121-132).
This module implements the same update rule as a pure function so the
per-step warmup (including the *per-group* bias LR and traced momentum)
lives inside the jitted train step:

    g = grad + wd * p        (coupled weight decay, weights group only)
    buf = momentum * buf + g
    p  -= lr_group * buf

Group membership comes from `param_labels` ('weight' | 'bn' | 'bias').
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def init_sgd_state(params: Params) -> Params:
    """Zero momentum buffers, same structure as params."""
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def sgd_step(
    params: Params,
    grads: Params,
    bufs: Params,
    labels: Params,
    *,
    lr,
    bias_lr,
    momentum,
    weight_decay: float,
) -> tuple[Params, Params]:
    """One SGD update. lr/bias_lr/momentum may be traced scalars.

    Returns (new_params, new_bufs).
    """
    def update(p, g, buf, lab):
        g = g.astype(jnp.float32)
        if lab == "weight":
            g = g + weight_decay * p
        new_buf = momentum * buf + g
        step_lr = bias_lr if lab == "bias" else lr
        return p - step_lr * new_buf, new_buf

    out = jax.tree_util.tree_map(update, params, grads, bufs, labels)
    new_params = jax.tree_util.tree_map(
        lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
    new_bufs = jax.tree_util.tree_map(
        lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_bufs


def clip_by_global_norm(grads: Params, max_norm: float) -> tuple[Params, jax.Array]:
    """torch.nn.utils.clip_grad_norm_ semantics (reference:
    trainer.py:259/267 uses max_norm=10)."""
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm
