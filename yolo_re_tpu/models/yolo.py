"""The YOLO model: static plan executor + parameter pytree management.

Public surface mirrors the reference (`YOLO.from_yaml`, `from_config`;
reference: src/yolo/model/model.py) but the execution model is TPU-native:
the model is a frozen plan of pure functions; parameters and BN statistics
are explicit pytrees; `apply` is traced once per (shape, mode) under
`jax.jit` and the whole graph fuses into one XLA program.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp

from yolo_re_tpu.models.builder import INPUT, Plan, build_plan
from yolo_re_tpu.models.config import ModelConfig, parse_yaml

Params = dict[str, Any]


def param_labels(params: Params) -> Params:
    """Label every leaf 'weight' | 'bn' | 'bias' for optimizer grouping.

    Matches the reference's three optim groups (conv/linear weights with
    weight decay; BN scales and all biases without;
    reference: src/yolo/model/model.py:165-203).
    """
    def label(path, leaf):
        key = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if key == "w":
            return "weight"
        if key == "scale":
            return "bn"
        return "bias"  # 'bias', 'b'

    return jax.tree_util.tree_map_with_path(label, params)


class YOLO:
    """YOLO detection model over a static plan.

    Example:
        model = YOLO.from_yaml("configs/models/gelan-c.yaml")
        params, stats = model.init(jax.random.key(0))
        (decoded, raw), _ = model.apply(params, stats, images)   # eval
        raw, new_stats = model.apply(params, stats, images, train=True)
    """

    def __init__(self, plan: Plan, config: ModelConfig | None = None):
        self.plan = plan
        self.config = config
        self.num_classes = plan.num_classes
        self.strides = plan.strides
        # Layer outputs referenced by later steps (so the trace-time dict
        # can drop everything else; reference: model/model.py:53-63).
        self._save_names = set()
        for step in plan.steps:
            self._save_names.update(step.inputs)

    # -- construction -----------------------------------------------------

    @classmethod
    def from_config(cls, config: ModelConfig, input_channels: int = 3) -> "YOLO":
        return cls(build_plan(config, input_channels), config)

    @classmethod
    def from_yaml(cls, path: str | Path, input_channels: int = 3,
                  num_classes: int | None = None) -> "YOLO":
        config = parse_yaml(path)
        if num_classes is not None:
            config.num_classes = num_classes
        return cls.from_config(config, input_channels)

    # -- parameters --------------------------------------------------------

    def init(self, key: jax.Array) -> tuple[Params, Params]:
        """Initialize (params, stats) pytrees keyed by layer name."""
        params, stats = {}, {}
        keys = jax.random.split(key, len(self.plan.steps))
        for k, step in zip(keys, self.plan.steps):
            p, s = step.block.init(k, step.cfg)
            params[step.name] = p
            stats[step.name] = s
        return params, stats

    def param_labels(self, params: Params) -> Params:
        return param_labels(params)

    # -- execution ----------------------------------------------------------

    def apply(self, params: Params, stats: Params, x: jax.Array, *,
              train: bool = False, head_mode: str = "full",
              remat: bool | str = False):
        """Run the plan. x is NHWC float (B, H, W, 3).

        Returns (head_output, new_stats). Head output:
            train, single head : list of per-level (box, cls) NHWC pairs
                                 (lane-aligned; the loss consumes pairs —
                                 see models/heads.py:DetectDFL.apply)
            train, dual head   : {"aux": [...], "main": [...]} of pairs
            eval, single head  : (decoded (B, A, 4+nc), raw)
            eval, dual head    : ({"aux": dec, "main": dec}, raw dict)
        """
        if not isinstance(remat, str):
            remat = bool(remat)  # accept ints (YAML/CLI truthiness)
        elif remat not in ("early",):
            raise ValueError(
                f"remat must be a bool or 'early', got {remat!r}")
        outputs: dict[str, Any] = {INPUT: x}
        new_stats: Params = {}
        out = x
        last = self.plan.steps[-1].name
        for step in self.plan.steps:
            if len(step.inputs) == 1 and step.type not in ("CBFuse",):
                inp = outputs[step.inputs[0]]
            else:
                inp = [outputs[n] for n in step.inputs]
            # Detect heads always take a list of feature maps.
            if step.name == self.plan.detect_name and not isinstance(inp, list):
                inp = [inp]
            # .get: parameter-free layers (Concat/Upsample/...) serialize to
            # nothing in npz checkpoints and may be absent after load.
            kw = ({"mode": head_mode}
                  if step.name == self.plan.detect_name else {})
            apply_fn = partial(step.block.apply, step.cfg, train=train, **kw)
            if remat is True or (remat == "early" and 0 < step.scale <= 8):
                # Per-block rematerialization: the backward pass recomputes
                # each block's internals from its inputs instead of storing
                # every activation — trades ~1 extra forward of FLOPs for
                # the memory to fit much larger train batches. "early"
                # remats only the high-resolution stages (downscale <= 8),
                # which hold most of the activation memory but a minority
                # of the FLOPs — cheaper recompute than full remat.
                apply_fn = jax.checkpoint(apply_fn)
            out, s = apply_fn(params.get(step.name, {}),
                              stats.get(step.name, {}), inp)
            new_stats[step.name] = s
            if step.name in self._save_names or step.name == last:
                outputs[step.name] = out
        return out, new_stats

    # -- convenience -------------------------------------------------------

    @partial(jax.jit, static_argnums=(0,))
    def _infer_jit(self, params, stats, x):
        out, _ = self.apply(params, stats, x, train=False)
        return out

    def predict(self, params: Params, stats: Params, x: jax.Array):
        """Jit-compiled eval forward; returns (decoded, raw)."""
        return self._infer_jit(params, stats, x)

    @partial(jax.jit, static_argnums=(0,))
    def _infer_split_jit(self, params, stats, x):
        out, _ = self.apply(params, stats, x, train=False, head_mode="split")
        return out

    def predict_split(self, params: Params, stats: Params, x: jax.Array):
        """Eval forward returning flat raw (box_logits, cls_logits) streams
        for lazy-decode NMS (dual heads: the main branch)."""
        return self._infer_split_jit(params, stats, x)

    def fuse(self, params: Params, stats: Params) -> tuple[Params, Params]:
        """Fold all BN (and RepConv branches) for the inference path."""
        from yolo_re_tpu.models.fuse import fuse_model
        return fuse_model(self.plan, params, stats)

    def num_params(self, params: Params) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(params))
