"""YAML graph -> static execution plan.

The reference interprets its layer graph dynamically every forward pass,
fetching inputs from a dict (reference: src/yolo/model/model.py:87-107) and
derives strides with a dummy forward (model.py:109-163). Under XLA the graph
is traced once, so we compile the YAML to a **static plan** at build time:

- channel inference + width/depth multipliers (semantics of
  reference src/yolo/model/parser.py:33-62, 217-224),
- static spatial-scale tracking per layer, so detect-head strides are known
  without running anything,
- one `PlanStep` per layer: (name, block class, config dataclass, input names).

Executing the plan is a plain Python loop inside `jit` — fully unrolled,
all shapes static, XLA fuses across steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from yolo_re_tpu.models import blocks as B
from yolo_re_tpu.models.config import (
    LayerDef,
    ModelConfig,
    apply_depth_multiplier,
    apply_width_multiplier,
)
from yolo_re_tpu.models.heads import (
    DetectDFL,
    DetectDFLConfig,
    DualDetectDFL,
    DualDetectDFLConfig,
)

INPUT = "input"


@dataclass(frozen=True)
class PlanStep:
    name: str
    type: str
    block: Any                 # block/head class with init/apply
    cfg: Any                   # its Config dataclass
    inputs: tuple[str, ...]    # producer layer names (INPUT for the image)
    scale: float = 0.0         # output spatial downscale vs the input image
                               # (2 = H/2; 0 = unknown/legacy) — static,
                               # drives the selective-remat policy


@dataclass(frozen=True)
class Plan:
    steps: tuple[PlanStep, ...]
    detect_name: str | None
    detect_inputs: tuple[str, ...]
    strides: tuple[float, ...]
    num_classes: int


class PlanBuilder:
    def __init__(self, num_classes: int, width_mult: float, depth_mult: float,
                 input_channels: int = 3):
        self.num_classes = num_classes
        self.width_mult = width_mult
        self.depth_mult = depth_mult
        self.channel_map: dict[str, int] = {INPUT: input_channels}
        self.scale_map: dict[str, float] = {INPUT: 1.0}
        self.steps: list[PlanStep] = []
        self.prev_name = INPUT
        self.detect_name: str | None = None
        self.detect_inputs: tuple[str, ...] = ()
        self.strides: tuple[float, ...] = ()

    def add_layer(self, ld: LayerDef) -> None:
        name, btype = ld.name, ld.type
        frm = ld.from_layers if ld.from_layers else self.prev_name
        inputs = tuple(frm) if isinstance(frm, list) else (frm,)
        in_ch = [self.channel_map[n] for n in inputs]
        in_scale = [self.scale_map[n] for n in inputs]
        params = dict(ld.params)

        if btype in ("DetectDFL", "DualDetectDFL"):
            cfg, block = self._build_detect(btype, in_ch, in_scale, params)
            out_ch, out_scale = 0, in_scale[-1]
            self.detect_name = name
            self.detect_inputs = inputs
        elif btype == "Concat":
            cfg = B.ConcatConfig(dimension=params.get("dimension", 1))
            block = B.Concat
            out_ch, out_scale = sum(in_ch), in_scale[0]
        elif btype == "Silence":
            cfg, block = B.SilenceConfig(), B.Silence
            out_ch, out_scale = in_ch[0], in_scale[0]
        elif btype == "Upsample":
            sf = int(params.get("scale_factor", 2))
            cfg = B.UpsampleConfig(scale_factor=sf,
                                   mode=params.get("mode", "nearest"))
            block = B.Upsample
            out_ch, out_scale = in_ch[0], in_scale[0] / sf
        elif btype == "CBLinear":
            ocl = [apply_width_multiplier(c, self.width_mult)
                   for c in params["out_channels_list"]]
            cfg = B.CBLinearConfig(
                in_channels=in_ch[0],
                out_channels_list=tuple(ocl),
                kernel_size=params.get("kernel_size", 1),
                stride=params.get("stride", 1),
                padding=params.get("padding"),
                groups=params.get("groups", 1),
            )
            block = B.CBLinear
            out_ch, out_scale = ocl[-1], in_scale[0] * cfg.stride
        elif btype == "CBFuse":
            cfg = B.CBFuseConfig(idx=tuple(params["idx"]))
            block = B.CBFuse
            out_ch, out_scale = in_ch[-1], in_scale[-1]
        else:
            cfg, block, out_ch, out_scale = self._build_standard(
                btype, params, in_ch[0], in_scale[0])

        self.steps.append(PlanStep(name, btype, block, cfg, inputs,
                                   scale=float(out_scale)))
        self.channel_map[name] = out_ch
        self.scale_map[name] = out_scale
        self.prev_name = name

    def _build_detect(self, btype, in_ch, in_scale, params):
        if btype == "DetectDFL":
            strides = tuple(in_scale)
            cfg = DetectDFLConfig(self.num_classes, tuple(in_ch), strides)
            self.strides = cfg.strides
            return cfg, DetectDFL
        # Dual: strides from the main (second) half
        # (reference: src/yolo/model/model.py:147-149)
        n = len(in_ch) // 2
        strides = tuple(in_scale[n:])
        cfg = DualDetectDFLConfig(self.num_classes, tuple(in_ch), strides)
        self.strides = cfg.strides
        return cfg, DualDetectDFL

    def _build_standard(self, btype, params, in_ch, in_scale):
        for p in ("out_channels", "hidden_channels", "block_channels"):
            if p in params:
                params[p] = apply_width_multiplier(params[p], self.width_mult)
        if "num_repeats" in params:
            params["num_repeats"] = apply_depth_multiplier(
                params["num_repeats"], self.depth_mult)
        params["in_channels"] = in_ch

        block = B.get_block_class(btype)
        cfg = block.Config(**params)
        out_ch = params["out_channels"]
        stride = getattr(cfg, "stride", 1)
        if btype == "ADown":
            stride = 2
        return cfg, block, out_ch, in_scale * stride

    def build(self) -> Plan:
        return Plan(
            steps=tuple(self.steps),
            detect_name=self.detect_name,
            detect_inputs=self.detect_inputs,
            strides=self.strides,
            num_classes=self.num_classes,
        )


def build_plan(config: ModelConfig, input_channels: int = 3) -> Plan:
    """Main entry: parsed ModelConfig -> static Plan
    (reference analogue: src/yolo/model/parser.py:250-280)."""
    builder = PlanBuilder(
        num_classes=config.num_classes,
        width_mult=config.width_multiplier,
        depth_mult=config.depth_multiplier,
        input_channels=input_channels,
    )
    for layer_dict in config.layers:
        builder.add_layer(LayerDef.from_dict(layer_dict))
    return builder.build()
