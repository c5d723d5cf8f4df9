"""Detection heads: DetectDFL and DualDetectDFL, TPU-native.

Differences from the reference (src/yolo/heads/detect.py):

- Strides are **static config**, derived from the layer graph by the builder
  (no dummy forward pass; contrast reference model/model.py:109-163), so
  anchors are plain numpy constants baked into the trace.
- Raw per-level outputs are NHWC (B, H, W, 4*reg_max + nc); the decoded
  output is (B, ΣHW, 4 + nc) — anchors-major, channel-minor — which feeds
  the batched NMS directly without the reference's permutes.
- DFL decode is a softmax + projection einsum (no fixed-weight conv trick;
  reference src/yolo/heads/dfl.py:31-50).
- The dual head's canonical output contract is a dict {"aux": ..., "main": ...}
  in both train and eval mode, fixing the reference's ambiguous list-vs-tuple
  dispatch (SURVEY §2.4.1).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from yolo_re_tpu.models.blocks import Conv, ConvConfig
from yolo_re_tpu.ops.boxes import dfl_decode, dist2bbox, make_anchors_np
from yolo_re_tpu.ops.conv import conv2d, init_conv_kernel

Params = dict[str, Any]


def _make_divisible(x: float, divisor: int) -> int:
    return math.ceil(x / divisor) * divisor


def head_widths(in_ch0: int, num_classes: int, reg_max: int = 16) -> tuple[int, int]:
    """Box/cls tower widths (reference: src/yolo/heads/detect.py:45-46)."""
    c2 = _make_divisible(max(in_ch0 // 4, reg_max * 4, 16), 4)
    c3 = max(in_ch0, min(num_classes * 2, 128))
    return c2, c3


# ---------------------------------------------------------------------------
# One box/cls tower pair (shared by single and dual heads)
# ---------------------------------------------------------------------------

def _tower_cfgs(ch: int, c2: int, c3: int, num_classes: int, reg_max: int):
    box = (
        ConvConfig(ch, c2, 3),
        ConvConfig(c2, c2, 3, groups=4),
    )
    cls = (
        ConvConfig(ch, c3, 3),
        ConvConfig(c3, c3, 3),
    )
    return box, cls


def _init_tower(key, ch, c2, c3, num_classes, reg_max):
    box_cfgs, cls_cfgs = _tower_cfgs(ch, c2, c3, num_classes, reg_max)
    keys = jax.random.split(key, 6)
    params, stats = {"box": [], "cls": []}, {"box": [], "cls": []}
    for i, c in enumerate(box_cfgs):
        p, s = Conv.init(keys[i], c)
        params["box"].append(p)
        stats["box"].append(s)
    # Final 1x1 biased conv, groups=4 (reference detect.py:48-56)
    wkey, bkey = jax.random.split(keys[2])
    fan_in = c2 // 4
    bound = 1.0 / math.sqrt(fan_in)
    params["box"].append({
        "w": init_conv_kernel(wkey, 1, c2, 4 * reg_max, groups=4),
        "b": jax.random.uniform(bkey, (4 * reg_max,), jnp.float32, -bound, bound),
    })
    stats["box"].append({})
    for i, c in enumerate(cls_cfgs):
        p, s = Conv.init(keys[3 + i], c)
        params["cls"].append(p)
        stats["cls"].append(s)
    wkey, bkey = jax.random.split(keys[5])
    bound = 1.0 / math.sqrt(c3)
    params["cls"].append({
        "w": init_conv_kernel(wkey, 1, c3, num_classes),
        "b": jax.random.uniform(bkey, (num_classes,), jnp.float32, -bound, bound),
    })
    stats["cls"].append({})
    return params, stats


def _apply_tower(params, stats, x, ch, c2, c3, num_classes, reg_max, train):
    box_cfgs, cls_cfgs = _tower_cfgs(ch, c2, c3, num_classes, reg_max)
    ns = {"box": [None] * 3, "cls": [None] * 3}
    yb = x
    for i, c in enumerate(box_cfgs):
        yb, ns["box"][i] = Conv.apply(c, params["box"][i], stats["box"][i],
                                      yb, train=train)
    pb = params["box"][2]
    yb = conv2d(yb, pb["w"], groups=4) + pb["b"]
    ns["box"][2] = {}
    yc = x
    for i, c in enumerate(cls_cfgs):
        yc, ns["cls"][i] = Conv.apply(c, params["cls"][i], stats["cls"][i],
                                      yc, train=train)
    pc = params["cls"][2]
    yc = conv2d(yc, pc["w"]) + pc["b"]
    ns["cls"][2] = {}
    return (yb, yc), ns


def _bias_init(params, strides, num_classes):
    """In-place-style bias init on a fresh param tree (reference
    src/yolo/heads/detect.py:111-127): box bias = 1.0; cls bias =
    log(5/nc/(640/stride)^2)."""
    new = []
    for tower, s in zip(params, strides):
        t = jax.tree_util.tree_map(lambda x: x, tower)  # shallow copy tree
        t["box"][2]["b"] = jnp.ones_like(tower["box"][2]["b"])
        t["cls"][2]["b"] = jnp.full_like(
            tower["cls"][2]["b"], math.log(5 / num_classes / (640 / s) ** 2))
        new.append(t)
    return new


def flatten_pairs(levels, num_classes, reg_max):
    """Per-level (box, cls) NHWC pairs -> flat (B, A, 4*reg_max), (B, A, nc).
    Lane-aligned: the two streams never share a channel axis."""
    b = levels[0][0].shape[0]
    box = jnp.concatenate(
        [yb.reshape(b, -1, 4 * reg_max) for yb, _ in levels], axis=1)
    cls = jnp.concatenate(
        [yc.reshape(b, -1, num_classes) for _, yc in levels], axis=1)
    return box, cls


def _decode(levels, strides, num_classes, reg_max):
    """Flatten per-level (box, cls) NHWC raw preds and decode to
    (B, ΣHW, 4+nc).

    Boxes are xywh in input pixels; class scores sigmoided.
    Semantics of reference src/yolo/heads/detect.py:87-109. The box and
    cls streams stay separate until the final (B, A, 4+nc) concat: slicing
    a concatenated 144-channel tensor back apart (the reference's layout)
    is a lane-misaligned relayout of the whole prediction tensor on TPU.
    """
    feat_shapes = [(yb.shape[1], yb.shape[2]) for yb, _ in levels]
    anchors, stride_col = make_anchors_np(feat_shapes, strides)
    anchors = jnp.asarray(anchors)
    stride_col = jnp.asarray(stride_col)
    box_logits, cls_logits = flatten_pairs(levels, num_classes, reg_max)
    dist = dfl_decode(box_logits, reg_max)
    dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_col[None]
    return jnp.concatenate(
        [dbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32))], axis=-1)


# ---------------------------------------------------------------------------
# DetectDFL
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DetectDFLConfig:
    num_classes: int
    in_channels: tuple[int, ...]
    strides: tuple[float, ...]
    reg_max: int = 16

    def __post_init__(self):
        object.__setattr__(self, "in_channels", tuple(self.in_channels))
        object.__setattr__(self, "strides", tuple(float(s) for s in self.strides))

    @property
    def num_outputs(self) -> int:
        return self.num_classes + self.reg_max * 4


class DetectDFL:
    """Single YOLO DFL head (reference: src/yolo/heads/detect.py:22-127)."""

    Config = DetectDFLConfig

    @staticmethod
    def init(key, cfg: DetectDFLConfig):
        c2, c3 = head_widths(cfg.in_channels[0], cfg.num_classes, cfg.reg_max)
        keys = jax.random.split(key, len(cfg.in_channels))
        towers, tstats = [], []
        for k, ch in zip(keys, cfg.in_channels):
            p, s = _init_tower(k, ch, c2, c3, cfg.num_classes, cfg.reg_max)
            towers.append(p)
            tstats.append(s)
        towers = _bias_init(towers, cfg.strides, cfg.num_classes)
        return {"towers": towers}, {"towers": tstats}

    @staticmethod
    def apply(cfg: DetectDFLConfig, params, stats, feats, *, train=False,
              mode="full"):
        """feats: list of NHWC tensors, one per level.

        Returns (train)        : (list of per-level (box, cls) NHWC pairs,
                                  new_stats)
                (eval)         : ((decoded, raw_levels), new_stats)
                (eval, "split"): ((box_logits, cls_logits), new_stats) —
                    the flat raw streams for lazy-decode NMS
                    (ops/nms.py: non_max_suppression_raw)

        Train keeps the box/cls streams SEPARATE (the loss consumes the
        halves anyway): the reference's concatenated (B, H, W, 144) layout
        pads 144 lanes to 256 in HBM — 1.78x on the largest prediction
        tensors, forward and backward — and re-splitting it is the
        lane-misaligned channel slice the eval decode path already bans.
        Reassembling the reference layout is one jnp.concatenate away
        (scripts/validate_training_parity.py does it host-side).
        YOLO_TPU_TRAIN_PAIRS=0 (read at trace time) restores the
        reference's concatenated train output for A/B measurement; the
        loss accepts both layouts with bit-identical results
        (tests/test_loss.py::test_loss_pairs_match_concat_maps).
        """
        c2, c3 = head_widths(cfg.in_channels[0], cfg.num_classes, cfg.reg_max)
        pairs, ns = [], []
        for i, x in enumerate(feats):
            y, s = _apply_tower(params["towers"][i], stats["towers"][i], x,
                                cfg.in_channels[i], c2, c3, cfg.num_classes,
                                cfg.reg_max, train)
            pairs.append(y)
            ns.append(s)
        new_stats = {"towers": ns}
        if train:
            if os.environ.get("YOLO_TPU_TRAIN_PAIRS", "1") == "0":
                return ([jnp.concatenate([yb, yc], axis=-1)
                         for yb, yc in pairs], new_stats)
            return pairs, new_stats
        if mode == "split":
            return flatten_pairs(pairs, cfg.num_classes, cfg.reg_max), \
                new_stats
        # eval raw keeps the reference's concatenated per-level layout; XLA
        # dead-code-eliminates the concats when the caller only uses decoded.
        raw = [jnp.concatenate([yb, yc], axis=-1) for yb, yc in pairs]
        decoded = _decode(pairs, cfg.strides, cfg.num_classes, cfg.reg_max)
        return (decoded, raw), new_stats


# ---------------------------------------------------------------------------
# DualDetectDFL
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DualDetectDFLConfig:
    num_classes: int
    in_channels: tuple[int, ...]  # first half aux, second half main
    strides: tuple[float, ...]
    reg_max: int = 16

    def __post_init__(self):
        object.__setattr__(self, "in_channels", tuple(self.in_channels))
        object.__setattr__(self, "strides", tuple(float(s) for s in self.strides))

    @property
    def num_levels(self) -> int:
        return len(self.in_channels) // 2

    @property
    def num_outputs(self) -> int:
        return self.num_classes + self.reg_max * 4


class DualDetectDFL:
    """Dual (aux + main) YOLOv9 head (reference: src/yolo/heads/detect.py:130-296).

    Canonical contract: train -> ({"aux": [...], "main": [...]}, stats);
    eval -> (({"aux": dec, "main": dec}, {"aux": raw, "main": raw}), stats).
    """

    Config = DualDetectDFLConfig

    @staticmethod
    def init(key, cfg: DualDetectDFLConfig):
        n = cfg.num_levels
        ch_aux, ch_main = cfg.in_channels[:n], cfg.in_channels[n:]
        c2, c3 = head_widths(ch_aux[0], cfg.num_classes, cfg.reg_max)
        c4, c5 = head_widths(ch_main[0], cfg.num_classes, cfg.reg_max)
        keys = jax.random.split(key, 2 * n)
        aux_p, aux_s, main_p, main_s = [], [], [], []
        for i in range(n):
            p, s = _init_tower(keys[i], ch_aux[i], c2, c3,
                               cfg.num_classes, cfg.reg_max)
            aux_p.append(p)
            aux_s.append(s)
            p, s = _init_tower(keys[n + i], ch_main[i], c4, c5,
                               cfg.num_classes, cfg.reg_max)
            main_p.append(p)
            main_s.append(s)
        aux_p = _bias_init(aux_p, cfg.strides, cfg.num_classes)
        main_p = _bias_init(main_p, cfg.strides, cfg.num_classes)
        return ({"aux": aux_p, "main": main_p},
                {"aux": aux_s, "main": main_s})

    @staticmethod
    def apply(cfg: DualDetectDFLConfig, params, stats, feats, *, train=False,
              mode="full"):
        n = cfg.num_levels
        ch_aux, ch_main = cfg.in_channels[:n], cfg.in_channels[n:]
        c2, c3 = head_widths(ch_aux[0], cfg.num_classes, cfg.reg_max)
        c4, c5 = head_widths(ch_main[0], cfg.num_classes, cfg.reg_max)
        aux_pairs, main_pairs, aux_ns, main_ns = [], [], [], []
        for i in range(n):
            y, s = _apply_tower(params["aux"][i], stats["aux"][i], feats[i],
                                ch_aux[i], c2, c3, cfg.num_classes,
                                cfg.reg_max, train)
            aux_pairs.append(y)
            aux_ns.append(s)
            y, s = _apply_tower(params["main"][i], stats["main"][i],
                                feats[n + i], ch_main[i], c4, c5,
                                cfg.num_classes, cfg.reg_max, train)
            main_pairs.append(y)
            main_ns.append(s)
        new_stats = {"aux": aux_ns, "main": main_ns}
        if train:
            # separate (box, cls) streams — see DetectDFL.apply's note on
            # the 144->256 lane padding of the concatenated layout
            # (YOLO_TPU_TRAIN_PAIRS=0 restores the reference layout)
            if os.environ.get("YOLO_TPU_TRAIN_PAIRS", "1") == "0":
                return ({"aux": [jnp.concatenate([yb, yc], axis=-1)
                                 for yb, yc in aux_pairs],
                         "main": [jnp.concatenate([yb, yc], axis=-1)
                                  for yb, yc in main_pairs]}, new_stats)
            return {"aux": aux_pairs, "main": main_pairs}, new_stats
        if mode == "split":  # serving path: main branch only
            return flatten_pairs(main_pairs, cfg.num_classes, cfg.reg_max), \
                new_stats
        raw = {"aux": [jnp.concatenate([yb, yc], axis=-1) for yb, yc in aux_pairs],
               "main": [jnp.concatenate([yb, yc], axis=-1) for yb, yc in main_pairs]}
        decoded = {
            "aux": _decode(aux_pairs, cfg.strides, cfg.num_classes, cfg.reg_max),
            "main": _decode(main_pairs, cfg.strides, cfg.num_classes, cfg.reg_max),
        }
        return (decoded, raw), new_stats


HEADS = {"DetectDFL": DetectDFL, "DualDetectDFL": DualDetectDFL}
