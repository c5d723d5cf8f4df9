"""Box geometry: conversions, IoU family, anchor generation, DFL decode.

Consolidates the reference's duplicated utilities (SURVEY §2.4.4:
make_anchors in heads/anchor.py + loss/tal.py; dist2bbox in heads/anchor.py +
loss/bbox.py; xywh2xyxy in loss/tal.py + utils/nms.py; box_iou in
eval/metrics.py + utils/nms.py) into one module.

Everything here is shape-static and jit-friendly. Anchors are built
host-side (numpy) from static feature shapes — no dummy forward pass needed
(unlike reference model/model.py:109-163).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Format conversions
# ---------------------------------------------------------------------------

def xywh2xyxy(x: jax.Array) -> jax.Array:
    """(cx, cy, w, h) -> (x1, y1, x2, y2), last-dim layout."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def dist2bbox(distance: jax.Array, anchor_points: jax.Array, xywh: bool = True) -> jax.Array:
    """ltrb distances -> boxes (reference: src/yolo/heads/anchor.py:43-64)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(anchor_points: jax.Array, bbox: jax.Array, reg_max: int) -> jax.Array:
    """xyxy boxes -> ltrb distances, clamped to [0, reg_max - 0.01]
    (reference: src/yolo/loss/bbox.py:34-46)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    d = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(d, 0.0, reg_max - 0.01)


# ---------------------------------------------------------------------------
# Anchors
# ---------------------------------------------------------------------------

def make_anchors_np(
    feat_shapes: list[tuple[int, int]],
    strides: list[int] | list[float],
    grid_cell_offset: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Anchor grid centers from static feature shapes, host-side.

    Returns (anchor_points (ΣHW, 2) xy, stride_tensor (ΣHW, 1)).
    Semantics of reference src/yolo/heads/anchor.py:10-40 but with no device
    work: shapes are static under XLA, so this runs once at trace time.
    """
    points, stride_col = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = np.arange(w, dtype=np.float32) + grid_cell_offset
        sy = np.arange(h, dtype=np.float32) + grid_cell_offset
        gx, gy = np.meshgrid(sx, sy)  # gx varies along columns
        points.append(np.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_col.append(np.full((h * w, 1), s, dtype=np.float32))
    return np.concatenate(points), np.concatenate(stride_col)


# ---------------------------------------------------------------------------
# DFL decode
# ---------------------------------------------------------------------------

def dfl_decode(box_logits: jax.Array, reg_max: int = 16) -> jax.Array:
    """Distribution -> expectation decode (reference: src/yolo/heads/dfl.py).

    Args:
        box_logits: (..., 4*reg_max) logits.
    Returns:
        (..., 4) expected bin values in [0, reg_max-1].
    """
    x = box_logits.astype(jnp.float32)
    n_sides = x.shape[-1] // reg_max  # 4

    # Layout note: splitting the channel dim into (4, reg_max) puts the
    # 16-wide bin axis on the 128-lane minor dimension — every elementwise
    # op then runs at 1/8 lane utilization, and this decode measurably
    # drags inference throughput. Instead: keep the 4*reg_max channels on
    # the minor dim, exp once (any per-anchor constant shift cancels in
    # the per-side num/den ratio below, so one global max suffices for
    # stability; the clip guards sides far below that max), and compute
    # all four expectations with one block-diagonal projection matmul:
    # columns [0, n) are per-side bin values, columns [n, 2n) per-side
    # normalizers.
    u = jnp.exp(jnp.clip(x - jnp.max(x, axis=-1, keepdims=True), -60.0, None))
    p = np.zeros((n_sides * reg_max, 2 * n_sides), np.float32)
    for g in range(n_sides):
        p[g * reg_max:(g + 1) * reg_max, g] = np.arange(reg_max)
        p[g * reg_max:(g + 1) * reg_max, n_sides + g] = 1.0
    nd = jnp.matmul(u, jnp.asarray(p), precision=jax.lax.Precision.HIGHEST)
    return nd[..., :n_sides] / nd[..., n_sides:]


# ---------------------------------------------------------------------------
# IoU family
# ---------------------------------------------------------------------------

def box_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise IoU matrix (N, M), xyxy (reference: src/yolo/eval/metrics.py:10-29)."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union


def bbox_iou(
    box1: jax.Array,
    box2: jax.Array,
    *,
    xywh: bool = False,
    iou_type: str = "iou",
    eps: float = 1e-7,
) -> jax.Array:
    """Elementwise (broadcasting) IoU / GIoU / DIoU / CIoU on (..., 4) boxes.

    Matches reference src/yolo/loss/iou.py:21-76 numerics, including the
    eps placement quirks (h gets +eps in xyxy mode, w does not) and the
    stop-gradient on the CIoU aspect-ratio alpha.
    Returns (..., 1).
    """
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, -1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, -1)
        b1_x1, b1_x2 = x1 - w1 / 2, x1 + w1 / 2
        b1_y1, b1_y2 = y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2 = x2 - w2 / 2, x2 + w2 / 2
        b2_y1, b2_y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, -1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, -1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * \
        jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None)

    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if iou_type in ("ciou", "diou", "giou"):
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if iou_type in ("ciou", "diou"):
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
                    + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if iou_type == "ciou":
                v = (4 / math.pi**2) * jnp.square(
                    jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1))
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area

    return iou
