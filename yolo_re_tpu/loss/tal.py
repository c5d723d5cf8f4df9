"""Task-Aligned Loss — fixed-shape, jit-compiled training objective.

Reference: src/yolo/loss/tal.py + src/yolo/loss/bbox.py. The torch version
uses `masked_select` (dynamic shapes) and python-loop target preprocessing
(tal.py:287-313); here everything is a masked reduction over padded
(B, max_boxes, ...) targets so the whole loss traces into the train step.

Target contract: the data pipeline supplies `targets` of shape (B, M, 5) as
(class, x, y, w, h) with xywh normalized to [0, 1]; padding rows are all
zero (w == h == 0 marks invalid — the same validity rule the reference's
`mask_gt = gt_bboxes.sum(2) > 0` applies).

Dual-head: aux branch weighted 0.25 (reference: tal.py:252-266), with the
canonical {"aux": ..., "main": ...} contract fixing SURVEY §2.4.1.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from yolo_re_tpu.loss.assigner import TaskAlignedAssigner
from yolo_re_tpu.ops.boxes import (
    bbox2dist,
    bbox_iou,
    dist2bbox,
    make_anchors_np,
    xywh2xyxy,
)


@dataclass
class LossConfig:
    """Reference: src/yolo/loss/tal.py:15-26."""

    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    cls_pw: float = 1.0


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits, numerically stable (== torch's).

    Math runs in f32 regardless of the logits' storage dtype — the cast
    fuses into the read, so bf16 streams cost half the bandwidth without
    changing the softplus numerics.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_sig = -jax.nn.softplus(-logits)
    log_one_minus = -jax.nn.softplus(logits)
    return -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus)


def df_loss(pred_dist, target, reg_max_minus1: int):
    """Distribution Focal Loss (reference: src/yolo/loss/bbox.py:102-124).

    pred_dist (..., 4, reg_max) logits; target (..., 4) continuous in
    [0, reg_max-1]. CE against the two nearest bins, linearly weighted;
    mean over the 4 coords.
    """
    tl = target.astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist.astype(jnp.float32), axis=-1)
    nbins = reg_max_minus1 + 1
    # Select the two neighboring bins with a dense one-hot weight vector
    # instead of take_along_axis: per-element gathers over the 16-wide
    # minor dim are pathologically slow on TPU (they dominated the whole
    # loss), while this is one fused elementwise+reduce pass. Exact same
    # selected values (the other bins contribute exact zeros).
    bins = jnp.arange(nbins, dtype=jnp.int32)
    w = (wl[..., None] * (bins == jnp.clip(tl, 0, nbins - 1)[..., None])
         + wr[..., None] * (bins == jnp.clip(tr, 0, nbins - 1)[..., None]))
    return -(logp * w).sum(axis=-1).mean(axis=-1)


class TALoss:
    """CIoU + BCE + DFL with task-aligned assignment.

    __call__(preds, targets) -> (total_loss, loss_items[box, cls, dfl]).
    preds: list of per-level NHWC raw maps (single head) or
           {"aux": [...], "main": [...]} (dual head).
    """

    def __init__(self, num_classes: int, reg_max: int, strides,
                 config: LossConfig | None = None):
        self.num_classes = num_classes
        self.reg_max = reg_max
        self.strides = [float(s) for s in strides]
        self.config = config or LossConfig()
        self.no = reg_max * 4 + num_classes
        self.assigner = TaskAlignedAssigner(
            topk=self.config.tal_topk, num_classes=num_classes,
            alpha=self.config.tal_alpha, beta=self.config.tal_beta)

    # -- helpers -----------------------------------------------------------

    def _flatten(self, feats):
        """Per-level preds -> (B, A, 4*reg_max) distri + (B, A, nc) scores.

        feats is either the head's native list of (box, cls) NHWC pairs
        (lane-aligned: the streams never pass through a concatenated
        144-channel tensor, whose T(8,128) padding costs 1.78x HBM and
        whose re-split is a lane-misaligned relayout) or the reference's
        concatenated (B, H, W, no) maps (accepted for external callers /
        parity harnesses; same values, re-associated).

        Streams are f32 even in bf16 training. A bf16-stream variant
        (storage dtype kept, math in f32 via fused casts) was measured
        2026-08 on v5e and REVERTED: TAL fwd got SLOWER (7.49 -> 8.01 ms)
        and fwd+bwd was a wash (8.99 -> 8.78) — the loss is not
        bandwidth-bound on these streams, and the per-consumer casts add
        VPU work to already-fused loops. The downstream f32 casts in
        bce_with_logits/df_loss/_decode are kept (no-ops for f32) so the
        math stays f32 under any future stream dtype.
        """
        if isinstance(feats[0], (tuple, list)):
            b = feats[0][0].shape[0]
            box = jnp.concatenate(
                [yb.reshape(b, -1, self.reg_max * 4).astype(jnp.float32)
                 for yb, _ in feats], axis=1)
            cls = jnp.concatenate(
                [yc.reshape(b, -1, self.num_classes).astype(jnp.float32)
                 for _, yc in feats], axis=1)
            return box, cls
        b = feats[0].shape[0]
        flat = jnp.concatenate(
            [x.reshape(b, -1, self.no).astype(jnp.float32) for x in feats],
            axis=1)
        return flat[..., :self.reg_max * 4], flat[..., self.reg_max * 4:]

    @staticmethod
    def _nhwc(level):
        """A level's representative NHWC tensor ((box, cls) pair or map)."""
        return level[0] if isinstance(level, (tuple, list)) else level

    def _anchors(self, feats):
        shapes = [(self._nhwc(x).shape[1], self._nhwc(x).shape[2])
                  for x in feats]
        anchors, stride_col = make_anchors_np(shapes, self.strides)
        return jnp.asarray(anchors), jnp.asarray(stride_col)

    def _decode(self, anchor_points, pred_dist):
        """(B, A, 4*reg_max) logits -> (B, A, 4) xyxy in grid units
        (reference: tal.py:315-320)."""
        b, a, c = pred_dist.shape
        p = jax.nn.softmax(
            pred_dist.astype(jnp.float32).reshape(b, a, 4, c // 4), axis=-1)
        proj = jnp.arange(self.reg_max, dtype=jnp.float32)
        dist = jnp.einsum("bamr,r->bam", p, proj,
                          precision=jax.lax.Precision.HIGHEST)
        return dist2bbox(dist, anchor_points, xywh=False)

    def _prepare_targets(self, targets, img_h, img_w):
        """(B, M, 5) normalized (cls, xywh) -> labels, xyxy px boxes, mask."""
        gt_labels = targets[..., :1]
        scale = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
        gt_bboxes = xywh2xyxy(targets[..., 1:5] * scale)
        mask_gt = (targets[..., 3:4] > 0) & (targets[..., 4:5] > 0)
        gt_bboxes = gt_bboxes * mask_gt  # zero out padding rows
        return gt_labels, gt_bboxes, mask_gt

    def _branch_losses(self, feats, gt_labels, gt_bboxes, mask_gt,
                       anchor_points, stride_col):
        """Compute (iou_loss, cls_loss, dfl_loss) for one prediction branch."""
        pred_distri, pred_scores = self._flatten(feats)
        pred_bboxes = self._decode(anchor_points, pred_distri)  # grid units

        target_labels, target_bboxes, target_scores, fg_mask = self.assigner(
            jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes) * stride_col[None],
            anchor_points * stride_col,
            gt_labels, gt_bboxes, mask_gt,
        )
        target_bboxes = target_bboxes / stride_col[None]
        tss = jnp.maximum(target_scores.sum(), 1.0)

        cls_loss = bce_with_logits(pred_scores, target_scores,
                                   self.config.cls_pw).sum() / tss

        fg = fg_mask.astype(jnp.float32)                      # (B, A)
        weight = target_scores.sum(-1) * fg                   # (B, A)
        iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False,
                       iou_type="ciou")[..., 0]               # (B, A)
        iou_loss = ((1.0 - iou) * weight).sum() / tss

        target_ltrb = bbox2dist(anchor_points, target_bboxes,
                                self.reg_max - 1)             # (B, A, 4)
        b, a, _ = pred_distri.shape
        dist_logits = pred_distri.reshape(b, a, 4, self.reg_max)
        dfl = df_loss(dist_logits, target_ltrb, self.reg_max - 1)  # (B, A)
        dfl_loss = (dfl * weight).sum() / tss

        return iou_loss, cls_loss, dfl_loss

    # -- entry points --------------------------------------------------------

    def __call__(self, preds, targets):
        if isinstance(preds, dict):
            return self.forward_dual(preds, targets)
        return self.forward_single(preds, targets)

    def forward_single(self, feats, targets):
        """feats: list of per-level NHWC raw maps
        (reference: tal.py:135-190)."""
        f0 = self._nhwc(feats[0])
        h, w = f0.shape[1], f0.shape[2]
        img_h, img_w = h * self.strides[0], w * self.strides[0]
        anchor_points, stride_col = self._anchors(feats)
        gt_labels, gt_bboxes, mask_gt = self._prepare_targets(
            targets, img_h, img_w)

        iou_l, cls_l, dfl_l = self._branch_losses(
            feats, gt_labels, gt_bboxes, mask_gt, anchor_points, stride_col)

        loss = jnp.stack([iou_l * self.config.box_gain,
                          cls_l * self.config.cls_gain,
                          dfl_l * self.config.dfl_gain])
        batch_size = self._nhwc(feats[0]).shape[0]
        return loss.sum() * batch_size, jax.lax.stop_gradient(loss)

    def forward_dual(self, preds, targets):
        """preds: {"aux": [...], "main": [...]}; aux weighted 0.25
        (reference: tal.py:192-285)."""
        feats_aux, feats_main = preds["aux"], preds["main"]
        fm0 = self._nhwc(feats_main[0])
        h, w = fm0.shape[1], fm0.shape[2]
        img_h, img_w = h * self.strides[0], w * self.strides[0]
        anchor_points, stride_col = self._anchors(feats_main)
        gt_labels, gt_bboxes, mask_gt = self._prepare_targets(
            targets, img_h, img_w)

        iou_a, cls_a, dfl_a = self._branch_losses(
            feats_aux, gt_labels, gt_bboxes, mask_gt, anchor_points, stride_col)
        iou_m, cls_m, dfl_m = self._branch_losses(
            feats_main, gt_labels, gt_bboxes, mask_gt, anchor_points, stride_col)

        loss = jnp.stack([
            (iou_a * 0.25 + iou_m) * self.config.box_gain,
            (cls_a * 0.25 + cls_m) * self.config.cls_gain,
            (dfl_a * 0.25 + dfl_m) * self.config.dfl_gain,
        ])
        batch_size = self._nhwc(feats_main[0]).shape[0]
        return loss.sum() * batch_size, jax.lax.stop_gradient(loss)


def pad_targets(labels_list, max_boxes: int | None = None):
    """Host-side: list of per-image (n, 5) [cls, xywhn] -> (B, M, 5) padded.

    Replaces the reference's in-loss python-loop `_preprocess`
    (tal.py:287-313) — padding happens once in the data pipeline, keeping
    the loss fully static.
    """
    import numpy as np

    if max_boxes is None:
        max_boxes = max((len(l) for l in labels_list), default=1)
    max_boxes = max(max_boxes, 1)
    out = np.zeros((len(labels_list), max_boxes, 5), np.float32)
    for i, lab in enumerate(labels_list):
        n = min(len(lab), max_boxes)
        if n:
            out[i, :n] = lab[:n]
    return out
