"""Task-Aligned Assigner — fixed-shape, fully vectorized, jit-compiled.

Reference: src/yolo/loss/assigner.py (TOOD assigner, arXiv 2108.07755).
The torch version branches on data (`if fg_mask.max() > 1`), uses
`F.one_hot` scatter tricks and runs under `no_grad`. Here every step is a
static masked computation over padded GT (B, M, ...) so the whole assigner
lives inside the jitted train step; `stop_gradient` replaces `no_grad`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_re_tpu.ops.boxes import bbox_iou


def select_candidates_in_gts(xy_centers: jax.Array, gt_bboxes: jax.Array,
                             eps: float = 1e-9) -> jax.Array:
    """Anchor centers strictly inside GT boxes (reference: assigner.py:13-30).

    xy_centers (A, 2); gt_bboxes (B, M, 4) xyxy -> bool (B, M, A).
    """
    lt = gt_bboxes[..., None, :2]      # (B, M, 1, 2)
    rb = gt_bboxes[..., None, 2:]      # (B, M, 1, 2)
    deltas = jnp.concatenate(
        [xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1)
    return jnp.min(deltas, axis=-1) > eps


def select_highest_overlaps(mask_pos: jax.Array, overlaps: jax.Array):
    """Resolve anchors claimed by multiple GTs via max IoU
    (reference: assigner.py:33-57). Always applied — a no-op when no
    anchor is multi-claimed, so no data-dependent branch is needed.

    Returns (target_gt_idx (B, A), fg_mask (B, A), mask_pos (B, M, A)).
    """
    n_max_boxes = mask_pos.shape[1]
    fg_mask = mask_pos.sum(axis=-2)                      # (B, A)
    mask_multi = (fg_mask[:, None, :] > 1)               # (B, 1, A) -> bcast
    max_overlaps_idx = jnp.argmax(overlaps, axis=1)      # (B, A)
    is_max = jax.nn.one_hot(max_overlaps_idx, n_max_boxes,
                            dtype=overlaps.dtype)        # (B, A, M)
    is_max = jnp.swapaxes(is_max, 1, 2)                  # (B, M, A)
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(axis=-2)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)        # (B, A)
    return target_gt_idx, fg_mask, mask_pos


class TaskAlignedAssigner:
    """Align-metric (score^α · IoU^β) top-k assignment."""

    def __init__(self, topk: int = 10, num_classes: int = 80,
                 alpha: float = 0.5, beta: float = 6.0, eps: float = 1e-9):
        self.topk = topk
        self.num_classes = num_classes
        self.bg_idx = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels,
                 gt_bboxes, mask_gt):
        """All inputs are stop-gradiented; shapes:
            pd_scores (B, A, nc) sigmoided, pd_bboxes (B, A, 4) xyxy px,
            anc_points (A, 2) px, gt_labels (B, M, 1), gt_bboxes (B, M, 4),
            mask_gt (B, M, 1) float/bool.

        Returns (target_labels (B,A), target_bboxes (B,A,4),
                 target_scores (B,A,nc), fg_mask (B,A) bool).
        """
        pd_scores = jax.lax.stop_gradient(pd_scores)
        pd_bboxes = jax.lax.stop_gradient(pd_bboxes)
        bs, n_anchors, _ = pd_scores.shape
        n_max_boxes = gt_bboxes.shape[1]
        mask_gt_f = mask_gt.astype(jnp.float32)

        if n_max_boxes == 0:
            return (
                jnp.full((bs, n_anchors), self.bg_idx, jnp.int32),
                jnp.zeros_like(pd_bboxes),
                jnp.zeros_like(pd_scores),
                jnp.zeros((bs, n_anchors), bool),
            )

        mask_pos, align_metric, overlaps = self._get_pos_mask(
            pd_scores, pd_bboxes, gt_labels, gt_bboxes, anc_points, mask_gt_f)

        target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(
            mask_pos, overlaps)

        target_labels, target_bboxes, target_scores = self._get_targets(
            gt_labels, gt_bboxes, target_gt_idx, fg_mask)

        # Normalize soft targets by per-GT best align metric scaled by best
        # overlap (reference: assigner.py:135-141).
        align_metric = align_metric * mask_pos
        pos_align = jnp.max(align_metric, axis=-1, keepdims=True)
        pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
        norm = jnp.max(align_metric * pos_overlaps / (pos_align + self.eps),
                       axis=-2)[..., None]                      # (B, A, 1)
        target_scores = target_scores * norm

        return target_labels, target_bboxes, target_scores, fg_mask > 0

    def _get_pos_mask(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes,
                      anc_points, mask_gt):
        align_metric, overlaps = self._get_box_metrics(
            pd_scores, pd_bboxes, gt_labels, gt_bboxes)
        mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)
        mask_in_gts_f = mask_in_gts.astype(jnp.float32)
        mask_topk = self._select_topk(align_metric * mask_in_gts_f,
                                      mask_gt[..., 0])
        mask_pos = mask_topk * mask_in_gts_f * mask_gt
        return mask_pos, align_metric, overlaps

    def _get_box_metrics(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes):
        """align = score[gt_class]^α · CIoU^β (reference: assigner.py:160-184)."""
        labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, None)  # (B, M)
        # scores per (gt, anchor): gather class channel per GT
        scores_t = jnp.swapaxes(pd_scores, 1, 2)              # (B, nc, A)
        # (B, M, A) is small — do the align-metric math in f32 even when
        # the score stream arrives bf16 (loss/tal.py keeps prediction
        # streams in their storage dtype; the cast fuses into the gather)
        bbox_scores = jnp.take_along_axis(
            scores_t, labels[:, :, None], axis=1).astype(jnp.float32)
        overlaps = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :],
                            xywh=False, iou_type="ciou")[..., 0]
        overlaps = jnp.clip(overlaps, 0.0, None)              # (B, M, A)
        align = jnp.power(bbox_scores, self.alpha) * jnp.power(overlaps, self.beta)
        return align, overlaps

    def _select_topk(self, metrics, valid_gt):
        """Top-k anchor candidates per GT as a {0,1} mask (B, M, A).

        Equivalent to reference assigner.py:187-199: indices of invalid GT
        rows contribute nothing (they scatter 0), and top_k never returns
        duplicates, so the `count > 1 -> 0` rule reduces to masking.
        """
        # Threshold against the k-th largest value instead of scattering
        # (TPU scatters serialize) or materializing a (B, M, k, A) one-hot
        # (1.4 GB of traffic at M=128): an anchor is a candidate iff its
        # metric is >= the k-th value AND positive. Zero-metric anchors are
        # excluded — the reference's top_k can pick them when a GT has
        # fewer than k positive candidates, but they are always filtered by
        # mask_in_gts downstream (metrics here are pre-multiplied by it).
        #
        # The k-th value comes from k-1 max-and-mask passes, NOT lax.top_k:
        # top_k lowers to a full sort over the anchor axis (34 ms at
        # M=128/A=8400 vs 7 ms for the passes — top_k was most of the
        # assigner's cost). A pass removes every entry tied at the current
        # max; metrics are continuous products of sigmoids and IoU powers,
        # so positive ties have measure zero, and all-zero (padding) rows
        # just drive kth to -inf, where the `metrics > 0` term keeps the
        # mask correct.
        def drop_max(_, cur):
            m = cur.max(-1, keepdims=True)
            return jnp.where(cur >= m, -jnp.inf, cur)

        remaining = jax.lax.fori_loop(0, self.topk - 1, drop_max, metrics)
        kth = remaining.max(-1, keepdims=True)                 # (B, M, 1)
        mask = (metrics >= kth) & (metrics > 0) \
            & (valid_gt[..., None] > 0)
        return mask.astype(jnp.float32)

    def _get_targets(self, gt_labels, gt_bboxes, target_gt_idx, fg_mask):
        """Gather per-anchor targets (reference: assigner.py:195-214)."""
        labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, None)  # (B, M)
        target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
        target_bboxes = jnp.take_along_axis(
            gt_bboxes, target_gt_idx[..., None], axis=1)
        one_hot = jax.nn.one_hot(target_labels, self.num_classes,
                                 dtype=jnp.float32)
        target_scores = one_hot * (fg_mask > 0)[..., None]
        return target_labels, target_bboxes, target_scores
