"""Batched COCO-style validation.

Reference: src/yolo/eval/evaluator.py. Differences for TPU:

- decode + NMS run **on device**, batched and jit-compiled (the reference
  loops per image on the host through torchvision NMS); uint8 batches
  normalize inside the same jit (no eager pre-pass);
- only the fixed-shape (B, max_det, 6) NMS output crosses to the host;
- GT comes from the loader's padded (B, M, 5) targets;
- `mesh=` shards each batch over a device mesh (params replicated,
  batch padded to a device multiple and the padding sliced off on the
  host) so validation during data-parallel training uses every chip
  instead of one — the same GSPMD pattern as serving.Detector(mesh=...).
  The Pallas NMS backend stays available under a mesh: the kernel is
  shard_mapped over the data axis (parallel/spmd.py), so each device
  suppresses its own batch shard.
"""

from __future__ import annotations

import logging
import time

import jax
import numpy as np

from yolo_re_tpu.eval.metrics import compute_map
from yolo_re_tpu.ops.nms import nms_to_list, non_max_suppression

log = logging.getLogger(__name__)


class Evaluator:
    """mAP evaluation over a validation loader.

    conf/iou thresholds match reference evaluator.py:38-39.
    """

    def __init__(
        self,
        model,
        loader,
        num_classes: int | None = None,
        conf_thres: float = 0.001,
        iou_thres: float = 0.6,
        max_det: int = 300,
        compute_dtype: str = "float32",
        debug_dir: str | None = None,
        mesh=None,
    ):
        self.model = model
        self.loader = loader
        self.num_classes = num_classes or model.num_classes
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.max_det = max_det
        self.compute_dtype = compute_dtype
        self.debug_dir = debug_dir
        self.mesh = mesh

        import jax.numpy as jnp

        dtype = (jnp.bfloat16 if compute_dtype == "bfloat16"
                 else jnp.float32)

        @jax.jit
        def _step(params, stats, images):
            """normalize -> forward -> decode -> NMS, one program. Under a
            mesh GSPMD partitions it across the batch axis (the Pallas fast
            paths are shard_mapped per device — parallel/spmd.py); the
            padded-NMS dict is the only thing that crosses back to the
            host."""
            from yolo_re_tpu.parallel.spmd import use_mesh

            with use_mesh(self.mesh):
                if images.dtype == jnp.uint8:
                    x = images.astype(dtype) / 255.0
                else:
                    x = images.astype(dtype)
                # model.apply (not .predict): predict's inner jit caches
                # its traced body on shapes alone, so a program traced
                # under one mesh state could be reused under another;
                # apply re-traces with this outer program every time.
                (decoded, _), _ = self.model.apply(params, stats, x,
                                                   train=False)
                if isinstance(decoded, dict):  # dual head: main branch
                    decoded = decoded["main"]  # (ref: evaluator.py:105-113)
                return non_max_suppression(
                    decoded, conf_thres=self.conf_thres,
                    iou_thres=self.iou_thres, max_det=self.max_det,
                    mesh=self.mesh)

        self._step = _step

    def evaluate(self, params, stats, epoch: int = 0) -> dict[str, float]:
        pred_boxes, pred_scores, pred_classes = [], [], []
        gt_boxes, gt_classes = [], []
        debug: list | None = [] if self.debug_dir else None
        t0 = time.perf_counter()
        n_images = 0

        if self.mesh is not None:
            from yolo_re_tpu.parallel.mesh import (
                batch_sharding,
                replicate_tree,
            )
            params = replicate_tree(params, self.mesh)
            stats = replicate_tree(stats, self.mesh)

        def dispatch(batch):
            """Enqueue one batch on the device; returns (async nms_out,
            batch). jax dispatch is asynchronous, so the device runs this
            batch while the host matches the PREVIOUS one — the serialized
            dispatch->fetch->match loop paid one idle device gap (plus a
            full tunnel round trip on this host) per batch."""
            images = np.asarray(batch["images"])
            if self.mesh is not None:
                b = images.shape[0]
                n = self.mesh.size
                gb = -(-b // n) * n
                if gb != b:  # pad for divisibility; sliced off below
                    images = np.concatenate(
                        [images, np.zeros((gb - b, *images.shape[1:]),
                                          images.dtype)])
                images = jax.device_put(images, batch_sharding(self.mesh))
            return self._step(params, stats, images), batch

        import os
        from collections import deque

        # Pipeline depth: how many dispatched batches stay in flight while
        # the host matches older ones. YOLO_TPU_EVAL_PREFETCH=0 restores
        # the fully serialized dispatch->fetch->match loop (A/B knob).
        depth = int(os.environ.get("YOLO_TPU_EVAL_PREFETCH", "2"))

        def collect(item) -> int:
            nms_out, batch = item
            self._collect(nms_out, batch, pred_boxes, pred_scores,
                          pred_classes, gt_boxes, gt_classes, debug)
            return np.asarray(batch["images"]).shape[0]

        pending: deque = deque()
        for batch in self.loader:
            pending.append(dispatch(batch))
            while len(pending) > depth:
                n_images += collect(pending.popleft())
        while pending:
            n_images += collect(pending.popleft())

        if debug:
            # First ~10 GT-bearing images, GT red / top-20 preds green, in a
            # per-epoch directory (reference: eval/evaluator.py:164-196).
            from yolo_re_tpu.utils.visualize import save_debug_images

            save_debug_images(
                np.concatenate([d[0] for d in debug]),
                [det for d in debug for det in d[1]],
                np.concatenate([d[2] for d in debug]),
                np.concatenate([d[3] for d in debug]),
                f"{self.debug_dir}/epoch{epoch}")

        results = compute_map(pred_boxes, pred_scores, pred_classes,
                              gt_boxes, gt_classes, self.num_classes)
        dt = time.perf_counter() - t0
        results["images_per_sec"] = n_images / max(dt, 1e-9)
        log.info("eval: %d images in %.1fs | mAP50 %.4f mAP75 %.4f mAP %.4f",
                 n_images, dt, results["map50"], results["map75"],
                 results["map"])
        return results

    def _collect(self, nms_out, batch, pred_boxes, pred_scores,
                 pred_classes, gt_boxes, gt_classes, debug) -> None:
        """Fetch one dispatched batch's padded NMS output and fold it into
        the host-side accumulators (the only device->host sync point)."""
        images = np.asarray(batch["images"])
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        dets = nms_to_list(nms_out)[:b]

        targets = np.asarray(batch["targets"])
        nboxes = np.asarray(batch["nboxes"])
        for i in range(b):
            det = dets[i]
            pred_boxes.append(det[:, :4])
            pred_scores.append(det[:, 4])
            pred_classes.append(det[:, 5].astype(np.int64))

            n = int(nboxes[i])
            t = targets[i, :n]
            if n:
                cx, cy, bw, bh = (t[:, 1] * w, t[:, 2] * h,
                                  t[:, 3] * w, t[:, 4] * h)
                boxes = np.stack([cx - bw / 2, cy - bh / 2,
                                  cx + bw / 2, cy + bh / 2], axis=1)
                gt_boxes.append(boxes.astype(np.float32))
                gt_classes.append(t[:, 0].astype(np.int64))
            else:
                gt_boxes.append(np.zeros((0, 4), np.float32))
                gt_classes.append(np.zeros((0,), np.int64))
        if (debug is not None
                and (nboxes > 0).any()  # only batches with GT are usable
                and sum(int((d[3] > 0).sum()) for d in debug) < 10):
            host = images[:b].astype(np.float32)
            if images.dtype == np.uint8:
                host = host / 255.0
            if not debug or debug[0][0].shape[1:] == host.shape[1:]:
                debug.append((host, dets, targets, nboxes))
