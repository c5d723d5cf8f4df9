"""Standalone validation CLI: mAP of a checkpoint on a dataset.

The reference exposes evaluation through Trainer.validate() and the Modal
launcher's remote eval of pretrained weights (reference:
scripts/train_modal.py:392-447); this is the local, direct equivalent.

Example:
    python scripts/val.py --weights weights/gelan-c.npz \\
        --data data/coco128/images/train --num-classes 80
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()


def main() -> None:
    ap = argparse.ArgumentParser(description="Evaluate a checkpoint (mAP)")
    ap.add_argument("--weights", required=True,
                    help=".npz params (converter or checkpoint output)")
    ap.add_argument("--config", default="configs/models/gelan-c.yaml")
    ap.add_argument("--data", required=True, help="val images dir or list")
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou", type=float, default=0.6)
    ap.add_argument("--rect", action="store_true",
                    help="aspect-ratio-bucketed val batches")
    ap.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    ap.add_argument("--fuse", action="store_true",
                    help="fold BN/RepConv (and enable the Pallas fast "
                         "paths) before evaluating — ~2x faster, decode "
                         "drift vs the unfused reference graph <= ~1e-3")
    ap.add_argument("--debug-dir", default=None,
                    help="dump GT/pred overlay images here")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each val batch over all local devices")
    args = ap.parse_args()

    from yolo_re_tpu import YOLO
    from yolo_re_tpu.data.config import DataConfig
    from yolo_re_tpu.data.dataset import create_dataloader
    from yolo_re_tpu.eval.evaluator import Evaluator
    from yolo_re_tpu.train.checkpoint import load_weights

    model = YOLO.from_yaml(args.config, num_classes=args.num_classes)
    params, stats = load_weights(args.weights)
    if args.fuse:
        params, stats = model.fuse(params, stats)

    mesh = None
    if args.data_parallel:
        from yolo_re_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        # the fused Pallas fast paths stay in the sharded program: every
        # kernel is shard_mapped over the data axis (parallel/spmd.py)

    data = DataConfig(
        train_path=args.data, val_path=args.data,
        num_classes=args.num_classes, img_size=args.img_size,
        batch_size=args.batch, workers=args.workers, rect=args.rect,
    )
    loader = create_dataloader(args.data, data, mode="val")
    evaluator = Evaluator(
        model, loader, num_classes=args.num_classes,
        conf_thres=args.conf, iou_thres=args.iou,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        debug_dir=args.debug_dir, mesh=mesh,
    )
    results = evaluator.evaluate(params, stats)
    print(" ".join(f"{k}={v:.4f}" for k, v in results.items()))


if __name__ == "__main__":
    main()
