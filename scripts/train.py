"""Training CLI (reference: scripts/train.py).

Example:
    python scripts/train.py --data /data/coco128/images/train \\
        --val /data/coco128/images/val --epochs 10 --batch 16
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()


def main() -> None:
    ap = argparse.ArgumentParser(description="Train a YOLO model on TPU")
    ap.add_argument("--data", required=True, help="train images dir or list")
    ap.add_argument("--val", default=None, help="val images dir or list")
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--config", default="configs/models/gelan-c.yaml")
    ap.add_argument("--weights", default=None, help=".npz params to load")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--augment", default="full",
                    choices=["full", "light", "minimal"])
    ap.add_argument("--val-period", type=int, default=1)
    ap.add_argument("--output", default="runs/train")
    ap.add_argument("--resume", default=None, help="checkpoint to resume")
    ap.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    ap.add_argument("--device-augment", default=None,
                    choices=["basic", "full"],
                    help="run augmentation on device: 'basic' = HSV/flip, "
                         "'full' = also mosaic/zoom/mixup (host only "
                         "decodes + letterboxes)")
    ap.add_argument("--no-dp", action="store_true",
                    help="disable data parallelism")
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator host:port (launch one "
                         "process per host with --num-processes and a "
                         "distinct --process-id; on TPU pods the runtime "
                         "auto-detects and these can be omitted)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.coordinator or args.num_processes:
        from yolo_re_tpu.parallel.mesh import init_distributed

        pi, pc = init_distributed(args.coordinator, args.num_processes,
                                  args.process_id)
        print(f"multi-host: process {pi}/{pc}")

    from yolo_re_tpu import AugmentConfig, DataConfig, Trainer, YOLO
    from yolo_re_tpu.convert.torch_import import load_params

    model = YOLO.from_yaml(args.config, num_classes=args.num_classes)
    params = stats = None
    if args.weights:
        params, stats = load_params(args.weights)

    data = DataConfig(
        train_path=args.data,
        val_path=args.val,
        num_classes=args.num_classes,
        img_size=args.img_size,
        batch_size=args.batch,
        workers=args.workers,
        augment=AugmentConfig(args.augment),
    )
    trainer = Trainer(
        model, data=data,
        params=params, stats=stats,
        epochs=args.epochs,
        lr=args.lr,
        val_period=args.val_period,
        output_dir=args.output,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        data_parallel=not args.no_dp,
        device_augment={"basic": True, "full": "full",
                        None: False}[args.device_augment],
    )
    if args.resume:
        trainer.load_checkpoint(args.resume)
    results = trainer.train()
    print("final:", results)


if __name__ == "__main__":
    main()
