"""Inference CLI: detect objects in images (reference: scripts/detect.py).

Example:
    python scripts/detect.py --weights weights/gelan-c.npz \\
        --source img.jpg --output out/
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()


def scale_boxes(boxes: np.ndarray, from_shape, to_shape) -> np.ndarray:
    """Undo letterbox: boxes in the padded from_shape canvas -> original
    to_shape pixels (reference: scripts/detect.py:74-109)."""
    gain = min(from_shape[0] / to_shape[0], from_shape[1] / to_shape[1])
    pad_x = (from_shape[1] - to_shape[1] * gain) / 2
    pad_y = (from_shape[0] - to_shape[0] * gain) / 2
    boxes = boxes.copy()
    boxes[:, [0, 2]] = (boxes[:, [0, 2]] - pad_x) / gain
    boxes[:, [1, 3]] = (boxes[:, [1, 3]] - pad_y) / gain
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, to_shape[1])
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, to_shape[0])
    return boxes


def main() -> None:
    ap = argparse.ArgumentParser(description="Run detection on images")
    ap.add_argument("--weights", required=True,
                    help=".npz params (converter or checkpoint output)")
    ap.add_argument("--config", default="configs/models/gelan-c.yaml")
    ap.add_argument("--source", required=True, help="image file or directory")
    ap.add_argument("--output", default="runs/detect")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--classes", type=int, nargs="+", default=None,
                    help="only keep detections of these class indices")
    ap.add_argument("--show", action="store_true",
                    help="display each annotated image (needs a GUI)")
    ap.add_argument("--no-fuse", action="store_true",
                    help="skip BN/RepConv inference fusion")
    ap.add_argument("--allow-extra", action="store_true",
                    help="drop unrecognized keys when ingesting an "
                         "upstream .pt (mirrors convert_weights.py)")
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp

    from yolo_re_tpu import YOLO, nms_to_list, non_max_suppression
    from yolo_re_tpu.convert.torch_import import load_params
    from yolo_re_tpu.data.augment import letterbox
    from yolo_re_tpu.train.checkpoint import load_checkpoint
    from yolo_re_tpu.utils.visualize import draw_boxes

    model = YOLO.from_yaml(args.config, num_classes=args.num_classes)
    if args.weights.endswith(".npz"):
        try:
            params, stats = load_params(args.weights)
        except Exception:
            ckpt = load_checkpoint(args.weights)
            params, stats = ckpt["ema"]["params"], ckpt["ema"]["stats"]
    elif args.weights.endswith((".pt", ".pth")):
        # One-command torch ingestion, like the reference's detect CLI
        # (reference: scripts/detect.py:174-189): a raw upstream yolov9
        # checkpoint, a reference-format state dict, or a reference
        # Trainer checkpoint all convert in-memory — no prior
        # convert_weights.py hop needed.
        from yolo_re_tpu.convert.torch_import import (
            convert_state_dict, is_upstream_state_dict,
            load_torch_checkpoint, upstream_to_reference_sd)

        sd = load_torch_checkpoint(args.weights)
        if is_upstream_state_dict(sd):
            name = Path(args.config).stem
            print(f"upstream yolov9 schema detected; applying the "
                  f"{name} layer map")
            sd = upstream_to_reference_sd(sd, name,
                                          strict=not args.allow_extra)
        params, stats = convert_state_dict(model.plan, sd)
    else:
        raise SystemExit(f"Unsupported weights format: {args.weights}")
    if not args.no_fuse:
        params, stats = model.fuse(params, stats)

    src = Path(args.source)
    paths = sorted(src.glob("*")) if src.is_dir() else [src]
    paths = [p for p in paths
             if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp", ".webp")]
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    times = []
    for path in paths:
        img0 = cv2.imread(str(path))
        if img0 is None:
            print(f"skip unreadable {path}")
            continue
        img, _, _ = letterbox(img0, args.img_size, auto=False)
        x = jnp.asarray(img[None, :, :, ::-1].astype(np.float32) / 255.0)

        t0 = time.perf_counter()
        decoded = model.predict(params, stats, x)[0]
        if isinstance(decoded, dict):
            decoded = decoded["main"]
        out = non_max_suppression(
            decoded, conf_thres=args.conf, iou_thres=args.iou,
            classes=tuple(args.classes) if args.classes else None)
        det = nms_to_list(out)[0]
        dt = (time.perf_counter() - t0) * 1000
        times.append(dt)

        det[:, :4] = scale_boxes(det[:, :4], img.shape[:2], img0.shape[:2])
        vis = draw_boxes(img0, det[:, :4], det[:, 5], det[:, 4])
        out_path = out_dir / path.name
        cv2.imwrite(str(out_path), vis)
        if args.show:
            cv2.imshow(path.name, vis)
            cv2.waitKey(0)
        print(f"{path.name}: {len(det)} detections in {dt:.1f} ms -> {out_path}")

    if times:
        # First call includes compilation; steady-state excludes it.
        steady = times[1:] or times
        print(f"average: {np.mean(steady):.1f} ms/image "
              f"(first call {times[0]:.1f} ms incl. compile)")


if __name__ == "__main__":
    main()
