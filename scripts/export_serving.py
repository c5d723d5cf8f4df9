"""Export the whole serving pipeline as a deployable StableHLO artifact.

The TPU-native analogue of shipping the reference's pickled .pt model
(reference: scripts/detect.py:174-189 loads either): one self-contained
file holding the full pixels-to-detections program (device letterbox ->
fused bf16 forward -> NMS) with the weights baked in as constants —
loadable with `Detector.load_exported(path)` (or jax.export directly)
on any host with jax, no model code or checkpoint needed.

Example:
    python scripts/export_serving.py --weights best.npz \\
        --config configs/models/gelan-c.yaml --batch 8 \\
        --out gelan-c.stablehlo --platforms tpu cpu

Trade-off: a multi-platform request (or one targeting a platform other
than the exporting host's) drops the Pallas ADown fast path from the
traced program — Mosaic custom calls only lower on TPU. Export with
`--platforms tpu` ON a TPU host to keep the kernel in the artifact.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Serialize the pixels-to-detections program")
    ap.add_argument("--weights", required=True,
                    help=".npz params (converter or checkpoint output)")
    ap.add_argument("--config", default="configs/models/gelan-c.yaml")
    ap.add_argument("--out", required=True, help="output artifact path")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--height", type=int, default=None,
                    help="input height (default: --img-size)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--max-det", type=int, default=300)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--platforms", nargs="+", default=None,
                    help="lowering platforms to embed, e.g. tpu cpu "
                         "(default: current backend)")
    ap.add_argument("--verify", action="store_true",
                    help="reload the artifact and check it against the "
                         "live pipeline on random input")
    args = ap.parse_args()

    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.serving import Detector

    model = YOLO.from_yaml(args.config, num_classes=args.num_classes)
    det = Detector.from_checkpoint(
        model, args.weights, img_size=args.img_size, conf_thres=args.conf,
        iou_thres=args.iou, max_det=args.max_det, compute_dtype=args.dtype)
    det.export(args.out, args.batch, height=args.height, width=args.width,
               platforms=tuple(args.platforms) if args.platforms else None)
    size_mb = os.path.getsize(args.out) / 1e6
    h = args.height or args.img_size
    w = args.width or args.img_size
    print(f"wrote {args.out} ({size_mb:.1f} MB): "
          f"({args.batch}, {h}, {w}, 3) uint8 -> padded NMS dict")

    if args.verify:
        import numpy as np

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (args.batch, h, w, 3), dtype=np.uint8)
        live = det(frames)
        run = Detector.load_exported(args.out)
        loaded = run(frames)
        for k in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_allclose(np.asarray(live[k]),
                                       np.asarray(loaded[k]),
                                       rtol=1e-5, atol=1e-5)
        print("verify: artifact output matches live pipeline")


if __name__ == "__main__":
    main()
