"""End-to-end evaluation parity: our Evaluator vs the torch reference's.

BASELINE.md config #2 asks for mAP50-95 parity within 0.1 on COCO128; this
host has no network egress, so the harness builds a synthetic detection
dataset (color-coded boxes, one color per class), trains a small model
briefly with our Trainer, exports the weights into the reference's torch
format (convert/torch_export.py), and then runs BOTH full evaluation
stacks — reference: data loader -> forward -> NMS -> compute_map
(src/yolo/eval/evaluator.py), ours: the TPU-native equivalents — on the
identical val split with identical weights. The mAPs must agree within
--tol (default 0.1, typically ~1e-2: residual differences come from f32
conv reductions and NMS tie-breaks near the IoU threshold).

Run: python scripts/validate_eval_parity.py            (TPU or CPU train)
     JAX_PLATFORMS=cpu python scripts/validate_eval_parity.py
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")

NUM_CLASSES = 4
COLORS = [(60, 60, 230), (60, 230, 60), (230, 60, 60), (60, 230, 230)]  # BGR

TINY_YAML = """
model:
  num_classes: 4
layers:
  - {name: stem1, type: Conv, out_channels: 16, kernel_size: 3, stride: 2}
  - {name: stem2, type: Conv, out_channels: 32, kernel_size: 3, stride: 2}
  - {name: stage1, type: RepNCSPELAN4, out_channels: 32, hidden_channels: 32, block_channels: 16, num_repeats: 1}
  - {name: down1, type: ADown, out_channels: 32}
  - {name: stage2, type: RepNCSPELAN4, out_channels: 48, hidden_channels: 48, block_channels: 24, num_repeats: 1}
  - {name: down2, type: ADown, out_channels: 48}
  - {name: stage3, type: RepNCSPELAN4, out_channels: 64, hidden_channels: 64, block_channels: 32, num_repeats: 1}
  - {name: up1, type: Upsample, scale_factor: 2}
  - {name: concat1, type: Concat, from: [up1, stage2]}
  - {name: fpn1, type: RepNCSPELAN4, out_channels: 48, hidden_channels: 48, block_channels: 24, num_repeats: 1}
  - {name: up2, type: Upsample, scale_factor: 2}
  - {name: concat2, type: Concat, from: [up2, stage1]}
  - {name: fpn2, type: RepNCSPELAN4, out_channels: 32, hidden_channels: 32, block_channels: 16, num_repeats: 1}
  - {name: pan_down1, type: ADown, out_channels: 32}
  - {name: concat3, type: Concat, from: [pan_down1, fpn1]}
  - {name: pan1, type: RepNCSPELAN4, out_channels: 48, hidden_channels: 48, block_channels: 24, num_repeats: 1}
  - {name: pan_down2, type: ADown, out_channels: 48}
  - {name: concat4, type: Concat, from: [pan_down2, stage3]}
  - {name: pan2, type: RepNCSPELAN4, out_channels: 64, hidden_channels: 64, block_channels: 32, num_repeats: 1}
  - {name: detect, type: DetectDFL, from: [fpn2, pan1, pan2]}
"""


def make_dataset(root: str, split: str, n: int, seed: int,
                 dense: bool = False) -> str:
    """Synthetic detection data: solid color-coded rectangles (class k ->
    color k) on dark noise — learnable in a few hundred steps.

    dense=True: 56-96 small boxes per 320px image on a jittered 10x10
    grid — the dense-GT regime (round-2 VERDICT Weak #2) where crowded
    NMS, many-GT greedy matching, and the max_det budget all bite."""
    import cv2

    img_dir = os.path.join(root, "images", split)
    lab_dir = os.path.join(root, "labels", split)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        h = w = 320 if dense else 160
        img = rng.integers(0, 80, (h, w, 3)).astype(np.uint8)
        lines = []
        if dense:
            cells = [(r, c) for r in range(10) for c in range(10)]
            rng.shuffle(cells)
            placements = []
            for (r, c) in cells[:int(rng.integers(56, 97))]:
                cx = (c + 0.5) * w / 10 + rng.uniform(-4, 4)
                cy = (r + 0.5) * h / 10 + rng.uniform(-4, 4)
                bw, bh = rng.uniform(12, 24, 2)
                placements.append((cx / w, cy / h, bw / w, bh / h))
        else:
            placements = []
            for _ in range(int(rng.integers(1, 4))):
                cx, cy = rng.uniform(0.25, 0.75, 2)
                bw, bh = rng.uniform(0.15, 0.35, 2)
                placements.append((cx, cy, bw, bh))
        for (cx, cy, bw, bh) in placements:
            cls = int(rng.integers(0, NUM_CLASSES))
            x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
            x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
            cv2.rectangle(img, (x1, y1), (x2, y2), COLORS[cls], -1)
            lines.append(f"{cls} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        cv2.imwrite(os.path.join(img_dir, f"im{i}.jpg"), img)
        with open(os.path.join(lab_dir, f"im{i}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return img_dir


def eval_ours(model_yaml: str, params, stats, val_path: str, img_size: int,
              max_boxes: int = 64):
    from yolo_re_tpu.data.config import DataConfig
    from yolo_re_tpu.data.dataset import create_dataloader
    from yolo_re_tpu.eval.evaluator import Evaluator
    from yolo_re_tpu.models.yolo import YOLO

    model = YOLO.from_yaml(model_yaml)
    cfg = DataConfig(val_path=val_path, num_classes=NUM_CLASSES,
                     img_size=img_size, batch_size=8, workers=0,
                     max_boxes=max_boxes)
    loader = create_dataloader(val_path, cfg, "val")
    return Evaluator(model, loader).evaluate(params, stats)


def eval_reference(model_yaml: str, sd: dict, val_path: str, img_size: int):
    sys.path.insert(0, os.path.join(REFERENCE, "src"))
    import types
    if "albumentations" not in sys.modules:  # not installed; irrelevant at val
        stub = types.ModuleType("albumentations")
        for name in ("Blur", "MedianBlur", "ToGray", "CLAHE", "Compose",
                     "BboxParams"):
            setattr(stub, name,
                    type(name, (), {"__init__": lambda self, *a, **k: None}))
        sys.modules["albumentations"] = stub

    import torch
    from yolo.data.config import DataConfig as TorchDataConfig
    from yolo.data.dataset import create_dataloader as torch_dataloader
    from yolo.eval.evaluator import Evaluator as TorchEvaluator
    from yolo.model.model import YOLO as TorchYOLO

    model = TorchYOLO.from_yaml(model_yaml)
    model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}, strict=True)
    model.eval()

    cfg = TorchDataConfig(train_path=val_path, val_path=val_path,
                          num_classes=NUM_CLASSES, img_size=img_size,
                          batch_size=8, workers=0)
    loader = torch_dataloader(cfg, train=False)
    ev = TorchEvaluator(model, loader, num_classes=NUM_CLASSES, device="cpu")
    return ev.evaluate()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--img-size", type=int, default=160)
    ap.add_argument("--tol", type=float, default=0.1)
    ap.add_argument("--workdir", default=None,
                    help="reuse a directory (keeps dataset/ckpt between runs)")
    ap.add_argument("--dense", action="store_true",
                    help="dense-GT stress: 56-96 objects/image at 320px")
    args = ap.parse_args()
    if args.dense and args.img_size == 160:
        args.img_size = 320

    work = args.workdir or tempfile.mkdtemp(prefix="eval_parity_")
    os.makedirs(work, exist_ok=True)
    train_path = make_dataset(work, "train", 24, seed=0, dense=args.dense)
    val_path = make_dataset(work, "val", 16, seed=1, dense=args.dense)
    model_yaml = os.path.join(work, "tiny.yaml")
    with open(model_yaml, "w") as f:
        f.write(TINY_YAML)

    from yolo_re_tpu.convert.torch_export import export_state_dict
    from yolo_re_tpu.data.config import AugmentConfig, DataConfig
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.trainer import Trainer

    max_boxes = 128 if args.dense else 64
    model = YOLO.from_yaml(model_yaml)
    data = DataConfig(train_path=train_path, num_classes=NUM_CLASSES,
                      img_size=args.img_size, batch_size=8, workers=0,
                      max_boxes=max_boxes, augment=AugmentConfig("minimal"))
    trainer = Trainer(model, data=data, epochs=args.epochs, lr=0.01,
                      val_period=10 ** 9, output_dir=os.path.join(work, "run"))
    print(f"training {args.epochs} epochs on synthetic data in {work} ...")
    trainer.train()
    params = trainer.ema["params"]
    stats = trainer.ema["stats"]

    ours = eval_ours(model_yaml, params, stats, val_path, args.img_size,
                     max_boxes=max_boxes)
    print(f"ours : map50={ours['map50']:.4f} map75={ours['map75']:.4f} "
          f"map={ours['map']:.4f}")

    sd = export_state_dict(model.plan, params, stats)
    ref = eval_reference(model_yaml, sd, val_path, args.img_size)
    print(f"torch: map50={ref['map50']:.4f} map75={ref['map75']:.4f} "
          f"map={ref['map']:.4f}")

    diffs = {k: abs(ours[k] - ref[k]) for k in ("map50", "map75", "map")}
    print("abs diffs:", {k: round(v, 4) for k, v in diffs.items()})
    ok = max(diffs.values()) < args.tol and ours["map50"] > 0.2
    if ours["map50"] <= 0.2:
        print("model failed to learn (map50 too low for a meaningful check)")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
