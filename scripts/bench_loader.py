"""Host data-loader throughput: cv2 pipeline vs the native C++ kernels.

Measures images/sec through the full train-time host pipeline (decode ->
resize -> mosaic -> warp -> HSV -> flip -> pad) on a synthetic dataset,
once with the cv2/numpy prims and once with YOLO_TPU_NATIVE=1 dispatching
letterbox / bilinear resize / HSV through native/libyolo_host.so.

Run: python scripts/bench_loader.py [--n 96] [--img-size 640] [--batch 16]
(jax-free: exercises only the host pipeline.)
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n: int, hw: int) -> str:
    import cv2
    import numpy as np

    img_dir = os.path.join(root, "images")
    lab_dir = os.path.join(root, "labels")
    os.makedirs(img_dir), os.makedirs(lab_dir)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (hw, int(hw * 1.3), 3), np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i:04d}.jpg"), img)
        with open(os.path.join(lab_dir, f"{i:04d}.txt"), "w") as f:
            f.write("1 0.5 0.5 0.4 0.4\n2 0.2 0.3 0.1 0.2\n")
    return img_dir


def run_epochs(path: str, img_size: int, batch: int, workers: int,
               epochs: int) -> float:
    from yolo_re_tpu.data.config import AugmentConfig, DataConfig
    from yolo_re_tpu.data.dataset import create_dataloader

    data = DataConfig(train_path=path, num_classes=8, img_size=img_size,
                      batch_size=batch, workers=workers,
                      augment=AugmentConfig("full"))
    loader = create_dataloader(path, data, "train")
    n = 0
    loader.set_epoch(0)
    for b in loader:  # warm caches / thread pool
        n += b["images"].shape[0]
    t0 = time.perf_counter()
    n = 0
    for e in range(epochs):
        loader.set_epoch(e + 1)
        for b in loader:
            n += b["images"].shape[0]
    return n / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from yolo_re_tpu.utils import native

    with tempfile.TemporaryDirectory() as td:
        path = make_dataset(td, args.n, args.img_size)

        os.environ["YOLO_TPU_NATIVE"] = "0"
        cv2_rate = run_epochs(path, args.img_size, args.batch, args.workers,
                              args.epochs)
        print(f"cv2 pipeline:    {cv2_rate:7.1f} img/s")

        if not native.available():
            print("native lib not built (make -C native); skipping")
            return
        os.environ["YOLO_TPU_NATIVE"] = "1"
        nat_rate = run_epochs(path, args.img_size, args.batch, args.workers,
                              args.epochs)
        print(f"native pipeline: {nat_rate:7.1f} img/s "
              f"({nat_rate / cv2_rate:.2f}x)")


if __name__ == "__main__":
    main()
