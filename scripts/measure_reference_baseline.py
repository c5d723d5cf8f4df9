"""Measure the torch reference's inference throughput on this host.

Writes baseline_measurements.json at the repo root; bench.py reads it to
compute vs_baseline. The reference publishes no numbers (BASELINE.md), so
the comparison basis is its actual torch implementation run here (CPU —
the only torch device available in this environment).

Run once: python scripts/measure_reference_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "640"))
ITERS = int(os.environ.get("BENCH_ITERS", "2"))


def main() -> None:
    sys.path.insert(0, os.path.join(REFERENCE, "src"))
    import types

    if "albumentations" not in sys.modules:
        stub = types.ModuleType("albumentations")
        for name in ("Blur", "MedianBlur", "ToGray", "CLAHE", "Compose",
                     "BboxParams"):
            setattr(stub, name,
                    type(name, (), {"__init__": lambda self, *a, **k: None}))
        sys.modules["albumentations"] = stub

    import torch
    from yolo.model.model import YOLO as TorchYOLO
    from yolo.utils.nms import non_max_suppression as torch_nms

    model = TorchYOLO.from_yaml(
        os.path.join(REFERENCE, "configs/models/gelan-c.yaml"))
    model.eval()

    x = torch.from_numpy(
        np.random.default_rng(0).random((BATCH, 3, SIZE, SIZE),
                                        np.float32))
    with torch.no_grad():
        # warmup
        out = model(x[:2])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            decoded, _ = model(x)
            preds = decoded.permute(0, 2, 1)  # (B, A, 84)
            torch_nms(preds, conf_thres=0.25, iou_thres=0.45)
        dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "repo", "baseline_measurements.json")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "baseline_measurements.json")
    payload = {
        "reference_images_per_sec": round(ips, 3),
        "config": f"gelan-c {SIZE}x{SIZE} batch{BATCH} incl. NMS",
        "hardware": f"torch CPU ({os.cpu_count()} cores)",
        "torch_version": torch.__version__,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
