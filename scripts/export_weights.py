"""Export this framework's weights to the torch reference's format.

Inverse of scripts/convert_weights.py: takes an .npz (save_params) or a
training checkpoint (.npz / orbax dir; EMA weights are used) and writes a
.pt state_dict the reference loads with `model.load_state_dict(sd)`
(strict) — so models trained on TPU deploy straight into the torch
ecosystem.

Run: python scripts/export_weights.py --weights best.npz \\
         --config configs/models/gelan-c.yaml --output gelan-c-torch.pt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform("cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help=".npz params or training checkpoint (npz/orbax)")
    ap.add_argument("--config", required=True, help="model YAML")
    ap.add_argument("--output", required=True, help=".pt to write")
    ap.add_argument("--num-classes", type=int, default=None)
    args = ap.parse_args()

    from yolo_re_tpu.convert.torch_export import save_torch_checkpoint
    from yolo_re_tpu.convert.torch_import import load_params
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.checkpoint import load_checkpoint

    model = YOLO.from_yaml(args.config, num_classes=args.num_classes)
    try:
        params, stats = load_params(args.weights)
    except Exception:
        ckpt = load_checkpoint(args.weights)
        params, stats = ckpt["ema"]["params"], ckpt["ema"]["stats"]
        print(f"loaded training checkpoint (EMA weights, epoch {ckpt['epoch']})")

    save_torch_checkpoint(args.output, model.plan, params, stats)
    n = model.num_params(params)
    print(f"wrote {args.output} ({n:,} params, reference torch format)")


if __name__ == "__main__":
    main()
