"""Convert a reference-format torch checkpoint to this framework's .npz.

Reference analogue: scripts/convert_weights.py (which converts upstream
yolov9 -> reference naming); here the source is the reference naming itself
(or a reference Trainer checkpoint) and the output is our NHWC pytree npz.

Example:
    python scripts/convert_weights.py --weights gelan-c.pt \\
        --config configs/models/gelan-c.yaml --output gelan-c.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help="torch .pt state_dict")
    ap.add_argument("--config", default="configs/models/gelan-c.yaml")
    ap.add_argument("--output", required=True, help="output .npz path")
    ap.add_argument("--num-classes", type=int, default=None)
    args = ap.parse_args()

    from yolo_re_tpu.convert.torch_import import (
        convert_state_dict,
        load_torch_checkpoint,
        save_params,
    )
    from yolo_re_tpu.models.yolo import YOLO

    model = YOLO.from_yaml(args.config, num_classes=args.num_classes)
    sd = load_torch_checkpoint(args.weights)
    params, stats = convert_state_dict(model.plan, sd)
    save_params(args.output, params, stats)
    n = model.num_params(params)
    print(f"converted {len(sd)} torch tensors -> {args.output} "
          f"({n / 1e6:.2f}M params)")


if __name__ == "__main__":
    main()
