"""Convert a torch checkpoint to this framework's .npz.

Accepts BOTH schemas one-hop (auto-detected from the keys):
- raw upstream WongKinYiu/yolov9 checkpoints (model.<idx>.cv1..., e.g. a
  pretrained gelan-c.pt / yolov9-c.pt) via the reference's index->name
  layer maps (reference: scripts/convert_weights.py:23-95) rebuilt in
  yolo_re_tpu/convert/torch_import.py,
- reference-format state dicts (layers.<name>....) and reference Trainer
  checkpoints.

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
    ap.add_argument("--allow-extra", action="store_true",
                    help="drop tensors the model does not consume instead "
                         "of failing (default: any unconsumed key errors)")
    args = ap.parse_args()

    from yolo_re_tpu.convert.torch_import import (
        convert_state_dict,
        is_upstream_state_dict,
        load_torch_checkpoint,
        save_params,
        upstream_to_reference_sd,
    )
    from yolo_re_tpu.models.yolo import YOLO

    model = YOLO.from_yaml(args.config, num_classes=args.num_classes)
    sd = load_torch_checkpoint(args.weights)
    if is_upstream_state_dict(sd):
        model_name = os.path.splitext(os.path.basename(args.config))[0]
        print(f"upstream yolov9 schema detected; applying the "
              f"{model_name} layer map")
        sd = upstream_to_reference_sd(sd, model_name,
                                      strict=not args.allow_extra)
    params, stats = convert_state_dict(model.plan, sd)

    # Completeness: every tensor in the (translated) state_dict must have
    # been consumed — an unconsumed key means the checkpoint carries
    # weights this model did not load (wrong --config, or an upstream
    # variant the maps misread). convert_state_dict only PULLS keys, so
    # diff against the exact inverse export.
    from yolo_re_tpu.convert.torch_export import export_state_dict
    extra = sorted(set(sd) - set(export_state_dict(model.plan, params,
                                                   stats)))
    if extra:
        msg = (f"{len(extra)} checkpoint tensor(s) were NOT consumed by "
               f"{args.config}: {extra[:8]}{' ...' if len(extra) > 8 else ''}")
        if not args.allow_extra:
            raise SystemExit(f"ERROR: {msg} (use --allow-extra to drop)")
        print(f"WARNING: {msg}")
    save_params(args.output, params, stats)
    n = model.num_params(params)
    print(f"converted {len(sd)} torch tensors -> {args.output} "
          f"({n / 1e6:.2f}M params)")


if __name__ == "__main__":
    main()
