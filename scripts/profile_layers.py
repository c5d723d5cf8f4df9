"""Per-layer device-time profile of a model plan.

Times each block of the plan in isolation on synthetic inputs of the true
shapes (batch/size configurable), using the LICM/dispatch-safe device
timer. Prints a cost table sorted by total time — the action list for
kernel optimization.

Run: python scripts/profile_layers.py [--model gelan-c] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gelan-c")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--fused", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_re_tpu.models.builder import INPUT
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.utils.profiling import device_timer

    model = YOLO.from_yaml(f"configs/models/{args.model}.yaml")
    params, stats = model.init(jax.random.key(0))
    if args.fused:
        params, stats = model.fuse(params, stats)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    # Reconstruct per-layer input shapes from the plan's channel/scale maps.
    from yolo_re_tpu.models.builder import PlanBuilder, build_plan
    from yolo_re_tpu.models.config import parse_yaml

    cfg = parse_yaml(f"configs/models/{args.model}.yaml")
    builder = PlanBuilder(cfg.num_classes, cfg.width_multiplier,
                          cfg.depth_multiplier)
    for layer in cfg.layers:
        from yolo_re_tpu.models.config import LayerDef
        builder.add_layer(LayerDef.from_dict(dict(layer)))
    channel_map, scale_map = builder.channel_map, builder.scale_map

    rng = np.random.default_rng(0)
    rows = []
    total = 0.0
    for step in model.plan.steps:
        if step.name == model.plan.detect_name:
            shapes = [(args.batch,
                       int(args.size / scale_map[n]),
                       int(args.size / scale_map[n]),
                       channel_map[n]) for n in step.inputs]
            inputs = [jnp.asarray(rng.random(s, np.float32), dtype=dtype)
                      for s in shapes]

            def fn(x0, *rest):
                out, _ = step.block.apply(step.cfg, params[step.name],
                                          stats[step.name],
                                          [x0, *inputs[1:]], train=False)
                return out[0]

            dt = device_timer(fn, inputs[0], iters=args.iters)
        elif step.type in ("Concat", "CBFuse", "Silence", "CBLinear",
                           "Upsample"):
            continue  # plumbing; negligible or shape-coupled
        else:
            n = step.inputs[0]
            shape = (args.batch, int(args.size / scale_map[n]),
                     int(args.size / scale_map[n]), channel_map[n])
            x = jnp.asarray(rng.random(shape, np.float32), dtype=dtype)

            def fn(x):
                out, _ = step.block.apply(step.cfg, params[step.name],
                                          stats[step.name], x, train=False)
                return out

            dt = device_timer(fn, x, iters=args.iters)
        rows.append((step.name, step.type, dt * 1000))
        total += dt

    rows.sort(key=lambda r: -r[2])
    print(f"\n{'layer':<12} {'type':<16} {'ms/batch':>9}   % of sum")
    for name, type_, ms in rows:
        print(f"{name:<12} {type_:<16} {ms:9.2f}   {100*ms/(total*1000):5.1f}%")
    print(f"{'SUM':<12} {'':<16} {total*1000:9.2f}")


if __name__ == "__main__":
    main()
