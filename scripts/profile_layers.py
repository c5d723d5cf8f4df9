"""Per-layer device-time profile of a model plan, by cumulative truncation.

For each prefix of the plan, jits a 20-iteration on-device loop running
that prefix (with a data-feedback perturbation so XLA cannot hoist the
loop-invariant forward — LICM) and reports per-layer cost as the delta
between consecutive prefixes. This measures each layer *in context* (real
producer/consumer fusions), unlike timing blocks in isolation, and is
immune to the per-dispatch tunnel latency of this environment.

Caveat: a truncated prefix must materialize (sum) its last output, while
the full model fuses it into the consumer — so a cheap layer right before
an expensive consumer can show a large positive delta paired with a
negative delta on the consumer (e.g. a Concat feeding a conv). Read such
adjacent pairs as one unit; the TOTAL row is exact.

Run: python scripts/profile_layers.py [--model gelan-c] [--batch 32]
(compiles one program per layer; first run takes a few minutes.)
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--no-fuse", action="store_true",
                    help="profile the unfused (training-numerics) model")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_re_tpu.models.builder import INPUT
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.utils.profiling import device_timer

    model = YOLO.from_yaml(f"configs/models/{args.model}.yaml")
    params, stats = model.init(jax.random.key(0))
    if not args.no_fuse:
        params, stats = model.fuse(params, stats)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    x = jnp.asarray(
        np.random.default_rng(0).random(
            (args.batch, args.size, args.size, 3), np.float32), dtype=dtype)
    params = jax.device_put(params)
    stats = jax.device_put(stats)
    steps = model.plan.steps

    def prefix_fn(k):
        def fn(params, stats, xx):
            outputs = {INPUT: xx}
            acc = jnp.zeros((), jnp.float32)
            for step in steps[:k]:
                if len(step.inputs) == 1 and step.type != "CBFuse":
                    inp = outputs[step.inputs[0]]
                else:
                    inp = [outputs[n] for n in step.inputs]
                if step.name == model.plan.detect_name \
                        and not isinstance(inp, list):
                    inp = [inp]
                out, _ = step.block.apply(
                    step.cfg, params.get(step.name, {}),
                    stats.get(step.name, {}), inp, train=False)
                outputs[step.name] = out
                # Consume every output so nothing is dead-code-eliminated.
                acc += sum(leaf.astype(jnp.float32).sum()
                           for leaf in jax.tree_util.tree_leaves(out))
            return acc
        return fn

    rows, prev = [], 0.0
    for k in range(1, len(steps) + 1):
        fn = prefix_fn(k)
        t = device_timer(lambda xx, p, s: fn(p, s, xx), x, params, stats,
                         iters=args.iters) * 1000
        rows.append((steps[k - 1].name, steps[k - 1].type, t - prev))
        prev = t

    total = prev
    rows.sort(key=lambda r: -r[2])
    print(f"\n{'layer':<12} {'type':<16} {'ms/batch':>9}   % of total")
    for name, type_, ms in rows:
        print(f"{name:<12} {type_:<16} {ms:9.2f}   {100 * ms / total:5.1f}%")
    print(f"{'TOTAL':<12} {'':<16} {total:9.2f}   "
          f"({args.batch / total * 1000:.0f} img/s, "
          f"forward only, batch {args.batch})")


if __name__ == "__main__":
    main()
