"""Which Pallas/packed fast paths ENGAGE on a config's inference hot path?

Trace-time audit through the REAL gates with interpret-mode Pallas
(pallas_supported() returns true, exactly as on TPU), so the answer is the
TPU hot-path answer without spending chip time: builds + fuses the model,
reports what the fuse pass emitted (pallas_stem / packed_rows / packed /
pallas markers), then traces the fused forward abstractly (jax.eval_shape)
with spies on the kernel entry points and reports which fired.

Used for the round-5 gelan-e attribution (docs/performance.md "gelan-e
inference attribution"): at width 1.25 only the stem pair engages — the
packed stage1 ELAN and fused ADown correctly do not emit (40/80-ch CSP
halves cannot tile 128 lanes).

Run: JAX_PLATFORMS=cpu python scripts/audit_kernel_engagement.py \
        [--model gelan-e] [--batch 32] [--size 640]
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("YOLO_JAX_PLATFORM", "cpu")
os.environ["YOLO_TPU_PALLAS_INTERPRET"] = "1"

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gelan-c")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()

    from unittest import mock

    import jax
    import jax.numpy as jnp

    from yolo_re_tpu.models.fuse import FASTPATH_MARKER_KEYS
    from yolo_re_tpu.models.yolo import YOLO

    model = YOLO.from_yaml(f"configs/models/{args.model}.yaml")
    params, stats = model.init(jax.random.key(0))
    fp, fs = model.fuse(params, stats)

    emitted = []

    def walk(t, path=""):
        if isinstance(t, dict):
            for k, v in t.items():
                if k in FASTPATH_MARKER_KEYS:
                    emitted.append(f"{path}/{k}")
                if k != "chain":
                    walk(v, f"{path}/{k}")

    walk(fp)
    print(f"{args.model}: fuse-pass emissions ({len(emitted)}):")
    for e in sorted(emitted):
        print(f"  {e}")

    engaged: dict[str, int] = {}

    def spy(mod, name):
        m = __import__(mod, fromlist=[name])
        orig = getattr(m, name)

        def wrapper(*a, **k):
            key = f"{mod.rsplit('.', 1)[-1]}.{name}"
            engaged[key] = engaged.get(key, 0) + 1
            return orig(*a, **k)

        return mock.patch.object(m, name, side_effect=wrapper, wraps=orig)

    spies = [
        spy("yolo_re_tpu.ops.pallas.stem_kernel", "stem_conv_packed"),
        spy("yolo_re_tpu.ops.pallas.adown_kernel", "adown_from_packed"),
        spy("yolo_re_tpu.ops.pallas.csp_chain_kernel", "bottleneck_chain"),
        spy("yolo_re_tpu.ops.pallas.nms_kernel", "pallas_nms_select"),
    ]
    with contextlib.ExitStack() as st:
        for s in spies:
            st.enter_context(s)
        jax.eval_shape(
            lambda p, s, x: model.apply(p, s, x, train=False), fp, fs,
            jax.ShapeDtypeStruct((args.batch, args.size, args.size, 3),
                                 jnp.bfloat16))
    print(f"engaged at trace (batch{args.batch} @{args.size} bf16, "
          f"interpret gates == TPU gates):")
    if engaged:
        for k, v in sorted(engaged.items()):
            print(f"  {k} x{v}")
    else:
        print("  NONE")


if __name__ == "__main__":
    main()
