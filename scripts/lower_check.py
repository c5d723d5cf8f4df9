"""Host-side TPU lowering check: trace + lower the full bf16 train step
for platform 'tpu' WITHOUT a TPU attached.

Validates every Pallas kernel's Mosaic MLIR generation (dot shapes, iota
ranks, block specs, DMA slicing) and the whole packed/pairs train graph in
one shot — the class of real-TPU failures interpret-mode tests cannot
catch. The final Mosaic->LLO compile still happens on-device, but the
structural constraints surface here. Useful when the TPU tunnel is down
or before burning chip time on a cold compile.

    python scripts/lower_check.py            # gelan-c, batch 32 @640
    MODEL=yolov9-c BATCH=16 python scripts/lower_check.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import yolo_re_tpu.models.blocks as blocks_mod


def main() -> None:
    # The product fast-path gates check jax.default_backend() == "tpu";
    # fake it inside the blocks module so lowering takes the TPU paths.
    blocks_mod.jax.default_backend = lambda: "tpu"

    from yolo_re_tpu.loss.tal import TALoss
    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.train.ema import ema_update, init_ema
    from yolo_re_tpu.train.optimizer import (
        clip_by_global_norm,
        init_sgd_state,
        sgd_step,
    )

    name = os.environ.get("MODEL", "gelan-c")
    batch = int(os.environ.get("BATCH", "32"))
    size = int(os.environ.get("SIZE", "640"))
    model = YOLO.from_yaml(f"configs/models/{name}.yaml")
    params, stats = model.init(jax.random.key(0))
    labels = model.param_labels(params)
    loss_fn = TALoss(model.num_classes, 16, model.strides)
    bufs = init_sgd_state(params)
    ema = init_ema(params, stats)
    x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)
    targets = jnp.zeros((batch, 8, 5), jnp.float32)

    def step(params, stats, bufs, ema, x, targets):
        def obj(p):
            preds, ns = model.apply(p, stats, x, train=True)
            total, _ = loss_fn(preds, targets)
            return total, ns

        (total, ns), grads = jax.value_and_grad(obj, has_aux=True)(params)
        grads, _ = clip_by_global_norm(grads, 10.0)
        params, bufs = sgd_step(params, grads, bufs, labels, lr=1e-4,
                                bias_lr=1e-4, momentum=0.937,
                                weight_decay=5e-4)
        ema = ema_update(ema, params, ns)
        return params, ns, bufs, ema, total

    lowered = jax.jit(step).trace(
        params, stats, bufs, ema, x, targets).lower(
        lowering_platforms=("tpu",))
    txt = lowered.as_text()
    print(f"{name} bf16 train step lowered for TPU OK "
          f"({len(txt)} chars, {txt.count('tpu_custom_call')} Pallas "
          f"custom calls)")


if __name__ == "__main__":
    main()
