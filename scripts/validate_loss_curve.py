"""Multi-step training loss-curve parity vs the torch reference.

Extends scripts/validate_training_parity.py (single-step) to a full short
training run: both frameworks start from the SAME weights (torch init ->
converted) and take N SGD steps — identical batches, identical
hyperparameters, grad-clip 10 like the reference Trainer
(src/yolo/train/trainer.py:259), constant lr — while BatchNorm running
stats evolve on both sides. The per-step total losses must track within
--rtol (divergence compounds through momentum + BN, so the bound is looser
than single-step parity and GROWS with step index: training is mildly
chaotic, and f32 reduction-order differences of ~1e-7 at step 0 amplify
roughly geometrically — the check is that the curves track, not that two
floating-point trainings stay bit-identical forever).

This is the BASELINE.md "loss-curve match vs reference Trainer" evidence,
run on a small shared-schema model (both frameworks parse the same YAML)
because COCO128 is unreachable from this host.

Run: JAX_PLATFORMS=cpu python scripts/validate_loss_curve.py
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
NUM_CLASSES = 4


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["tiny", "tiny-dual"],
                    default="tiny",
                    help="tiny-dual: yolov9-style aux branch + "
                         "DualDetectDFL (aux loss x0.25, two assigner "
                         "passes) — the reference's dual path via its "
                         "well-defined TALoss._forward_dual (its Trainer "
                         "mis-dispatches dual outputs, SURVEY 2.4.1)")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--rtol", type=float, default=0.02)
    args = ap.parse_args()

    from validate_training_parity import stub_albumentations

    from yolo_re_tpu.data.synth import TINY_DUAL_YAML, TINY_YAML

    dual = args.model == "tiny-dual"
    yaml_text = TINY_DUAL_YAML if dual else TINY_YAML
    ncls = 8 if dual else NUM_CLASSES

    sys.path.insert(0, os.path.join(REFERENCE, "src"))
    stub_albumentations()
    import torch
    from yolo.loss.tal import TALoss as TorchTALoss
    from yolo.model.model import YOLO as TorchYOLO

    import jax
    import jax.numpy as jnp
    from yolo_re_tpu.convert.torch_import import convert_state_dict
    from yolo_re_tpu.loss.tal import TALoss
    from yolo_re_tpu.models.yolo import YOLO, param_labels
    from yolo_re_tpu.train.optimizer import (
        clip_by_global_norm,
        init_sgd_state,
        sgd_step,
    )

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(yaml_text)
        yaml_path = f.name

    torch.manual_seed(42)
    tmodel = TorchYOLO.from_yaml(yaml_path)
    tmodel.train()
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}

    jmodel = YOLO.from_yaml(yaml_path)
    params, stats = convert_state_dict(jmodel.plan, sd)

    # Fixed batch cycle: 3 synthetic batches, same for both frameworks.
    rng = np.random.default_rng(11)
    batches = []
    for b in range(3):
        images = rng.random((args.batch, 3, args.size, args.size), np.float32)
        rows = []
        tj = np.zeros((args.batch, 4, 5), np.float32)
        for i in range(args.batch):
            for j in range(2):
                cls = int(rng.integers(0, ncls))
                cx, cy = rng.uniform(0.3, 0.7, 2)
                bw, bh = rng.uniform(0.2, 0.4, 2)
                rows.append([i, cls, cx, cy, bw, bh])
                tj[i, j] = [cls, cx, cy, bw, bh]
        batches.append((images, np.asarray(rows, np.float32), tj))

    mom, wd, clip = 0.937, 0.0005, 10.0

    # ---- torch run ---------------------------------------------------------
    tloss = TorchTALoss(ncls, 16, [8, 16, 32])
    opt = torch.optim.SGD(tmodel.optim_groups(wd), lr=args.lr, momentum=mom)
    curve_t = []
    for s in range(args.steps):
        images, rows, _ = batches[s % 3]
        opt.zero_grad()
        out = tmodel(torch.from_numpy(images))
        if dual:
            # DualDetectDFL train output is [aux_preds, main_preds]; the
            # reference Trainer mis-dispatches it (SURVEY 2.4.1) but
            # TALoss._forward_dual itself is well-defined — call it the
            # way the fixed dispatch would.
            total, items = tloss._forward_dual((None, (out[0], out[1])),
                                               torch.from_numpy(rows))
        else:
            total, items = tloss(out, torch.from_numpy(rows))
        total.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), clip)
        opt.step()
        curve_t.append(float(total))

    # ---- ours --------------------------------------------------------------
    jloss = TALoss(ncls, 16, (8, 16, 32))
    labels = param_labels(params)
    bufs = init_sgd_state(params)

    @jax.jit
    def train_step(params, stats, bufs, images, targets):
        def obj(p):
            preds, ns = jmodel.apply(p, stats, images, train=True)
            total, items = jloss(preds, targets)
            return total, ns
        (total, ns), grads = jax.value_and_grad(obj, has_aux=True)(params)
        grads, _ = clip_by_global_norm(grads, clip)
        params, bufs = sgd_step(params, grads, bufs, labels, lr=args.lr,
                                bias_lr=args.lr, momentum=mom,
                                weight_decay=wd)
        return params, ns, bufs, total

    curve_j = []
    for s in range(args.steps):
        images, _, tj = batches[s % 3]
        x = jnp.asarray(images.transpose(0, 2, 3, 1))
        params, stats, bufs, total = train_step(params, stats, bufs, x,
                                                jnp.asarray(tj))
        curve_j.append(float(total))

    # ---- compare ------------------------------------------------------------
    # Per-step bound: rtol for the first half, 4x rtol afterwards —
    # rounding perturbations are amplified ~2x/step by momentum + BN, so a
    # flat bound at step N would either be vacuous early or flaky late.
    ok = True
    print(f"{'step':>4} {'torch':>10} {'ours':>10} {'rel':>9} {'bound':>8}")
    for s, (a, b) in enumerate(zip(curve_t, curve_j)):
        rel = abs(a - b) / max(abs(a), 1e-9)
        bound = args.rtol if s < args.steps // 2 else 4 * args.rtol
        print(f"{s:4d} {a:10.5f} {b:10.5f} {rel:9.2e} {bound:8.0e}")
        ok &= rel < bound
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
