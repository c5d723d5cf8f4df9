"""Training-step parity vs the torch reference.

Loads the reference model with its random init, converts weights, runs the
SAME batch through both frameworks in train mode, and compares:

1. per-level raw head outputs (train-mode BN batch stats),
2. TAL loss components [box, cls, dfl],
3. parameters after one SGD step (lr/momentum/wd identical).

This is the basis for the BASELINE.md "loss-curve match vs reference
Trainer" config: if single steps match on identical data, curves match up
to data-pipeline randomness.

Run: JAX_PLATFORMS=cpu python scripts/validate_training_parity.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")


def stub_albumentations():
    import types

    if "albumentations" not in sys.modules:
        stub = types.ModuleType("albumentations")
        for name in ("Blur", "MedianBlur", "ToGray", "CLAHE", "Compose",
                     "BboxParams"):
            setattr(stub, name,
                    type(name, (), {"__init__": lambda self, *a, **k: None}))
        sys.modules["albumentations"] = stub


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--loss-rtol", type=float, default=2e-3)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(REFERENCE, "src"))
    stub_albumentations()
    import torch
    from yolo.loss.tal import TALoss as TorchTALoss
    from yolo.model.model import YOLO as TorchYOLO

    import jax.numpy as jnp
    from yolo_re_tpu.convert.torch_import import convert_state_dict
    from yolo_re_tpu.loss.tal import TALoss
    from yolo_re_tpu.models.yolo import YOLO

    torch.manual_seed(42)
    tmodel = TorchYOLO.from_yaml(
        os.path.join(REFERENCE, "configs/models/gelan-c.yaml"))
    tmodel.train()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    jmodel = YOLO.from_yaml("configs/models/gelan-c.yaml")
    params, stats = convert_state_dict(jmodel.plan, sd)

    # Same batch for both
    rng = np.random.default_rng(7)
    images = rng.random((args.batch, 3, args.size, args.size),
                        np.float32)
    # targets: torch flat (N, 6) [img, cls, xywhn]; ours padded (B, M, 5)
    t_rows = np.array([
        [0, 1, 0.5, 0.5, 0.4, 0.4],
        [0, 3, 0.25, 0.3, 0.2, 0.25],
        [1, 0, 0.6, 0.6, 0.3, 0.3],
    ], np.float32)
    targets_j = np.zeros((args.batch, 4, 5), np.float32)
    targets_j[0, 0] = t_rows[0, 1:]
    targets_j[0, 1] = t_rows[1, 1:]
    targets_j[1, 0] = t_rows[2, 1:]

    # ---- forward (train mode) -------------------------------------------
    x_t = torch.from_numpy(images)
    raw_t = tmodel(x_t)
    raw_t = [r.detach().numpy() for r in raw_t]  # NCHW per level

    x_j = jnp.asarray(images.transpose(0, 2, 3, 1))
    raw_j, _ = jmodel.apply(params, stats, x_j, train=True)
    # train preds default to lane-aligned (box, cls) pairs; reassemble
    # the reference's concatenated layout host-side (bit-identical
    # values). Under YOLO_TPU_TRAIN_PAIRS=0 each level is already the
    # concatenated map — keep the harness usable for that A/B too.
    raw_j = [np.concatenate([np.asarray(lvl[0]), np.asarray(lvl[1])],
                            axis=-1).transpose(0, 3, 1, 2)
             if isinstance(lvl, (tuple, list))
             else np.asarray(lvl).transpose(0, 3, 1, 2)
             for lvl in raw_j]

    ok = True
    for i, (a, b) in enumerate(zip(raw_t, raw_j)):
        diff = np.abs(a - b).max()
        print(f"level {i} raw diff: {diff:.3e}")
        ok &= diff < 5e-4

    # ---- loss ------------------------------------------------------------
    tloss = TorchTALoss(80, 16, [8, 16, 32])
    total_t, items_t = tloss(
        [torch.from_numpy(r) for r in raw_t], torch.from_numpy(t_rows))
    items_t = items_t.numpy()

    jloss = TALoss(80, 16, [8, 16, 32])
    total_j, items_j = jloss(
        [jnp.asarray(r.transpose(0, 2, 3, 1)) for r in raw_t], targets_j)
    items_j = np.asarray(items_j)

    print(f"loss items torch: {items_t}")
    print(f"loss items ours : {items_j}")
    rel = np.abs(items_t - items_j) / np.maximum(np.abs(items_t), 1e-6)
    print(f"rel diff: {rel}")
    ok &= bool(np.all(rel < args.loss_rtol))
    print(f"total torch {float(total_t):.5f} ours {float(total_j):.5f}")

    # ---- dual-head loss parity --------------------------------------------
    # The reference's Trainer mis-dispatches the dual path (SURVEY §2.4.1);
    # its TALoss._forward_dual itself is well-defined, so compare against
    # that directly on shared raw tensors (aux := main tensors re-used).
    dual_t = tloss._forward_dual(
        (None, ([torch.from_numpy(r) for r in raw_t],
                [torch.from_numpy(r) for r in raw_t])),
        torch.from_numpy(t_rows))
    items_dual_t = dual_t[1].numpy()
    feats_j = [jnp.asarray(r.transpose(0, 2, 3, 1)) for r in raw_t]
    _, items_dual_j = jloss({"aux": feats_j, "main": feats_j}, targets_j)
    items_dual_j = np.asarray(items_dual_j)
    rel_d = np.abs(items_dual_t - items_dual_j) / np.maximum(
        np.abs(items_dual_t), 1e-6)
    print(f"dual loss items torch: {items_dual_t}")
    print(f"dual loss items ours : {items_dual_j}")
    print(f"dual rel diff: {rel_d}")
    ok &= bool(np.all(rel_d < args.loss_rtol))

    # ---- one SGD step parity ----------------------------------------------
    # torch SGD over the reference's 3 optim groups vs our grouped sgd_step
    # with identical grads (the reference's actual total-loss backward).
    from yolo_re_tpu.models.yolo import param_labels
    from yolo_re_tpu.train.optimizer import init_sgd_state, sgd_step

    lr, momentum, wd = 0.01, 0.937, 0.0005
    opt = torch.optim.SGD(tmodel.optim_groups(wd), lr=lr, momentum=momentum)
    opt.zero_grad()
    total_t2, _ = tloss(tmodel(torch.from_numpy(images)),
                        torch.from_numpy(t_rows))
    total_t2.backward()
    opt.step()
    sd_after = {k: v.detach().numpy()
                for k, v in tmodel.state_dict().items()}

    import jax

    labels = param_labels(params)

    def objective(p):
        preds, _ = jmodel.apply(p, stats, x_j, train=True)
        total, _ = jloss(preds, targets_j)
        return total

    grads = jax.grad(objective)(params)
    new_params, _ = sgd_step(params, grads, init_sgd_state(params), labels,
                             lr=lr, bias_lr=lr, momentum=momentum,
                             weight_decay=wd)
    # compare a deep conv weight after the step. NB: `sd` aliases the live
    # torch tensors (numpy views), so the pre-step state comes from the
    # converted (copied) params tree.
    w_before = np.asarray(params["stage3"]["conv_out"]["w"])
    w_torch = np.transpose(sd_after["layers.stage3.conv_out.conv.weight"],
                           (2, 3, 1, 0))
    w_ours = np.asarray(new_params["stage3"]["conv_out"]["w"])
    step_t = w_torch - w_before
    step_j = w_ours - w_before
    denom = max(np.abs(step_t).max(), 1e-12)
    sgd_rel = np.abs(step_t - step_j).max() / denom
    print(f"SGD step: max |update| torch {np.abs(step_t).max():.3e}, "
          f"rel diff {sgd_rel:.3e}")
    ok &= bool(sgd_rel < 0.05)

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
