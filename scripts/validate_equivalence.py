"""Numerical parity harness vs the torch reference.

Builds the reference model (from /root/reference, or REFERENCE_PATH env) with
its default random init, converts its weights into this framework's pytrees,
and compares decoded eval outputs on the same input — the TPU-native analogue
of reference scripts/validate_equivalence.py:33-152 (which compares against
upstream yolov9 at atol 1e-5).

Run: JAX_PLATFORMS=cpu python scripts/validate_equivalence.py [--model gelan-c]
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


def load_reference_model(config_name: str):
    sys.path.insert(0, os.path.join(REFERENCE, "src"))
    # The reference package imports albumentations at import time; it is not
    # installed here and is irrelevant to model parity — stub it out.
    import types
    if "albumentations" not in sys.modules:
        stub = types.ModuleType("albumentations")
        for name in ("Blur", "MedianBlur", "ToGray", "CLAHE", "Compose",
                     "BboxParams"):
            setattr(stub, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
        sys.modules["albumentations"] = stub
    import torch
    from yolo.model.model import YOLO as TorchYOLO

    torch.manual_seed(42)
    model = TorchYOLO.from_yaml(
        os.path.join(REFERENCE, "configs", "models", f"{config_name}.yaml"))
    model.eval()
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gelan-c")
    ap.add_argument("--atol", type=float, default=1e-4)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    import torch

    import jax.numpy as jnp
    from yolo_re_tpu.convert.torch_import import convert_state_dict
    from yolo_re_tpu.models.yolo import YOLO

    tmodel = load_reference_model(args.model)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    jmodel = YOLO.from_yaml(f"configs/models/{args.model}.yaml")
    params, stats = jmodel.convert_from_torch(sd) if hasattr(
        jmodel, "convert_from_torch") else convert_state_dict(jmodel.plan, sd)

    n_torch = sum(p.numel() for p in tmodel.parameters())
    n_ours = jmodel.num_params(params)
    print(f"param count torch={n_torch} ours={n_ours}")

    torch.manual_seed(42)
    x = torch.randn(1, 3, args.size, args.size)
    with torch.no_grad():
        tout = tmodel(x)

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    jout, _ = jmodel.apply(params, stats, xj, train=False)

    ok = True
    if args.model == "gelan-c":
        t_decoded = tout[0].numpy()                    # (1, 84, A)
        j_decoded = np.asarray(jout[0]).transpose(0, 2, 1)  # -> (1, 84, A)
        diff = np.abs(t_decoded - j_decoded).max()
        print(f"decoded max abs diff: {diff:.3e}")
        ok = diff < args.atol
    else:  # dual head
        t_dec_aux, t_dec_main = tout[0][0].numpy(), tout[0][1].numpy()
        j_dec = jout[0]
        d_aux = np.abs(t_dec_aux - np.asarray(j_dec["aux"]).transpose(0, 2, 1)).max()
        d_main = np.abs(t_dec_main - np.asarray(j_dec["main"]).transpose(0, 2, 1)).max()
        print(f"aux max abs diff: {d_aux:.3e}, main: {d_main:.3e}")
        ok = d_aux < args.atol and d_main < args.atol

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
