"""Cloud training launcher (reference analogue: scripts/train_modal.py).

The reference trains on cloud GPUs via Modal (@app.function(gpu=...),
reference train_modal.py:537-559). The TPU-native equivalent targets Cloud
TPU VMs: this script either

1. runs under Modal when the `modal` package is installed (TPU-enabled
   images), or
2. emits the `gcloud` commands to provision a TPU VM, sync this repo, and
   launch scripts/train.py there (`--print-gcloud`).

This environment has neither cloud credentials nor egress, so the script is
a launcher, not something exercised in CI; it is gated accordingly.
"""

from __future__ import annotations

import argparse
import os
import shlex
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GCLOUD_TEMPLATE = """\
# 1. Provision a TPU VM (adjust zone/type/version):
gcloud compute tpus tpu-vm create {name} \\
    --zone={zone} --accelerator-type={accel} --version=tpu-ubuntu2204-base

# 2. Sync the framework:
gcloud compute tpus tpu-vm scp --recurse {repo} {name}:~/yolo_re_tpu --zone={zone}

# 3. Install deps + run training:
gcloud compute tpus tpu-vm ssh {name} --zone={zone} --command={cmd}

# 4. Fetch results:
gcloud compute tpus tpu-vm scp --recurse {name}:~/yolo_re_tpu/runs {repo}/runs --zone={zone}
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--val", default=None)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--config", default="configs/models/gelan-c.yaml")
    ap.add_argument("--accelerator", default="v5litepod-8")
    ap.add_argument("--zone", default="us-central1-a")
    ap.add_argument("--name", default="yolo-re-tpu-train")
    ap.add_argument("--print-gcloud", action="store_true",
                    help="print gcloud provisioning commands and exit")
    args = ap.parse_args()

    train_cmd = (
        f"cd ~/yolo_re_tpu && pip install -e . && "
        f"python scripts/train.py --data {args.data} "
        + (f"--val {args.val} " if args.val else "")
        + f"--config {args.config} --epochs {args.epochs} "
          f"--batch {args.batch} --bf16"
    )

    if args.print_gcloud:
        print(GCLOUD_TEMPLATE.format(
            name=args.name, zone=args.zone, accel=args.accelerator,
            repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            cmd=shlex.quote(train_cmd)))
        return

    try:
        import modal  # noqa: F401
    except ImportError:
        raise SystemExit(
            "modal is not installed; use --print-gcloud for the Cloud TPU VM "
            "recipe, or `pip install modal` for Modal-based launching.")

    import modal

    app = modal.App("yolo-re-tpu-train")
    image = (modal.Image.debian_slim()
             .pip_install("jax[tpu]", "numpy", "pyyaml", "opencv-python")
             .add_local_dir(
                 os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "/root/yolo_re_tpu"))

    @app.function(image=image, timeout=60 * 60 * 12)
    def remote_train():
        import subprocess
        subprocess.run(train_cmd, shell=True, check=True,
                       cwd="/root/yolo_re_tpu")

    with app.run():
        remote_train.remote()


if __name__ == "__main__":
    main()
