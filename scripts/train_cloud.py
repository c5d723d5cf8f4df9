"""Cloud training/eval launcher (reference analogue: scripts/train_modal.py).

The reference trains AND evaluates on cloud GPUs via Modal
(@app.function(gpu=...), reference train_modal.py:537-559; remote eval of a
checkpoint at :392-447). The rebuild keeps both surfaces:

- **Modal** (`--backend modal`): a GPU function (accelerator from
  --gpu / MODAL_GPU, like the reference's GPU_TYPE env at :544) running
  scripts/train.py or scripts/val.py on a jax[cuda] image. Modal offers no
  TPUs, so this is the GPU path, exactly like the reference's.
- **Cloud TPU VM** (`--backend gcloud`): emits the gcloud recipe to
  provision a TPU VM, sync the repo, train with --bf16, and fetch runs/.

`--mode eval --weights ...` is the remote-checkpoint-evaluation surface
(reference train_modal.py:392-447). `--dry-run` builds the full plan —
and, when modal is importable, the actual App/Image/Function objects —
without any network call; the command builders are unit-tested offline
(tests/test_cli.py).
"""

from __future__ import annotations

import argparse
import os
import shlex
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GCLOUD_TEMPLATE = """\
# 1. Provision a TPU VM (adjust zone/type/version):
gcloud compute tpus tpu-vm create {name} \\
    --zone={zone} --accelerator-type={accel} --version=tpu-ubuntu2204-base

# 2. Sync the framework:
gcloud compute tpus tpu-vm scp --recurse {repo} {name}:~/yolo_re_tpu --zone={zone}

# 3. Install deps + run:
gcloud compute tpus tpu-vm ssh {name} --zone={zone} --command={cmd}

# 4. Fetch results:
gcloud compute tpus tpu-vm scp --recurse {name}:~/yolo_re_tpu/runs {repo}/runs --zone={zone}

# 5. Tear down:
gcloud compute tpus tpu-vm delete {name} --zone={zone}
"""


def build_remote_command(args) -> str:
    """The command executed on the remote host (either backend).

    mode=train -> scripts/train.py (bf16, data-parallel over all local
    devices by default); mode=eval -> scripts/val.py on --weights, the
    reference's remote-pretrained-eval surface (train_modal.py:392-447).
    """
    if args.mode == "eval":
        if not args.weights:
            raise ValueError("--mode eval requires --weights")
        core = (f"python scripts/val.py --data {shlex.quote(args.data)} "
                f"--weights {shlex.quote(args.weights)} "
                f"--config {shlex.quote(args.config)} "
                f"--batch {args.batch} --bf16")
    else:
        core = (f"python scripts/train.py --data {shlex.quote(args.data)} "
                + (f"--val {shlex.quote(args.val)} " if args.val else "")
                + f"--config {shlex.quote(args.config)} "
                  f"--epochs {args.epochs} --batch {args.batch} --bf16")
    return f"cd ~/yolo_re_tpu && pip install -e . && {core}"


def build_gcloud_recipe(args) -> str:
    return GCLOUD_TEMPLATE.format(
        name=args.name, zone=args.zone, accel=args.accelerator,
        repo=REPO_ROOT, cmd=shlex.quote(build_remote_command(args)))


def build_modal_plan(args) -> dict:
    """Everything the Modal launch needs, as inspectable data (unit-testable
    without the modal package or network)."""
    return {
        "app_name": f"yolo-re-tpu-{args.mode}",
        "gpu": args.gpu,
        "timeout": args.timeout_hours * 3600,
        "pip": ["jax[cuda12]", "numpy", "pyyaml", "opencv-python-headless"],
        "command": build_remote_command(args),
        "local_dir": REPO_ROOT,
        "remote_dir": "/root/yolo_re_tpu",
    }


def build_modal_app(plan: dict):
    """Materialize the plan into Modal objects (no network until .run())."""
    import modal

    app = modal.App(plan["app_name"])
    image = (modal.Image.debian_slim()
             .pip_install(*plan["pip"])
             .add_local_dir(plan["local_dir"], plan["remote_dir"]))

    @app.function(image=image, gpu=plan["gpu"], timeout=plan["timeout"])
    def remote_run():
        import subprocess

        subprocess.run(plan["command"], shell=True, check=True,
                       cwd=plan["remote_dir"])

    return app, remote_run


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "eval"], default="train")
    ap.add_argument("--backend", choices=["modal", "gcloud"], default="modal")
    ap.add_argument("--data", required=True)
    ap.add_argument("--val", default=None)
    ap.add_argument("--weights", default=None,
                    help="checkpoint/.npz for --mode eval")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--config", default="configs/models/gelan-c.yaml")
    ap.add_argument("--gpu", default=os.environ.get("MODAL_GPU", "A10G"),
                    help="Modal accelerator (reference GPU_TYPE env, "
                         "train_modal.py:544)")
    ap.add_argument("--accelerator", default="v5litepod-8",
                    help="Cloud TPU VM accelerator type")
    ap.add_argument("--zone", default="us-central1-a")
    ap.add_argument("--name", default="yolo-re-tpu-train")
    ap.add_argument("--timeout-hours", type=int, default=12)
    ap.add_argument("--dry-run", action="store_true",
                    help="build and print the launch plan without running")
    args = ap.parse_args(argv)

    if args.backend == "gcloud":
        recipe = build_gcloud_recipe(args)
        print(recipe)
        return 0

    plan = build_modal_plan(args)
    if args.dry_run:
        print("modal launch plan:")
        for k, v in plan.items():
            print(f"  {k}: {v}")
        try:
            app, fn = build_modal_app(plan)
            print(f"  app built: {app.name}, function: {fn.info.raw_f.__name__}")
        except ImportError:
            print("  (modal not installed; objects not materialized)")
        return 0

    app, remote_run = build_modal_app(plan)
    with app.run():
        remote_run.remote()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
