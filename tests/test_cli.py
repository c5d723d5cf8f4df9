"""CLI smoke tests: drive scripts/ end-to-end in subprocesses on the tiny
model (the reference exercises its CLIs only manually; SURVEY §4 calls for
integration coverage the reference lacks)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS="cpu", YOLO_JAX_PLATFORM="cpu")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp_cache"))
    return subprocess.run([sys.executable, *args], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def tiny_weights(tiny_model, tmp_path_factory):
    from yolo_re_tpu.convert.torch_import import save_params

    _, params, stats = tiny_model
    p = tmp_path_factory.mktemp("w") / "tiny.npz"
    save_params(str(p), params, stats)
    return str(p)


def test_detect_cli(tiny_model_path, tiny_weights, synthetic_dataset,
                    tmp_path):
    img_dir = Path(synthetic_dataset)  # fixture returns images/train itself
    out = tmp_path / "out"
    r = run_cli(["scripts/detect.py", "--weights", tiny_weights,
                 "--config", tiny_model_path,
                 "--source", str(sorted(img_dir.glob('*'))[0]),
                 "--output", str(out), "--img-size", "64",
                 "--num-classes", "8", "--conf", "0.001", "--classes", "0"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "average:" in r.stdout
    assert list(out.glob("*"))  # annotated image written


def test_val_cli(tiny_model_path, tiny_weights, synthetic_dataset):
    r = run_cli(["scripts/val.py", "--weights", tiny_weights,
                 "--config", tiny_model_path,
                 "--data", synthetic_dataset,
                 "--num-classes", "8", "--img-size", "64",
                 "--batch", "4", "--workers", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "map50=" in r.stdout
    # random weights: mAP is a finite number in [0, 1]
    val = float(r.stdout.split("map50=")[1].split()[0])
    assert 0.0 <= val <= 1.0


def test_export_serving_cli(tiny_model_path, tiny_weights, tmp_path):
    out = tmp_path / "tiny.stablehlo"
    r = run_cli(["scripts/export_serving.py", "--weights", tiny_weights,
                 "--config", tiny_model_path, "--out", str(out),
                 "--batch", "2", "--img-size", "64", "--num-classes", "8",
                 "--dtype", "float32", "--verify"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "verify: artifact output matches live pipeline" in r.stdout
    assert out.exists() and out.stat().st_size > 1000
