"""Test configuration: force CPU with 8 virtual devices (sharding tests run
on a simulated mesh — SURVEY §7/Environment), plus shared fixtures."""

import os

# Force CPU: the host environment pre-sets JAX_PLATFORMS to the TPU plugin,
# but tests must run on 8 virtual CPU devices (override with
# YOLO_TPU_TEST_PLATFORM to test on real hardware).
os.environ["JAX_PLATFORMS"] = os.environ.get("YOLO_TPU_TEST_PLATFORM", "cpu")
# Persistent compilation cache: per-op CPU compiles are ~0.5-1.5s on this
# host; caching makes repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# jax may already be imported by a pytest plugin before this conftest runs;
# env vars alone are then too late. The config API still works until the
# backend is initialized, so set platform + virtual device count through it.
import jax

from yolo_re_tpu.utils.platform import cache_dir

jax.config.update("jax_platforms",
                  os.environ.get("YOLO_TPU_TEST_PLATFORM", "cpu"))
jax.config.update("jax_num_cpu_devices", 8)
# Cache dir keyed on the host CPU's feature flags: this VM migrates across
# physical hosts, and XLA:CPU AOT artifacts cached on one host can SIGILL
# on another (intermittent "Fatal Python error: Aborted" mid-suite).
jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np
import pytest


def _ensure_native_built() -> None:
    """Build the native host runtime so its tests (and the native-dispatch
    loader test) run by default instead of silently skipping."""
    import subprocess

    root = Path(__file__).resolve().parent.parent
    so = root / "native" / "libyolo_host.so"
    src = root / "native" / "yolo_host.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return
    try:
        subprocess.run(["make", "-C", str(root / "native")], check=True,
                       capture_output=True, timeout=180)
    except Exception as e:  # no toolchain: the native tests will skip
        print(f"native build skipped: {e}")


_ensure_native_built()

TINY_MODEL_YAML = """
model:
  num_classes: 8
layers:
  - {name: stem1, type: Conv, out_channels: 16, kernel_size: 3, stride: 2}
  - {name: stem2, type: Conv, out_channels: 32, kernel_size: 3, stride: 2}
  - {name: stage1, type: RepNCSPELAN4, out_channels: 32, hidden_channels: 32, block_channels: 16, num_repeats: 1}
  - {name: down1, type: ADown, out_channels: 32}
  - {name: stage2, type: RepNCSPELAN4, out_channels: 48, hidden_channels: 48, block_channels: 24, num_repeats: 1}
  - {name: down2, type: ADown, out_channels: 48}
  - {name: stage3, type: RepNCSPELAN4, out_channels: 64, hidden_channels: 64, block_channels: 32, num_repeats: 1}
  - {name: down3, type: ADown, out_channels: 64}
  - {name: stage4, type: RepNCSPELAN4, out_channels: 64, hidden_channels: 64, block_channels: 32, num_repeats: 1}
  - {name: spp, type: SPPELAN, out_channels: 64, hidden_channels: 32}
  - {name: up1, type: Upsample, scale_factor: 2}
  - {name: concat1, type: Concat, from: [up1, stage3]}
  - {name: fpn1, type: RepNCSPELAN4, out_channels: 48, hidden_channels: 48, block_channels: 24, num_repeats: 1}
  - {name: up2, type: Upsample, scale_factor: 2}
  - {name: concat2, type: Concat, from: [up2, stage2]}
  - {name: fpn2, type: RepNCSPELAN4, out_channels: 32, hidden_channels: 32, block_channels: 16, num_repeats: 1}
  - {name: pan_down1, type: ADown, out_channels: 32}
  - {name: concat3, type: Concat, from: [pan_down1, fpn1]}
  - {name: pan1, type: RepNCSPELAN4, out_channels: 48, hidden_channels: 48, block_channels: 24, num_repeats: 1}
  - {name: pan_down2, type: ADown, out_channels: 48}
  - {name: concat4, type: Concat, from: [pan_down2, spp]}
  - {name: pan2, type: RepNCSPELAN4, out_channels: 64, hidden_channels: 64, block_channels: 32, num_repeats: 1}
  - {name: detect, type: DetectDFL, from: [fpn2, pan1, pan2]}
"""


@pytest.fixture(scope="session")
def tiny_model_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    p.write_text(TINY_MODEL_YAML)
    return str(p)


@pytest.fixture(scope="session")
def tiny_model(tiny_model_path):
    import jax

    from yolo_re_tpu.models.yolo import YOLO

    model = YOLO.from_yaml(tiny_model_path)
    params, stats = model.init(jax.random.key(0))
    return model, params, stats


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """Tiny on-disk dataset: images/ + labels/ with simple shapes drawn
    (mirrors the reference's tmpdir fixtures, tests/test_data.py:192-219)."""
    import cv2

    root = tmp_path_factory.mktemp("data")
    img_dir = root / "images" / "train"
    lab_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)

    rng = np.random.default_rng(0)
    for i in range(8):
        h, w = int(rng.integers(80, 160)), int(rng.integers(80, 160))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        labels = []
        for _ in range(int(rng.integers(1, 4))):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            bw, bh = rng.uniform(0.1, 0.25, 2)
            cls = int(rng.integers(0, 8))
            x1 = int((cx - bw / 2) * w)
            y1 = int((cy - bh / 2) * h)
            x2 = int((cx + bw / 2) * w)
            y2 = int((cy + bh / 2) * h)
            cv2.rectangle(img, (x1, y1), (x2, y2), (255, 255, 255), -1)
            labels.append(f"{cls} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        (lab_dir / f"im{i}.txt").write_text("\n".join(labels) + "\n")
    return str(img_dir)


from yolo_re_tpu.data.synth import TINY_DUAL_YAML  # noqa: E402



@pytest.fixture(scope="session")
def tiny_dual_model_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "tiny_dual.yaml"
    p.write_text(TINY_DUAL_YAML)
    return str(p)
