"""Golden-weight equivalence vs the torch reference.

Mirrors the reference's skippable golden-test pattern
(tests/test_weight_equivalence.py there skips when fixtures are absent).
These tests need torch + the reference checkout and take minutes on this
1-core host, so they run only when RUN_PARITY=1:

    RUN_PARITY=1 python -m pytest tests/test_weight_equivalence.py -q

The same checks run standalone via scripts/validate_equivalence.py and
scripts/validate_training_parity.py.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_PARITY") != "1" or not os.path.isdir(REFERENCE),
    reason="set RUN_PARITY=1 (and have the reference checkout) to run",
)


def _run(script, *args):
    env = dict(os.environ, YOLO_JAX_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *args],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


def test_gelan_c_eval_parity():
    out = _run("validate_equivalence.py", "--model", "gelan-c")
    assert "PASS" in out


def test_yolov9_c_dual_head_parity():
    out = _run("validate_equivalence.py", "--model", "yolov9-c")
    assert "PASS" in out


def test_training_step_parity():
    out = _run("validate_training_parity.py")
    assert "PASS" in out


def test_loss_curve_parity():
    """N identical SGD steps in both frameworks: losses track per step."""
    out = _run("validate_loss_curve.py")
    assert "PASS" in out


def test_full_evaluation_stack_parity():
    """Train briefly, export ours -> torch, run BOTH eval stacks end to end
    (loader -> forward -> NMS -> mAP) on the same data; mAPs must agree."""
    out = _run("validate_eval_parity.py", "--epochs", "40")
    assert "PASS" in out
