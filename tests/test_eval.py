"""mAP metric tests (reference model: eval parts of its test suite +
known-value checks)."""

import jax
import numpy as np
import pytest

from yolo_re_tpu.eval.metrics import box_iou_np, compute_ap, compute_map


def test_box_iou_np():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    iou = box_iou_np(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25 / 175, rtol=1e-5)


def test_compute_ap_perfect():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 1.0])
    assert abs(compute_ap(recall, precision) - 1.0) < 1e-6


def test_compute_ap_zero():
    recall = np.array([0.0])
    precision = np.array([0.0])
    ap = compute_ap(recall, precision)
    assert ap <= 1.0 / 101 + 1e-9  # only the r=0 point sees the sentinel


def test_compute_map_perfect_predictions():
    gt_boxes = [np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32)]
    gt_classes = [np.array([0, 1])]
    results = compute_map(
        pred_boxes=[gt_boxes[0].copy()],
        pred_scores=[np.array([0.9, 0.8], np.float32)],
        pred_classes=[np.array([0, 1])],
        gt_boxes=gt_boxes,
        gt_classes=gt_classes,
        num_classes=2,
    )
    assert results["map50"] > 0.99
    assert results["map"] > 0.99


def test_compute_map_wrong_class():
    gt_boxes = [np.array([[10, 10, 50, 50]], np.float32)]
    results = compute_map(
        pred_boxes=[gt_boxes[0].copy()],
        pred_scores=[np.array([0.9], np.float32)],
        pred_classes=[np.array([1])],   # wrong class
        gt_boxes=gt_boxes,
        gt_classes=[np.array([0])],
        num_classes=2,
    )
    assert results["map50"] == 0.0


def test_compute_map_localization_threshold():
    # IoU ~0.68 box: TP at 0.5, FP at 0.75
    gt_boxes = [np.array([[0, 0, 100, 100]], np.float32)]
    pred = [np.array([[0, 0, 100, 82]], np.float32)]  # IoU = 0.82
    results = compute_map(
        pred_boxes=pred,
        pred_scores=[np.array([0.9], np.float32)],
        pred_classes=[np.array([0])],
        gt_boxes=gt_boxes,
        gt_classes=[np.array([0])],
        num_classes=1,
    )
    assert results["map50"] > 0.99
    assert results["map75"] > 0.99
    assert results["map"] < 0.99  # fails at highest thresholds


def test_compute_map_duplicate_detection_penalized():
    gt_boxes = [np.array([[10, 10, 50, 50]], np.float32)]
    pred = [np.array([[10, 10, 50, 50], [11, 11, 51, 51]], np.float32)]
    results = compute_map(
        pred_boxes=pred,
        pred_scores=[np.array([0.9, 0.8], np.float32)],
        pred_classes=[np.array([0, 0])],
        gt_boxes=gt_boxes,
        gt_classes=[np.array([0])],
        num_classes=1,
    )
    # second detection is FP (one-to-one matching) but AP@50 still high
    assert 0.9 < results["map50"] <= 1.0


def test_compute_map_empty_preds():
    results = compute_map(
        pred_boxes=[np.zeros((0, 4), np.float32)],
        pred_scores=[np.zeros((0,), np.float32)],
        pred_classes=[np.zeros((0,), np.int64)],
        gt_boxes=[np.array([[0, 0, 10, 10]], np.float32)],
        gt_classes=[np.array([0])],
        num_classes=1,
    )
    assert results["map50"] == 0.0


def test_evaluator_rect_and_bf16(tiny_model, synthetic_dataset):
    """Evaluator handles non-square rect batches and bf16 compute."""
    from yolo_re_tpu.data.dataset import DataLoader, YOLODataset
    from yolo_re_tpu.eval.evaluator import Evaluator

    model, params, stats = tiny_model
    ds = YOLODataset(synthetic_dataset, img_size=64, rect=True, batch_size=4)
    loader = DataLoader(ds, batch_size=4, max_boxes=16, workers=2)
    ev = Evaluator(model, loader, compute_dtype="bfloat16")
    results = ev.evaluate(params, stats)
    assert "map50" in results and np.isfinite(results["map50"])


def test_evaluator_debug_dump(tiny_model, synthetic_dataset, tmp_path):
    """debug_dir writes per-epoch GT/pred overlay images
    (reference: eval/evaluator.py:164-196)."""
    from yolo_re_tpu.data.config import DataConfig
    from yolo_re_tpu.data.dataset import create_dataloader
    from yolo_re_tpu.eval.evaluator import Evaluator

    model, params, stats = tiny_model
    cfg = DataConfig(val_path=synthetic_dataset, num_classes=8, img_size=64,
                     batch_size=4, workers=0, max_boxes=16)
    loader = create_dataloader(synthetic_dataset, cfg, "val")
    ev = Evaluator(model, loader, debug_dir=str(tmp_path / "dbg"))
    ev.evaluate(params, stats, epoch=3)
    imgs = list((tmp_path / "dbg" / "epoch3").glob("*.jpg"))
    assert imgs, "expected debug overlay images"


def test_evaluator_uint8_loader_matches_float(tiny_model, synthetic_dataset):
    """uint8-emitting loaders (device_augment trainers) must evaluate
    identically to float loaders — the evaluator normalizes on device."""
    from yolo_re_tpu.data.config import DataConfig
    from yolo_re_tpu.data.dataset import create_dataloader
    from yolo_re_tpu.eval.evaluator import Evaluator

    model, params, stats = tiny_model
    results = {}
    for u8 in (False, True):
        cfg = DataConfig(val_path=synthetic_dataset, num_classes=8,
                         img_size=64, batch_size=4, workers=0, max_boxes=16,
                         uint8_images=u8)
        loader = create_dataloader(synthetic_dataset, cfg, "val")
        results[u8] = Evaluator(model, loader).evaluate(params, stats)
    assert abs(results[False]["map50"] - results[True]["map50"]) < 1e-6


def test_serving_detector(tiny_model, synthetic_dataset):
    """End-to-end serving pipeline: uint8 batch -> padded detections."""
    from yolo_re_tpu.serving import Detector

    model, params, stats = tiny_model
    det = Detector(model, params, stats, img_size=64, conf_thres=0.001,
                   compute_dtype="float32")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 48, 80, 3), dtype=np.uint8)
    out = det(frames)
    assert out["boxes"].shape == (2, 300, 4)
    assert out["valid"].shape == (2, 300)
    dets = det.to_list(out, [(48, 80), (48, 80)])
    for d in dets:
        assert d.shape[1] == 6
        if len(d):
            assert d[:, 0].min() >= 0 and d[:, 2].max() <= 80


def test_serving_export_roundtrip(tiny_model, tmp_path):
    """StableHLO export: serialized artifact reproduces the live pipeline
    bit-for-bit (weights baked in as constants; jax.export round-trip)."""
    from yolo_re_tpu.serving import Detector

    model, params, stats = tiny_model
    det = Detector(model, params, stats, img_size=64, conf_thres=0.001,
                   compute_dtype="float32")
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 48, 80, 3), dtype=np.uint8)
    live = det(frames)

    path = str(tmp_path / "det.stablehlo")
    det.export(path, batch=2, height=48, width=80)
    run = Detector.load_exported(path)
    loaded = run(frames)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(np.asarray(live[k]),
                                   np.asarray(loaded[k]), rtol=1e-5, atol=1e-5)


def test_export_multiplatform_strips_pallas_single_keeps(tiny_model, tmp_path):
    """`Detector.export` promises (serving.py): multi-platform artifacts
    carry no Pallas kernel (a Mosaic custom call only lowers on TPU),
    while single-platform export keeps the fast path of the tracing
    backend. On CPU (interpret-mode gates) that is observable as: the
    single-platform trace ENGAGES the stem kernel, the multi-platform
    trace does not, and neither CPU artifact contains a TPU custom call.
    The TPU-side containment (tpu_custom_call present in the single-
    platform TPU artifact) is pinned by
    test_export_tpu_keeps_mosaic_custom_call below (TPU-only)."""
    import os
    from unittest import mock

    import jax

    from yolo_re_tpu.ops.pallas import stem_kernel
    from yolo_re_tpu.serving import Detector

    model, params, stats = tiny_model
    calls = []
    orig = stem_kernel.stem_conv_packed
    with mock.patch.dict(os.environ, {"YOLO_TPU_PALLAS_INTERPRET": "1"}), \
         mock.patch.object(stem_kernel, "stem_conv_packed",
                           side_effect=lambda *a, **k: calls.append(1)
                           or orig(*a, **k)):
        det = Detector(model, params, stats, img_size=64, conf_thres=0.25)
        single = str(tmp_path / "single.stablehlo")
        det.export(single, batch=1, height=48, width=48)
        assert calls, "single-platform export must trace the stem kernel"
        calls.clear()
        multi = str(tmp_path / "multi.stablehlo")
        det.export(multi, batch=1, height=48, width=48,
                   platforms=("cpu", "tpu"))
        assert not calls, \
            "multi-platform export must strip the Pallas fast paths"

    from jax import export as jexport

    for p in (single, multi):
        with open(p, "rb") as f:
            mlir = jexport.deserialize(f.read()).mlir_module()
        assert "tpu_custom_call" not in mlir, p


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic custom calls only lower on TPU")
def test_export_tpu_keeps_mosaic_custom_call(tiny_model, tmp_path):
    """Single-platform TPU export must RETAIN the Mosaic kernels in the
    serialized artifact (serving.py:160-186's promise; round-4 VERDICT
    next #5) — the deployable is the optimized program, not a stripped
    one — while the portable multi-platform artifact must contain none."""
    from jax import export as jexport

    from yolo_re_tpu.serving import Detector

    model, params, stats = tiny_model
    det = Detector(model, params, stats, img_size=64, conf_thres=0.25)

    single = str(tmp_path / "tpu.stablehlo")
    det.export(single, batch=1, height=48, width=48)
    with open(single, "rb") as f:
        mlir = jexport.deserialize(f.read()).mlir_module()
    assert "tpu_custom_call" in mlir, \
        "single-platform TPU artifact lost the Mosaic kernels"

    multi = str(tmp_path / "multi.stablehlo")
    det.export(multi, batch=1, height=48, width=48,
               platforms=("tpu", "cpu"))
    with open(multi, "rb") as f:
        mlir = jexport.deserialize(f.read()).mlir_module()
    assert "tpu_custom_call" not in mlir, \
        "multi-platform artifact must be portable (no Mosaic custom calls)"
