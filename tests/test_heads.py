"""Head / anchor / DFL numeric tests (reference model: tests/test_heads.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.models.heads import (
    DetectDFL,
    DetectDFLConfig,
    DualDetectDFL,
    DualDetectDFLConfig,
)
from yolo_re_tpu.ops.boxes import dfl_decode, dist2bbox, make_anchors_np


def test_dfl_decode_range():
    x = jax.random.normal(jax.random.key(0), (2, 100, 64)) * 5
    y = dfl_decode(x, reg_max=16)
    assert y.shape == (2, 100, 4)
    assert float(y.min()) >= 0.0
    assert float(y.max()) <= 15.0


def test_dfl_decode_onehot_peak():
    # a huge logit at bin k decodes to ~k
    x = np.full((1, 1, 64), -20.0, np.float32)
    x[0, 0, 7] = 20.0       # coord 0, bin 7
    x[0, 0, 16 + 3] = 20.0  # coord 1, bin 3
    y = np.asarray(dfl_decode(jnp.asarray(x), 16))
    assert abs(y[0, 0, 0] - 7) < 1e-3
    assert abs(y[0, 0, 1] - 3) < 1e-3


def test_make_anchors_count_and_offset():
    anchors, strides = make_anchors_np([(80, 80), (40, 40), (20, 20)],
                                       [8, 16, 32])
    assert anchors.shape == (8400, 2)
    assert strides.shape == (8400, 1)
    np.testing.assert_allclose(anchors[0], [0.5, 0.5])
    np.testing.assert_allclose(anchors[1], [1.5, 0.5])  # x varies first
    assert strides[0, 0] == 8
    assert strides[-1, 0] == 32


def test_dist2bbox_exact():
    anchor = jnp.asarray([[10.0, 10.0]])
    dist = jnp.asarray([[2.0, 3.0, 4.0, 5.0]])  # l, t, r, b
    xyxy = np.asarray(dist2bbox(dist, anchor, xywh=False))
    np.testing.assert_allclose(xyxy, [[8.0, 7.0, 14.0, 15.0]])
    xywh = np.asarray(dist2bbox(dist, anchor, xywh=True))
    np.testing.assert_allclose(xywh, [[11.0, 11.0, 6.0, 8.0]])


def test_detect_dfl_shapes():
    cfg = DetectDFLConfig(num_classes=8, in_channels=(32, 48, 64),
                          strides=(8, 16, 32))
    params, stats = DetectDFL.init(jax.random.key(0), cfg)
    feats = [jnp.zeros((2, 8, 8, 32)), jnp.zeros((2, 4, 4, 48)),
             jnp.zeros((2, 2, 2, 64))]
    raw, _ = DetectDFL.apply(cfg, params, stats, feats, train=True)
    # train keeps lane-aligned (box, cls) pairs (no 72-channel concat)
    assert [(yb.shape, yc.shape) for yb, yc in raw] == [
        ((2, 8, 8, 64), (2, 8, 8, 8)), ((2, 4, 4, 64), (2, 4, 4, 8)),
        ((2, 2, 2, 64), (2, 2, 2, 8))]
    (decoded, raw2), _ = DetectDFL.apply(cfg, params, stats, feats,
                                         train=False)
    assert decoded.shape == (2, 84, 12)


def test_detect_bias_init():
    cfg = DetectDFLConfig(num_classes=80, in_channels=(64, 64, 64),
                          strides=(8, 16, 32))
    params, _ = DetectDFL.init(jax.random.key(0), cfg)
    np.testing.assert_allclose(np.asarray(params["towers"][0]["box"][2]["b"]),
                               1.0)
    expected = np.log(5 / 80 / (640 / 8) ** 2)
    np.testing.assert_allclose(np.asarray(params["towers"][0]["cls"][2]["b"]),
                               expected, rtol=1e-6)


def test_dual_detect_shapes():
    cfg = DualDetectDFLConfig(num_classes=8,
                              in_channels=(32, 48, 64, 32, 48, 64),
                              strides=(8, 16, 32))
    params, stats = DualDetectDFL.init(jax.random.key(0), cfg)
    feats = [jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 4, 4, 48)),
             jnp.zeros((1, 2, 2, 64))] * 2
    raw, _ = DualDetectDFL.apply(cfg, params, stats, feats, train=True)
    assert set(raw) == {"aux", "main"}
    assert len(raw["aux"]) == 3 and len(raw["main"]) == 3
    (decoded, raw2), _ = DualDetectDFL.apply(cfg, params, stats, feats,
                                             train=False)
    assert decoded["aux"].shape == (1, 84, 12)
    assert decoded["main"].shape == (1, 84, 12)


def test_train_pairs_kill_switch_restores_reference_layout():
    """YOLO_TPU_TRAIN_PAIRS=0 (trace-time) makes the train head emit the
    reference's concatenated per-level maps; values equal the pairs path's
    concat exactly (the switch only moves where the concat happens)."""
    import os

    cfg = DetectDFLConfig(num_classes=8, in_channels=(32, 48, 64),
                          strides=(8, 16, 32))
    params, stats = DetectDFL.init(jax.random.key(0), cfg)
    feats = [jax.random.normal(jax.random.key(i + 1), (2, s, s, c))
             for i, (s, c) in enumerate([(8, 32), (4, 48), (2, 64)])]
    pairs, _ = DetectDFL.apply(cfg, params, stats, feats, train=True)
    os.environ["YOLO_TPU_TRAIN_PAIRS"] = "0"
    try:
        maps, _ = DetectDFL.apply(cfg, params, stats, feats, train=True)
    finally:
        del os.environ["YOLO_TPU_TRAIN_PAIRS"]
    assert [m.shape for m in maps] == [(2, 8, 8, 72), (2, 4, 4, 72),
                                       (2, 2, 2, 72)]
    for m, (yb, yc) in zip(maps, pairs):
        np.testing.assert_array_equal(
            np.asarray(m), np.asarray(jnp.concatenate([yb, yc], axis=-1)))
