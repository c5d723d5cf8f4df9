"""Loss / assigner tests (reference model: tests/test_loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.loss.tal import LossConfig, TALoss, pad_targets
from yolo_re_tpu.ops.boxes import bbox_iou

NC, REG_MAX = 8, 16
STRIDES = [8, 16, 32]
NO = 4 * REG_MAX + NC


def make_feats(key, batch=2, base=8):
    shapes = [(base, base), (base // 2, base // 2), (base // 4, base // 4)]
    keys = jax.random.split(key, 3)
    return [jax.random.normal(k, (batch, h, w, NO)) * 0.5
            for k, (h, w) in zip(keys, shapes)]


def make_targets(batch=2, max_boxes=4):
    t = np.zeros((batch, max_boxes, 5), np.float32)
    t[0, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    t[0, 1] = [3, 0.25, 0.25, 0.2, 0.3]
    t[1, 0] = [0, 0.7, 0.6, 0.3, 0.2]
    return jnp.asarray(t)


def test_iou_exact():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    iou = float(bbox_iou(a, b)[0, 0])
    assert abs(iou - 1.0) < 1e-5
    c = jnp.asarray([[5.0, 0.0, 15.0, 10.0]])
    iou = float(bbox_iou(a, c)[0, 0])
    assert abs(iou - (50 / 150)) < 1e-5


def test_ciou_leq_iou():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    c = jnp.asarray([[5.0, 2.0, 15.0, 12.0]])
    iou = float(bbox_iou(a, c)[0, 0])
    ciou = float(bbox_iou(a, c, iou_type="ciou")[0, 0])
    assert ciou <= iou + 1e-6


def test_single_head_loss_smoke():
    loss_fn = TALoss(NC, REG_MAX, STRIDES)
    feats = make_feats(jax.random.key(0))
    total, items = loss_fn(feats, make_targets())
    total = float(total)
    items = np.asarray(items)
    assert np.isfinite(total) and total > 0
    assert items.shape == (3,)
    assert np.all(np.isfinite(items))


def test_dual_head_loss_smoke():
    loss_fn = TALoss(NC, REG_MAX, STRIDES)
    preds = {"aux": make_feats(jax.random.key(1)),
             "main": make_feats(jax.random.key(2))}
    total, items = loss_fn(preds, make_targets())
    assert np.isfinite(float(total))
    # aux contributes 0.25x: dual loss > single loss of main branch alone
    total_main, _ = loss_fn(preds["main"], make_targets())
    assert float(total) > float(total_main) * 0.99


def test_empty_targets():
    loss_fn = TALoss(NC, REG_MAX, STRIDES)
    feats = make_feats(jax.random.key(0))
    targets = jnp.zeros((2, 4, 5))
    total, items = loss_fn(feats, targets)
    assert np.isfinite(float(total))
    items = np.asarray(items)
    assert items[0] == 0.0 and items[2] == 0.0  # no box/dfl loss
    assert items[1] > 0.0                       # cls loss still present


def test_config_plumb_through():
    cfg = LossConfig(box_gain=1.0, cls_gain=1.0, dfl_gain=1.0)
    loss_fn = TALoss(NC, REG_MAX, STRIDES, cfg)
    assert loss_fn.config.box_gain == 1.0


def test_grad_flow_no_nans():
    loss_fn = TALoss(NC, REG_MAX, STRIDES)
    feats = make_feats(jax.random.key(3))
    targets = make_targets()

    def objective(feats):
        total, _ = loss_fn(feats, targets)
        return total

    grads = jax.grad(objective)(feats)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


def test_loss_jits():
    loss_fn = TALoss(NC, REG_MAX, STRIDES)
    feats = make_feats(jax.random.key(0))
    targets = make_targets()
    jitted = jax.jit(lambda f, t: loss_fn(f, t)[0])
    eager = float(loss_fn(feats, targets)[0])
    compiled = float(jitted(feats, targets))
    assert abs(eager - compiled) / max(abs(eager), 1) < 1e-4


def test_pad_targets():
    labs = [np.array([[1, 0.5, 0.5, 0.1, 0.1]], np.float32),
            np.zeros((0, 5), np.float32)]
    out = pad_targets(labs, max_boxes=3)
    assert out.shape == (2, 3, 5)
    assert out[0, 0, 0] == 1
    assert np.all(out[1] == 0)



def test_loss_pairs_match_concat_maps():
    """TALoss must produce IDENTICAL losses for the head's native
    (box, cls) pair layout and the reference's concatenated maps — the
    pair path is a pure re-association (no extra rounding)."""
    import numpy as np

    from yolo_re_tpu.loss.tal import TALoss, pad_targets

    rng = np.random.default_rng(0)
    nc, reg_max = 8, 16
    loss_fn = TALoss(nc, reg_max, [8.0, 16.0, 32.0])
    pairs = []
    for s in (16, 8, 4):
        yb = jnp.asarray(rng.standard_normal((2, s, s, 4 * reg_max)) * 0.5,
                         jnp.float32)
        yc = jnp.asarray(rng.standard_normal((2, s, s, nc)) * 0.5,
                         jnp.float32)
        pairs.append((yb, yc))
    maps = [jnp.concatenate([yb, yc], axis=-1) for yb, yc in pairs]
    labels = [np.array([[1, 0.5, 0.5, 0.4, 0.4]], np.float32),
              np.array([[3, 0.25, 0.3, 0.2, 0.25]], np.float32)]
    targets = jnp.asarray(pad_targets(labels, 4))

    total_p, items_p = loss_fn(pairs, targets)
    total_m, items_m = loss_fn(maps, targets)
    np.testing.assert_array_equal(np.asarray(items_p), np.asarray(items_m))
    np.testing.assert_array_equal(np.asarray(total_p), np.asarray(total_m))

    # dual-head: dict of pair lists == dict of concatenated maps
    total_dp, _ = loss_fn({"aux": pairs, "main": pairs}, targets)
    total_dm, _ = loss_fn({"aux": maps, "main": maps}, targets)
    np.testing.assert_array_equal(np.asarray(total_dp), np.asarray(total_dm))
