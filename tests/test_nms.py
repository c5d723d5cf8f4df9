"""Fixed-shape NMS tests."""

import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.ops.nms import nms_to_list, non_max_suppression


def make_pred(boxes_xywh, scores_per_class):
    """(A, 4) + (A, nc) -> (1, A, 4+nc)."""
    return jnp.asarray(
        np.concatenate([boxes_xywh, scores_per_class], axis=1)[None])


def test_nms_suppresses_overlaps():
    boxes = np.array([
        [50, 50, 20, 20],
        [51, 51, 20, 20],   # heavy overlap with 0
        [200, 200, 30, 30],
    ], np.float32)
    scores = np.zeros((3, 2), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8
    scores[2, 1] = 0.7
    out = non_max_suppression(make_pred(boxes, scores), conf_thres=0.25,
                              iou_thres=0.45)
    dets = nms_to_list(out)[0]
    assert dets.shape == (2, 6)
    np.testing.assert_allclose(dets[:, 4], [0.9, 0.7], atol=1e-6)
    assert list(dets[:, 5]) == [0, 1]


def test_nms_class_aware():
    # same box, different classes: both survive class-aware NMS
    boxes = np.array([[50, 50, 20, 20], [50, 50, 20, 20]], np.float32)
    scores = np.zeros((2, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 2] = 0.8
    out = non_max_suppression(make_pred(boxes, scores), conf_thres=0.25,
                              iou_thres=0.45)
    dets = nms_to_list(out)[0]
    assert dets.shape == (2, 6)


def test_nms_agnostic():
    boxes = np.array([[50, 50, 20, 20], [50, 50, 20, 20]], np.float32)
    scores = np.zeros((2, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 2] = 0.8
    out = non_max_suppression(make_pred(boxes, scores), conf_thres=0.25,
                              iou_thres=0.45, agnostic=True)
    dets = nms_to_list(out)[0]
    assert dets.shape == (1, 6)


def test_nms_classes_filter():
    # reference utils/nms.py:57-60 — keep only the requested class indices
    boxes = np.array([
        [50, 50, 20, 20],
        [200, 200, 30, 30],
        [300, 100, 30, 30],
    ], np.float32)
    scores = np.zeros((3, 4), np.float32)
    scores[0, 0] = 0.9
    scores[1, 2] = 0.8
    scores[2, 3] = 0.7
    pred = make_pred(boxes, scores)
    dets = nms_to_list(non_max_suppression(pred, classes=(0, 3)))[0]
    assert dets.shape == (2, 6)
    assert sorted(dets[:, 5]) == [0, 3]
    dets = nms_to_list(non_max_suppression(pred, classes=(2,)))[0]
    assert dets.shape == (1, 6)
    assert dets[0, 5] == 2


def test_nms_conf_filter():
    boxes = np.array([[50, 50, 20, 20]], np.float32)
    scores = np.full((1, 2), 0.1, np.float32)
    out = non_max_suppression(make_pred(boxes, scores), conf_thres=0.25)
    assert nms_to_list(out)[0].shape == (0, 6)


def test_nms_max_det_cap():
    rng = np.random.default_rng(0)
    n = 50
    boxes = np.stack([rng.uniform(0, 600, n), rng.uniform(0, 600, n),
                      rng.uniform(5, 10, n), rng.uniform(5, 10, n)], axis=1)
    scores = rng.uniform(0.5, 1.0, (n, 1)).astype(np.float32)
    out = non_max_suppression(make_pred(boxes.astype(np.float32), scores),
                              conf_thres=0.25, max_det=10)
    dets = nms_to_list(out)[0]
    assert dets.shape[0] == 10
    # sorted by score descending
    assert np.all(np.diff(dets[:, 4]) <= 1e-6)


def test_nms_xywh_to_xyxy_output():
    boxes = np.array([[100, 100, 20, 40]], np.float32)
    scores = np.array([[0.9]], np.float32)
    out = non_max_suppression(make_pred(boxes, scores), conf_thres=0.25)
    dets = nms_to_list(out)[0]
    np.testing.assert_allclose(dets[0, :4], [90, 80, 110, 120], atol=1e-4)


def test_pallas_backend_matches_xla():
    rng = np.random.default_rng(1)
    n = 64
    boxes = np.stack([rng.uniform(0, 600, n), rng.uniform(0, 600, n),
                      rng.uniform(10, 60, n), rng.uniform(10, 60, n)],
                     axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pred = make_pred(boxes, scores)
    out_x = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                max_det=20, backend="xla")
    out_p = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                max_det=20, backend="pallas")
    np.testing.assert_array_equal(np.asarray(out_x["valid"]),
                                  np.asarray(out_p["valid"]))
    np.testing.assert_allclose(np.asarray(out_x["boxes"]),
                               np.asarray(out_p["boxes"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_x["classes"]),
                                  np.asarray(out_p["classes"]))


def test_nms_batched():
    boxes = np.array([[50, 50, 20, 20]], np.float32)
    s1 = np.array([[0.9]], np.float32)
    s2 = np.array([[0.1]], np.float32)
    pred = jnp.asarray(np.stack([
        np.concatenate([boxes, s1], 1),
        np.concatenate([boxes, s2], 1)]))
    out = non_max_suppression(pred, conf_thres=0.25)
    dets = nms_to_list(out)
    assert dets[0].shape == (1, 6)
    assert dets[1].shape == (0, 6)


def test_nms_raw_matches_decoded(tiny_model):
    """Lazy-decode NMS (raw streams) == NMS over the fully decoded tensor."""
    import jax

    from yolo_re_tpu.ops.boxes import make_anchors_np
    from yolo_re_tpu.ops.nms import non_max_suppression, non_max_suppression_raw

    model, params, stats = tiny_model
    x = jax.random.uniform(jax.random.key(3), (2, 64, 64, 3))
    (decoded, _), _ = model.apply(params, stats, x, train=False)
    (box_l, cls_l), _ = model.apply(params, stats, x, train=False,
                                    head_mode="split")

    shapes = [(64 // int(s), 64 // int(s)) for s in model.strides]
    anchors, stride_col = make_anchors_np(shapes, model.strides)

    a = non_max_suppression(decoded, conf_thres=0.01, iou_thres=0.5)
    b = non_max_suppression_raw(box_l, cls_l, jnp.asarray(anchors),
                                jnp.asarray(stride_col),
                                conf_thres=0.01, iou_thres=0.5)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(np.asarray(a[k], np.float32),
                                   np.asarray(b[k], np.float32),
                                   atol=1e-4, err_msg=k)


def test_nms_agnostic_mode():
    """agnostic=True suppresses across classes (no class-offset trick)."""
    from yolo_re_tpu.ops.nms import non_max_suppression

    # two identical boxes, different classes, both confident
    pred = np.zeros((1, 2, 4 + 3), np.float32)
    pred[0, :, :4] = [50, 50, 20, 20]   # same xywh box
    pred[0, 0, 4] = 0.9                 # class 0
    pred[0, 1, 5] = 0.8                 # class 1
    per_class = non_max_suppression(jnp.asarray(pred), conf_thres=0.1,
                                    iou_thres=0.5, backend="xla")
    agnostic = non_max_suppression(jnp.asarray(pred), conf_thres=0.1,
                                   iou_thres=0.5, agnostic=True,
                                   backend="xla")
    assert int(per_class["valid"].sum()) == 2   # kept: different classes
    assert int(agnostic["valid"].sum()) == 1    # suppressed across classes


# ---------------------------------------------------------------------------
# Dense-GT regime (round-2 VERDICT Weak #2): at mAP-eval thresholds a busy
# image clears conf 0.001 on far more anchors than any fixed candidate cap.
# The reference's host NMS considers every one (src/yolo/utils/nms.py:49-55);
# at eval thresholds pre_topk now defaults to ALL anchors to match.
# ---------------------------------------------------------------------------

def _ref_nms_numpy(boxes_xywh, cls_scores, conf_thres, iou_thres,
                   max_det=300):
    """Reference-semantics host NMS (greedy, class-offset, score order) over
    EVERY anchor above conf — the oracle for dense scenes."""
    conf = cls_scores.max(axis=1)
    cls = cls_scores.argmax(axis=1)
    m = conf > conf_thres
    boxes_xywh, conf, cls = boxes_xywh[m], conf[m], cls[m]
    xy, wh = boxes_xywh[:, :2], boxes_xywh[:, 2:]
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=1)
    off = boxes + cls[:, None].astype(np.float32) * 7680.0
    order = np.argsort(-conf)
    keep, removed = [], np.zeros(len(conf), bool)
    areas = (off[:, 2] - off[:, 0]) * (off[:, 3] - off[:, 1])
    for i in order:
        if removed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_det:
            break
        lt = np.maximum(off[i, :2], off[:, :2])
        rb = np.minimum(off[i, 2:], off[:, 2:])
        inter = np.clip(rb - lt, 0, None).prod(axis=1)
        iou = inter / (areas[i] + areas - inter)
        removed |= iou > iou_thres
    keep = np.asarray(keep, int)
    return boxes[keep], conf[keep], cls[keep]


def test_dense_scene_matches_host_oracle():
    """~5000 of 8400 anchors above conf 0.001 (a 50+ object scene): the
    eval-mode default must consider them all and agree with the host
    oracle detection-for-detection."""
    rng = np.random.default_rng(0)
    a, nc = 8400, 8
    boxes = np.stack([
        rng.uniform(40, 600, a), rng.uniform(40, 600, a),
        rng.uniform(10, 80, a), rng.uniform(10, 80, a)], axis=1)
    boxes = boxes.astype(np.float32)
    scores = np.zeros((a, nc), np.float32)
    cls = rng.integers(0, nc, a)
    # ~60% of anchors clear 0.001 — far beyond the old 2048 cap; scores
    # drawn continuous so the greedy order is unambiguous
    lvl = np.where(rng.random(a) < 0.6,
                   rng.uniform(0.002, 0.9, a), rng.uniform(0, 0.0005, a))
    scores[np.arange(a), cls] = lvl.astype(np.float32)

    out = non_max_suppression(make_pred(boxes, scores), conf_thres=0.001,
                              iou_thres=0.6, max_det=300)
    dets = nms_to_list(out)[0]
    rb, rconf, rcls = _ref_nms_numpy(boxes, scores, 0.001, 0.6, 300)

    assert len(dets) == len(rb)
    assert len(dets) > 250  # dense: the max_det budget is actually used
    np.testing.assert_allclose(dets[:, 4], rconf, rtol=1e-6)
    np.testing.assert_array_equal(dets[:, 5].astype(int), rcls)
    np.testing.assert_allclose(dets[:, :4], rb, rtol=1e-4, atol=1e-3)


def test_eval_thresholds_default_covers_all_anchors():
    """A detection ranked below the old 2048-candidate cap must survive:
    put 2500 clustered high-score anchors (mutually suppressed down to a
    few) plus one isolated low-score box — the isolated box must appear."""
    a, nc = 4000, 2
    boxes = np.tile(np.array([[100, 100, 30, 30]], np.float32), (a, 1))
    boxes += np.random.default_rng(1).uniform(-0.5, 0.5, (a, 4)).astype(
        np.float32)
    scores = np.zeros((a, nc), np.float32)
    scores[:, 0] = np.linspace(0.9, 0.1, a)
    # the isolated detection, weaker than 3000 clustered ones
    boxes[-1] = [500, 500, 40, 40]
    scores[-1] = [0.0, 0.05]
    out = non_max_suppression(make_pred(boxes, scores), conf_thres=0.001,
                              iou_thres=0.6, max_det=300)
    dets = nms_to_list(out)[0]
    assert (dets[:, 5] == 1).sum() == 1  # the isolated class-1 box survived
    cap_out = non_max_suppression(make_pred(boxes, scores), conf_thres=0.001,
                                  iou_thres=0.6, max_det=300, pre_topk=2048)
    cap_dets = nms_to_list(cap_out)[0]
    assert (cap_dets[:, 5] == 1).sum() == 0  # the old cap dropped it


def _dense_batch(counts, a=8400, nc=8, seed=3):
    """One batch with per-image conf-passing candidate counts `counts`."""
    rng = np.random.default_rng(seed)
    b = len(counts)
    pred = np.zeros((b, a, 4 + nc), np.float32)
    for i, n in enumerate(counts):
        boxes = np.stack([
            rng.uniform(40, 600, a), rng.uniform(40, 600, a),
            rng.uniform(10, 80, a), rng.uniform(10, 80, a)], axis=1)
        cls = rng.integers(0, nc, a)
        lvl = np.where(np.arange(a) < n,
                       rng.uniform(0.002, 0.9, a), 0.0)
        rng.shuffle(lvl)
        pred[i, :, :4] = boxes
        pred[i, np.arange(a), 4 + cls] = lvl
    return jnp.asarray(pred)


def test_adaptive_eval_dispatch_exact_per_bucket():
    """The adaptive K-bucket dispatch (default at eval conf) must be
    detection-for-detection identical to the forced all-anchor program in
    every bucket regime: sparse (<=512), medium (<=2048), dense (>2048),
    and a mixed batch whose densest image drives the bucket choice."""
    for counts in ([40], [900], [1300], [5000], [40, 900], [40, 5000]):
        pred = _dense_batch(counts)
        ada = non_max_suppression(pred, conf_thres=0.001, iou_thres=0.6)
        full = non_max_suppression(pred, conf_thres=0.001, iou_thres=0.6,
                                   adaptive=False)
        for k in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_array_equal(
                np.asarray(ada[k]), np.asarray(full[k]),
                err_msg=f"counts={counts} key={k}")


def test_adaptive_dispatch_program_shape():
    """The eval-conf default really is the bucket dispatch (a cond over
    compiled K branches), and serving conf / adaptive=False are not."""
    import jax

    pred = _dense_batch([10])

    def eval_nms(p):
        return non_max_suppression.__wrapped__(p, conf_thres=0.001,
                                               iou_thres=0.6)

    def serve_nms(p):
        return non_max_suppression.__wrapped__(p, conf_thres=0.25,
                                               iou_thres=0.45)

    def forced(p):
        return non_max_suppression.__wrapped__(p, conf_thres=0.001,
                                               iou_thres=0.6,
                                               adaptive=False)

    assert "cond" in str(jax.make_jaxpr(eval_nms)(pred))
    assert "cond" not in str(jax.make_jaxpr(serve_nms)(pred))
    assert "cond" not in str(jax.make_jaxpr(forced)(pred))


def test_adaptive_respects_classes_filter():
    """The adaptive candidate count is computed on the FILTERED confidences
    (class filter applied first), and the dispatched program's output is
    identical to the forced all-anchor program under the same filter —
    including when unwanted-class anchors vastly outnumber wanted ones."""
    rng = np.random.default_rng(9)
    a, nc = 8400, 8
    boxes = np.stack([
        rng.uniform(40, 600, a), rng.uniform(40, 600, a),
        rng.uniform(10, 80, a), rng.uniform(10, 80, a)], axis=1)
    scores = np.zeros((a, nc), np.float32)
    cls = np.where(np.arange(a) < 100, 2, 5)  # 100 wanted, 8300 unwanted
    rng.shuffle(cls)
    scores[np.arange(a), cls] = rng.uniform(0.01, 0.9, a)
    pred = make_pred(boxes.astype(np.float32), scores)

    ada = non_max_suppression(pred, conf_thres=0.001, iou_thres=0.6,
                              classes=(2,))
    full = non_max_suppression(pred, conf_thres=0.001, iou_thres=0.6,
                               classes=(2,), adaptive=False)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(ada[k]),
                                      np.asarray(full[k]), err_msg=k)
    dets = nms_to_list(ada)[0]
    assert len(dets) and set(dets[:, 5].astype(int)) == {2}
