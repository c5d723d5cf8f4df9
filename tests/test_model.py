"""Model build + forward tests (reference model: tests/test_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_re_tpu.models.config import ModelConfig, parse_yaml
from yolo_re_tpu.models.yolo import YOLO, param_labels


def test_parse_gelan_c():
    cfg = parse_yaml("configs/models/gelan-c.yaml")
    assert cfg.num_classes == 80
    assert len(cfg.layers) == 23


def test_gelan_c_builds_static_strides():
    model = YOLO.from_yaml("configs/models/gelan-c.yaml")
    assert model.strides == (8.0, 16.0, 32.0)
    assert model.plan.detect_inputs == ("fpn2", "pan1", "pan2")


def test_num_classes_override():
    model = YOLO.from_yaml("configs/models/gelan-c.yaml", num_classes=20)
    assert model.num_classes == 20
    head_cfg = model.plan.steps[-1].cfg
    assert head_cfg.num_classes == 20


def test_width_depth_multipliers(tiny_model_path):
    cfg = parse_yaml(tiny_model_path)
    cfg.width_multiplier = 0.5
    cfg.depth_multiplier = 2.0
    model = YOLO.from_config(cfg)
    stem = model.plan.steps[0].cfg
    assert stem.out_channels == 8  # 16 * 0.5
    elan = model.plan.steps[2].cfg
    assert elan.num_repeats == 2


def test_train_forward_shapes(tiny_model):
    model, params, stats = tiny_model
    x = jnp.zeros((2, 64, 64, 3))
    raw, new_stats = model.apply(params, stats, x, train=True)
    # 3 levels of lane-aligned (box 4*16, cls 8) pairs
    assert [(yb.shape, yc.shape) for yb, yc in raw] == [
        ((2, 8, 8, 64), (2, 8, 8, 8)), ((2, 4, 4, 64), (2, 4, 4, 8)),
        ((2, 2, 2, 64), (2, 2, 2, 8))]


def test_eval_forward_decoded(tiny_model):
    model, params, stats = tiny_model
    x = jnp.zeros((1, 64, 64, 3))
    (decoded, raw), _ = model.apply(params, stats, x, train=False)
    assert decoded.shape == (1, 8 * 8 + 4 * 4 + 2 * 2, 4 + 8)
    assert len(raw) == 3


@pytest.mark.parametrize("size", [64, 96, 128])
def test_input_sizes(tiny_model, size):
    model, params, stats = tiny_model
    x = jnp.zeros((1, size, size, 3))
    decoded, raw = model.predict(params, stats, x)
    a = sum((size // s) ** 2 for s in (8, 16, 32))
    assert decoded.shape == (1, a, 12)


def test_param_labels_grouping(tiny_model):
    model, params, _ = tiny_model
    labels = param_labels(params)
    flat = jax.tree_util.tree_leaves(labels)
    assert set(flat) <= {"weight", "bn", "bias"}
    # every conv kernel is 'weight', every BN scale is 'bn'
    stem = labels["stem1"]
    assert stem["w"] == "weight"
    assert stem["scale"] == "bn"
    assert stem["bias"] == "bias"


def test_fused_model_matches(tiny_model):
    model, params, stats = tiny_model
    # perturb stats so folding is non-trivial
    stats = jax.tree_util.tree_map(
        lambda s: s + 0.1 if s.ndim else s, stats)
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3)) * 0.5
    (dec_ref, _), _ = model.apply(params, stats, x, train=False)
    fp, fs = model.fuse(params, stats)
    (dec_fused, _), _ = model.apply(fp, fs, x, train=False)
    np.testing.assert_allclose(np.asarray(dec_ref), np.asarray(dec_fused),
                               atol=2e-3)


def test_fuse_attaches_and_strips_stem_keys():
    """fuse_model must attach the Pallas-stem weight sets to the gelan-c
    stem pair (stem1 gets pallas_stem, its consumer gets packed_rows),
    honor YOLO_TPU_PALLAS_STEM=0, and serving._strip_pallas must remove
    both keys for portable exports."""
    import os

    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.serving import _strip_pallas

    model = YOLO.from_yaml("configs/models/gelan-c.yaml")
    params, stats = model.init(jax.random.key(0))
    fp, _ = model.fuse(params, stats)
    stem_steps = [s.name for s in model.plan.steps[:2]]
    assert "pallas_stem" in fp[stem_steps[0]]
    assert "packed_rows" in fp[stem_steps[1]]
    assert fp[stem_steps[1]]["packed_rows"]["w"].shape[:2] == (2, 3)

    stripped = _strip_pallas(fp)
    assert "pallas_stem" not in stripped[stem_steps[0]]
    assert "packed_rows" not in stripped[stem_steps[1]]

    os.environ["YOLO_TPU_PALLAS_STEM"] = "0"
    try:
        fp0, _ = model.fuse(params, stats)
        assert "pallas_stem" not in fp0[stem_steps[0]]
    finally:
        os.environ.pop("YOLO_TPU_PALLAS_STEM")


def test_programmatic_config():
    cfg = ModelConfig(num_classes=4, layers=[
        {"name": "c1", "type": "Conv", "out_channels": 8, "kernel_size": 3,
         "stride": 2},
        {"name": "c2", "type": "Conv", "out_channels": 16, "kernel_size": 3,
         "stride": 2},
        {"name": "c3", "type": "Conv", "out_channels": 16, "kernel_size": 3,
         "stride": 2},
        {"name": "c4", "type": "Conv", "out_channels": 16, "kernel_size": 3,
         "stride": 2},
        {"name": "c5", "type": "Conv", "out_channels": 16, "kernel_size": 3,
         "stride": 2},
        {"name": "detect", "type": "DetectDFL", "from": ["c3", "c4", "c5"]},
    ])
    model = YOLO.from_config(cfg)
    assert model.strides == (8.0, 16.0, 32.0)
    params, stats = model.init(jax.random.key(0))
    x = jnp.zeros((1, 64, 64, 3))
    raw, _ = model.apply(params, stats, x, train=True)
    assert len(raw) == 3


def test_dual_model_builds_and_forwards(tiny_dual_model_path):
    """yolov9-style dual graph: aux branch, CBLinear/CBFuse, dual head."""
    model = YOLO.from_yaml(tiny_dual_model_path)
    assert model.strides == (8.0, 16.0, 32.0)
    params, stats = model.init(jax.random.key(0))
    x = jnp.zeros((1, 64, 64, 3))
    raw, _ = model.apply(params, stats, x, train=True)
    assert set(raw) == {"aux", "main"}
    assert [(yb.shape, yc.shape) for yb, yc in raw["main"]] == [
        ((1, 8, 8, 64), (1, 8, 8, 8)), ((1, 4, 4, 64), (1, 4, 4, 8)),
        ((1, 2, 2, 64), (1, 2, 2, 8))]
    (decoded, raw2), _ = model.apply(params, stats, x, train=False)
    assert decoded["main"].shape == (1, 84, 12)
    # fusion works through the dual graph
    fp, fs = model.fuse(params, stats)
    (dec_f, _), _ = model.apply(fp, fs, x, train=False)
    assert dec_f["main"].shape == (1, 84, 12)


def test_remat_grads_match(tiny_model):
    """Per-block remat must be numerically transparent (same loss, grads)."""
    import jax
    import jax.numpy as jnp

    model, params, stats = tiny_model
    x = jax.random.uniform(jax.random.key(5), (2, 64, 64, 3))

    def loss(p, remat):
        preds, _ = model.apply(p, stats, x, train=True, remat=remat)
        return sum(l.astype(jnp.float32).sum() for l in
                   jax.tree_util.tree_leaves(preds))

    g0 = jax.grad(lambda p: loss(p, False))(params)
    for mode in (True, "early"):
        g1 = jax.grad(lambda p: loss(p, mode))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
    # "early" must actually select a nonempty strict subset of blocks
    scales = [s.scale for s in model.plan.steps]
    assert any(0 < sc <= 8 for sc in scales) and any(sc > 8 for sc in scales)


def test_remat_arg_validation(tiny_model):
    """remat=1 (YAML/CLI int) must enable remat, not silently disable it;
    unknown strings must raise (round-2 ADVICE)."""
    import jax
    import jax.numpy as jnp

    model, params, stats = tiny_model
    x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))

    def loss(p, remat):
        preds, _ = model.apply(p, stats, x, train=True, remat=remat)
        return sum(l.astype(jnp.float32).sum() for l in
                   jax.tree_util.tree_leaves(preds))

    g_true = jax.grad(lambda p: loss(p, True))(params)
    g_int = jax.grad(lambda p: loss(p, 1))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_true),
                    jax.tree_util.tree_leaves(g_int)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="remat"):
        model.apply(params, stats, x, train=True, remat="full")
