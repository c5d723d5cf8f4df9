"""Per-block shape and invariant tests (reference model: tests/test_blocks.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_re_tpu.models import blocks as B


def run(block, cfg, x, key=0, train=False):
    params, stats = block.init(jax.random.key(key), cfg)
    y, ns = block.apply(cfg, params, stats, x, train=train)
    return y, params, stats, ns


def test_conv_shapes():
    x = jnp.ones((2, 16, 16, 8))
    y, *_ = run(B.Conv, B.ConvConfig(8, 16, 3, 1), x)
    assert y.shape == (2, 16, 16, 16)
    y, *_ = run(B.Conv, B.ConvConfig(8, 16, 3, 2), x)
    assert y.shape == (2, 8, 8, 16)
    y, *_ = run(B.Conv, B.ConvConfig(8, 16, 1, 1), x)
    assert y.shape == (2, 16, 16, 16)


def test_conv_groups():
    x = jnp.ones((1, 8, 8, 8))
    y, *_ = run(B.Conv, B.ConvConfig(8, 16, 3, 1, groups=4), x)
    assert y.shape == (1, 8, 8, 16)


def test_conv_train_updates_stats():
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4)) * 3 + 1
    cfg = B.ConvConfig(4, 8, 3)
    params, stats = B.Conv.init(jax.random.key(0), cfg)
    _, ns = B.Conv.apply(cfg, params, stats, x, train=True)
    assert not np.allclose(np.asarray(ns["mean"]), 0.0)
    # eval leaves stats untouched
    _, ns2 = B.Conv.apply(cfg, params, stats, x, train=False)
    assert np.allclose(np.asarray(ns2["mean"]), 0.0)


def test_repconv():
    x = jnp.ones((2, 16, 16, 8))
    y, *_ = run(B.RepConv, B.RepConvConfig(8, 16), x)
    assert y.shape == (2, 16, 16, 16)
    with pytest.raises(AssertionError):
        B.RepConv.init(jax.random.key(0), B.RepConvConfig(8, 16, kernel_size=5))


def test_repconv_fuse_matches_eval():
    cfg = B.RepConvConfig(8, 16)
    params, stats = B.RepConv.init(jax.random.key(0), cfg)
    # randomize stats so the fold is non-trivial
    stats = jax.tree_util.tree_map(
        lambda s: s + jax.random.uniform(jax.random.key(1), s.shape) * 0.3,
        stats)
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 8))
    y_ref, _ = B.RepConv.apply(cfg, params, stats, x, train=False)
    fp, fs = B.RepConv.fuse(cfg, params, stats)
    y_fused, _ = B.RepConv.apply(cfg, fp, fs, x, train=False)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused),
                               atol=1e-4)


def test_bottleneck_residual():
    x = jnp.ones((1, 8, 8, 16))
    y, *_ = run(B.RepNBottleneck, B.RepNBottleneckConfig(16, 16, shortcut=True), x)
    assert y.shape == (1, 8, 8, 16)
    y2, *_ = run(B.RepNBottleneck,
                 B.RepNBottleneckConfig(16, 32, shortcut=True), x)
    assert y2.shape == (1, 8, 8, 32)


def test_repncsp():
    x = jnp.ones((1, 8, 8, 16))
    y, *_ = run(B.RepNCSP, B.RepNCSPConfig(16, 32, num_repeats=2), x)
    assert y.shape == (1, 8, 8, 32)


def test_repncspelan4():
    x = jnp.ones((1, 16, 16, 32))
    cfg = B.RepNCSPELAN4Config(32, 64, hidden_channels=32, block_channels=16)
    y, *_ = run(B.RepNCSPELAN4, cfg, x)
    assert y.shape == (1, 16, 16, 64)


def test_sppelan():
    x = jnp.ones((1, 16, 16, 32))
    y, *_ = run(B.SPPELAN, B.SPPELANConfig(32, 64, 16), x)
    assert y.shape == (1, 16, 16, 64)


def test_adown_halves_spatial():
    x = jnp.ones((2, 16, 16, 32))
    y, *_ = run(B.ADown, B.ADownConfig(32, 64), x)
    assert y.shape == (2, 8, 8, 64)


def test_cblinear_split_shapes():
    x = jnp.ones((1, 8, 8, 16))
    cfg = B.CBLinearConfig(16, (4, 8, 12))
    y, *_ = run(B.CBLinear, cfg, x)
    assert isinstance(y, tuple)
    assert [t.shape[-1] for t in y] == [4, 8, 12]


def test_cbfuse_interpolates_and_sums():
    cfg = B.CBFuseConfig(idx=(0, 1))
    t1 = (jnp.ones((1, 4, 4, 8)), jnp.ones((1, 4, 4, 8)) * 2)
    t2 = (jnp.zeros((1, 8, 8, 8)), jnp.ones((1, 8, 8, 8)) * 3)
    target = jnp.ones((1, 8, 8, 8))
    y, _ = B.CBFuse.apply(cfg, {}, {}, [t1, t2, target])
    assert y.shape == (1, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(y), 1.0 + 1.0 + 3.0)


def test_concat():
    a = jnp.ones((1, 4, 4, 8))
    b = jnp.ones((1, 4, 4, 16))
    y, _ = B.Concat.apply(B.ConcatConfig(), {}, {}, [a, b])
    assert y.shape == (1, 4, 4, 24)


def test_silence_identity():
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 8))
    y, _ = B.Silence.apply(B.SilenceConfig(), {}, {}, x)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_upsample():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y, _ = B.Upsample.apply(B.UpsampleConfig(scale_factor=2), {}, {}, x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, :2, :2, 0]),
                               [[0, 0], [0, 0]])
    np.testing.assert_allclose(np.asarray(y[0, 2:, 2:, 0]),
                               [[3, 3], [3, 3]])


def test_registry():
    assert B.get_block_class("Conv") is B.Conv
    with pytest.raises(ValueError):
        B.get_block_class("NopeBlock")


def test_packed_elan_matches_fused():
    """Width-packed stage1 rewrite (ops/packed_elan.py) must reproduce the
    regular fused graph exactly (same f32 sums, re-associated)."""
    from yolo_re_tpu.models.fuse import _fuse

    cfg = B.RepNCSPELAN4Config(96, 256, hidden_channels=128,
                               block_channels=64, num_repeats=2)
    params, stats = B.RepNCSPELAN4.init(jax.random.key(0), cfg)
    stats = jax.tree_util.tree_map(
        lambda s: s + jax.random.uniform(jax.random.key(1), s.shape) * 0.3,
        stats)
    fp, fs = _fuse(B.RepNCSPELAN4, cfg, params, stats)
    assert "packed" in fp

    x = jax.random.normal(jax.random.key(2), (2, 8, 16, 96))
    y_packed, _ = B.RepNCSPELAN4.apply(cfg, fp, fs, x, train=False)
    fp_plain = {k: v for k, v in fp.items() if k != "packed"}
    y_plain, _ = B.RepNCSPELAN4.apply(cfg, fp_plain, fs, x, train=False)
    assert y_packed.shape == (2, 8, 16, 256)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_plain),
                               atol=2e-5)

    # width not divisible by 4 -> falls back to the plain fused graph
    x_odd = jax.random.normal(jax.random.key(3), (2, 8, 10, 96))
    y_odd, _ = B.RepNCSPELAN4.apply(cfg, fp, fs, x_odd, train=False)
    assert y_odd.shape == (2, 8, 10, 256)


def test_packed_elan_not_built_for_wide_blocks():
    from yolo_re_tpu.models.fuse import _fuse

    cfg = B.RepNCSPELAN4Config(64, 128, hidden_channels=64,
                               block_channels=32, num_repeats=1)
    params, stats = B.RepNCSPELAN4.init(jax.random.key(0), cfg)
    fp, _ = _fuse(B.RepNCSPELAN4, cfg, params, stats)
    assert "packed" not in fp



def test_pallas_adown_matches_fused():
    """The fused Pallas ADown kernel (packed input, interpret mode on CPU)
    must reproduce the regular fused ADown graph."""
    from yolo_re_tpu.models.fuse import _fuse
    from yolo_re_tpu.ops.pallas.adown_kernel import (
        adown_from_packed,
        build_adown_kernel_weights,
    )

    acfg = B.ADownConfig(256, 256)
    ap, as_ = B.ADown.init(jax.random.key(1), acfg)
    afp, afs = _fuse(B.ADown, acfg, ap, as_)
    wk = build_adown_kernel_weights(afp, dtype=jnp.float32)

    for h, w in ((16, 16), (8, 24), (48, 16)):
        x = jax.random.normal(jax.random.key(2), (2, h, w, 256))
        y_ref, _ = B.ADown.apply(acfg, afp, afs, x, train=False)
        xp = x.reshape(2, h, w // 2, 512)
        y_pal = adown_from_packed(xp, wk, interpret=True)
        assert y_pal.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                   atol=2e-5)


def test_packed_next_conv_matches_unpacked():
    """A k3 s2 p1 conv rewritten by pack_next_conv_weights over the
    row-paired packed stem output must equal the conv on NHWC input,
    including the top/bottom edge rows."""
    from yolo_re_tpu.models.fuse import _fuse
    from yolo_re_tpu.ops.pallas.stem_kernel import pack_next_conv_weights

    cfg = B.ConvConfig(64, 128, kernel_size=3, stride=2)
    p, s = B.Conv.init(jax.random.key(5), cfg)
    fp, _ = _fuse(B.Conv, cfg, p, s)
    w2 = pack_next_conv_weights(fp)["w"]

    x = jax.random.normal(jax.random.key(6), (2, 16, 24, 64))
    y_ref = jax.lax.conv_general_dilated(
        x, fp["w"], (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    packed = jnp.transpose(x.reshape(2, 8, 2, 24, 64),
                           (0, 1, 3, 2, 4)).reshape(2, 8, 24, 128)
    y_pk = jax.lax.conv_general_dilated(
        packed, w2, (1, 2), ((1, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert y_pk.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               atol=2e-5)


def test_packed_stem_pair_end_to_end():
    """stem_conv_packed (interpret) chained into next_conv_from_packed must
    equal Conv(3->64,k3,s2) -> Conv(64->128,k3,s2) on the fused graph."""
    from yolo_re_tpu.models.fuse import _fuse
    from yolo_re_tpu.ops.pallas.stem_kernel import (
        build_stem_kernel_weights,
        pack_next_conv_weights,
        stem_conv_packed,
    )
    from yolo_re_tpu.ops.stem_packed import next_conv_from_packed

    c1 = B.ConvConfig(3, 64, kernel_size=3, stride=2)
    c2 = B.ConvConfig(64, 128, kernel_size=3, stride=2)
    p1, s1 = B.Conv.init(jax.random.key(7), c1)
    p2, s2 = B.Conv.init(jax.random.key(8), c2)
    f1, fs1 = _fuse(B.Conv, c1, p1, s1)
    f2, fs2 = _fuse(B.Conv, c2, p2, s2)

    x = jax.random.normal(jax.random.key(9), (2, 32, 48, 3))
    y_ref, _ = B.Conv.apply(c1, f1, fs1, x, train=False)
    y_ref, _ = B.Conv.apply(c2, f2, fs2, y_ref, train=False)

    packed = stem_conv_packed(x, build_stem_kernel_weights(f1),
                              interpret=True)
    y_pk = next_conv_from_packed(packed, pack_next_conv_weights(f2), "silu")
    assert y_pk.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               atol=3e-5)


def test_pallas_conv3_matches_xla():
    """The packed-native stride-1 3x3 conv kernel (interpret mode) must
    match the XLA conv+SiLU at bf16-accumulation tolerance on all edges."""
    from yolo_re_tpu.ops.pallas.conv3_kernel import (
        build_conv3_weights,
        conv3_silu,
    )

    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    wk = build_conv3_weights({"w": w, "b": b})
    for bs, h, wd in ((2, 16, 16), (1, 8, 24), (1, 32, 16)):
        x = jnp.asarray(rng.standard_normal((bs, h, wd, 64)), jnp.bfloat16)
        y = conv3_silu(x, wk, interpret=True).astype(jnp.float32)
        yr = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + b
        yr = (yr * jax.nn.sigmoid(yr)).astype(jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(yr.astype(jnp.float32)),
                                   atol=0.05)


def test_pallas_stem_matches_fused_conv():
    """The Pallas stem kernel (interpret mode on CPU) must reproduce the
    fused stem Conv (3->Cout, k3 s2 p1, SiLU) including all four edges."""
    from yolo_re_tpu.models.fuse import _fuse
    from yolo_re_tpu.ops.pallas.stem_kernel import (
        build_stem_kernel_weights,
        stem_conv,
    )

    cfg = B.ConvConfig(3, 64, kernel_size=3, stride=2)
    p, s = B.Conv.init(jax.random.key(3), cfg)
    fp, fs = _fuse(B.Conv, cfg, p, s)
    wk = build_stem_kernel_weights(fp)

    for bsz, h, w in ((2, 32, 32), (1, 24, 40), (1, 64, 32)):
        x = jax.random.normal(jax.random.key(4), (bsz, h, w, 3))
        y_ref, _ = B.Conv.apply(cfg, fp, fs, x, train=False)
        y_pal = stem_conv(x, wk, interpret=True)
        assert y_pal.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                   atol=2e-5)


def test_packed_elan_train_matches_direct():
    """Width-packed TRAIN path (ops/packed_elan_train.py): same bf16 conv
    sums re-associated, so forward activations, every BN running-stat
    update, and every raw-weight gradient must match the direct train
    graph to bf16 resolution."""
    cfg = B.RepNCSPELAN4Config(96, 256, hidden_channels=128,
                               block_channels=64, num_repeats=2)
    params, stats = B.RepNCSPELAN4.init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(2), (2, 8, 16, 96),
                          jnp.bfloat16)

    y_packed, ns_packed = B.RepNCSPELAN4.apply(cfg, params, stats, x,
                                               train=True)
    import os
    os.environ["YOLO_TPU_PACKED_TRAIN"] = "0"
    try:
        y_direct, ns_direct = B.RepNCSPELAN4.apply(cfg, params, stats, x,
                                                   train=True)
    finally:
        del os.environ["YOLO_TPU_PACKED_TRAIN"]
    assert y_packed.dtype == y_direct.dtype == jnp.bfloat16

    # same f32-accumulated sums re-associated then bf16-rounded: measured
    # ≤2 bf16 ulps on <0.05% of elements (backend-dependent fusion order)
    np.testing.assert_allclose(np.asarray(y_packed, np.float32),
                               np.asarray(y_direct, np.float32),
                               rtol=0.05, atol=0.02)
    # BN running-stat updates: f32 phase-folded moments vs f32 one-pass
    flat_p = jax.tree_util.tree_leaves_with_path(ns_packed)
    flat_d = jax.tree_util.tree_leaves(ns_direct)
    assert len(flat_p) == len(flat_d)
    for (path, a), b in zip(flat_p, flat_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))

    # gradients w.r.t. every raw weight leaf
    def loss(fn_env):
        def f(p):
            if fn_env is not None:
                os.environ["YOLO_TPU_PACKED_TRAIN"] = fn_env
            try:
                y, _ = B.RepNCSPELAN4.apply(cfg, p, stats, x, train=True)
            finally:
                os.environ.pop("YOLO_TPU_PACKED_TRAIN", None)
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) % 7
            return (y.astype(jnp.float32) * w).mean()
        return f

    g_packed = jax.grad(loss(None))(params)
    g_direct = jax.grad(loss("0"))(params)
    # Tolerance calibration: the DIRECT path compared against itself
    # (eager vs jit — same graph, different fusion order) already shows
    # up to 8% rel-L2 on the BN bias leaves (bf16 re-association noise on
    # heavily-cancelled sums), so tight per-leaf bounds are meaningless
    # there. What a real routing/packing bug looks like instead: a
    # permuted or dropped gradient, rel L2 ~ 1.0-1.4. Weight grads are
    # cancellation-light — they get a tight bound; the global vector
    # (dominated by weights but covering all routing) gets one too.
    flat_p = jax.tree_util.tree_leaves_with_path(g_packed)
    flat_d = jax.tree_util.tree_leaves(g_direct)
    all_p = np.concatenate([np.asarray(a, np.float32).ravel()
                            for _, a in flat_p])
    all_d = np.concatenate([np.asarray(b, np.float32).ravel()
                            for b in flat_d])
    # Measured noise floor: direct-vs-direct (eager vs jit) global rel L2
    # is 4.0%; packed-vs-direct measures 1.2-2.4% — BELOW the direct
    # path's own fusion-order noise. Bounds are ~3x the floor: they
    # tolerate bf16 re-association while still catching any real routing
    # bug (a permuted/dropped grad measures rel L2 >= 1.0).
    rel_all = np.linalg.norm(all_p - all_d) / np.linalg.norm(all_d)
    assert rel_all < 0.12, f"global grad rel L2 {rel_all:.4f}"
    for (path, a), b in zip(flat_p, flat_d):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        name = jax.tree_util.keystr(path)
        # BN bias/scale grads with near-zero norms are cancellation-
        # dominated (measured up to ~0.6 pure noise); a dropped leaf
        # measures exactly 1.0 and a permuted one ~1.4, so 0.9 still
        # separates real bugs from noise.
        bound = 0.15 if name.endswith("['w']") else 0.9
        assert rel < bound, f"{name}: rel L2 {rel:.4f} (bound {bound})"


def test_packed_elan_train_gates():
    """The packed train path must not engage for f32 inputs (reference
    two-pass parity) or widths not divisible by 4."""
    from unittest import mock

    cfg = B.RepNCSPELAN4Config(96, 256, hidden_channels=128,
                               block_channels=64, num_repeats=1)
    params, stats = B.RepNCSPELAN4.init(jax.random.key(0), cfg)

    with mock.patch("yolo_re_tpu.ops.packed_elan_train."
                    "apply_packed_elan_train",
                    side_effect=AssertionError("must not engage")):
        x32 = jax.random.normal(jax.random.key(1), (2, 8, 16, 96))
        B.RepNCSPELAN4.apply(cfg, params, stats, x32, train=True)
        x_odd = jax.random.normal(jax.random.key(1), (2, 8, 10, 96),
                                  jnp.bfloat16)
        B.RepNCSPELAN4.apply(cfg, params, stats, x_odd, train=True)


def test_stem_raw_kernel_matches_conv():
    """stem_conv_packed_raw (pre-BN, no bias/act, traced weights) must
    equal the plain stride-2 conv up to bf16 rounding (interpret mode)."""
    from yolo_re_tpu.ops.pallas.stem_kernel import (
        stem_conv_packed_raw, to_phase_planes, unpack_rows)
    from yolo_re_tpu.ops.stem_train import _pack_w2_jnp

    rng = np.random.default_rng(0)
    # cout 64 (gelan-c) and 80 (gelan-e width 1.25: 160-lane packed output)
    for cout, (bsz, h, wd) in ((64, (2, 16, 24)), (80, (1, 8, 16))):
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cout)) * 0.1,
                        jnp.float32)
        x = jnp.asarray(rng.standard_normal((bsz, h, wd, 3)), jnp.bfloat16)
        ref = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        got = stem_conv_packed_raw(to_phase_planes(x), _pack_w2_jnp(w),
                                   wo=wd // 2, interpret=True)
        got = unpack_rows(got).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(ref.astype(jnp.bfloat16),
                                              np.float32),
                                   atol=0.05, rtol=0.05)


def test_stem_wgrad_kernel_matches_autodiff():
    """stem_wgrad_packed must reproduce the weight gradient of the plain
    conv (same contraction re-associated; f32 check via autodiff of the
    XLA conv against the kernel's dW2 unpacked through _pack_w2_jnp)."""
    from yolo_re_tpu.ops.pallas.stem_kernel import (
        stem_wgrad_packed, to_phase_planes)

    rng = np.random.default_rng(1)
    bsz, h, wd = 2, 16, 24
    x = jnp.asarray(rng.standard_normal((bsz, h, wd, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 64)) * 0.1, jnp.float32)
    g_nhwc = jnp.asarray(rng.standard_normal((bsz, h // 2, wd // 2, 64)),
                         jnp.bfloat16)

    def loss(w):
        from yolo_re_tpu.ops.conv import conv2d
        y = conv2d(x, w, stride=2, padding=1)
        return jnp.sum(y * g_nhwc.astype(jnp.float32))

    g_ref = jax.grad(loss)(w)

    # row-paired packed cotangent: g_packed[b, i, ox, 64r+c] = g[b, 2i+r, ox, c]
    gp = g_nhwc.reshape(bsz, h // 4, 2, wd // 2, 64).transpose(
        0, 1, 3, 2, 4).reshape(bsz, h // 4, wd // 2, 128)
    dw2 = stem_wgrad_packed(to_phase_planes(x), gp, interpret=True)
    dw = (dw2[:32, :64] + dw2[32:, 64:])[:27].reshape(3, 3, 3, 64)
    rel = (np.linalg.norm(np.asarray(dw) - np.asarray(g_ref))
           / np.linalg.norm(np.asarray(g_ref)))
    assert rel < 0.02, f"wgrad rel L2 {rel:.4f}"


def test_stem_train_pair_matches_direct():
    """The packed train-mode stem pair (ops/stem_train.py) must match the
    direct two-Conv train graph: forward activations, BN stat updates,
    and raw-weight gradients (bf16 re-association tolerances calibrated
    in test_packed_elan_train_matches_direct)."""
    from yolo_re_tpu.ops.stem_train import (
        stem1_conv_train, stem2_conv_from_packed_train)

    cfg1 = B.ConvConfig(3, 64, kernel_size=3, stride=2)
    cfg2 = B.ConvConfig(64, 128, kernel_size=3, stride=2)
    p1, s1 = B.Conv.init(jax.random.key(0), cfg1)
    p2, s2 = B.Conv.init(jax.random.key(1), cfg2)
    x = jax.random.normal(jax.random.key(2), (2, 16, 24, 3), jnp.bfloat16)

    def packed(p1, p2):
        y, ns1 = stem1_conv_train(cfg1, p1, s1, x, interpret=True)
        z, ns2 = stem2_conv_from_packed_train(cfg2, p2, s2, y)
        return z, (ns1, ns2)

    def direct(p1, p2):
        y, ns1 = B.Conv.apply(cfg1, p1, s1, x, train=True)
        z, ns2 = B.Conv.apply(cfg2, p2, s2, y, train=True)
        return z, (ns1, ns2)

    z_p, ns_p = packed(p1, p2)
    z_d, ns_d = direct(p1, p2)
    assert z_p.shape == z_d.shape == (2, 4, 6, 128)
    assert z_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(z_p, np.float32),
                               np.asarray(z_d, np.float32),
                               rtol=0.05, atol=0.02)
    flat_p = jax.tree_util.tree_leaves_with_path(ns_p)
    flat_d = jax.tree_util.tree_leaves(ns_d)
    assert len(flat_p) == len(flat_d)
    for (path, a), b in zip(flat_p, flat_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))

    def loss_of(fn):
        def f(ps):
            z, _ = fn(ps[0], ps[1])
            w = jnp.arange(z.size, dtype=jnp.float32).reshape(z.shape) % 7
            return (z.astype(jnp.float32) * w).mean()
        return f

    g_p = jax.grad(loss_of(packed))((p1, p2))
    g_d = jax.grad(loss_of(direct))((p1, p2))
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    flat_d = jax.tree_util.tree_leaves(g_d)
    all_p = np.concatenate([np.asarray(a, np.float32).ravel()
                            for _, a in flat_p])
    all_d = np.concatenate([np.asarray(b, np.float32).ravel()
                            for b in flat_d])
    rel_all = np.linalg.norm(all_p - all_d) / np.linalg.norm(all_d)
    assert rel_all < 0.12, f"global grad rel L2 {rel_all:.4f}"
    for (path, a), b in zip(flat_p, flat_d):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        name = jax.tree_util.keystr(path)
        bound = 0.15 if name.endswith("['w']") else 0.9
        assert rel < bound, f"{name}: rel L2 {rel:.4f} (bound {bound})"


def test_stem_train_gates():
    """The Pallas stem train path must not engage on the CPU backend, for
    f32 inputs, or under the mesh guard; the packed-consumer path must
    not engage for normally-shaped inputs."""
    from unittest import mock

    from yolo_re_tpu.ops import stem_train

    cfg1 = B.ConvConfig(3, 64, kernel_size=3, stride=2)
    p1, s1 = B.Conv.init(jax.random.key(0), cfg1)
    with mock.patch("yolo_re_tpu.ops.stem_train.stem1_conv_train",
                    side_effect=AssertionError("must not engage")):
        # CPU backend: the gate requires tpu
        x = jax.random.normal(jax.random.key(1), (2, 16, 24, 3),
                              jnp.bfloat16)
        B.Conv.apply(cfg1, p1, s1, x, train=True)
        x32 = jax.random.normal(jax.random.key(1), (2, 16, 24, 3))
        B.Conv.apply(cfg1, p1, s1, x32, train=True)
        # non-tile-multiple output width (gelan-e's 80ch stem): gated even
        # on a TPU backend (measured 92.9 -> 88.6 img/s with the kernel)
        cfg80 = B.ConvConfig(3, 80, kernel_size=3, stride=2)
        p80, s80 = B.Conv.init(jax.random.key(4), cfg80)
        with mock.patch("jax.default_backend", return_value="tpu"):
            x = jax.random.normal(jax.random.key(5), (2, 16, 24, 3),
                                  jnp.bfloat16)
            B.Conv.apply(cfg80, p80, s80, x, train=True)
    # no mesh guard anymore: the kernel is shard_mapped under a mesh
    # (parallel/spmd.py); only the env kill switch disables it, and the
    # batch gate reads the PER-DEVICE shard size.
    assert stem_train.stem_train_enabled()
    with mock.patch.dict("os.environ", {"YOLO_TPU_STEM_TRAIN": "0"}):
        assert not stem_train.stem_train_enabled()
    from yolo_re_tpu.parallel import spmd
    from yolo_re_tpu.parallel.mesh import make_mesh

    # per_device_batch under an active mesh: 16 over 8 devices -> 2;
    # non-divisible -> None (gate falls through to the XLA path)
    if len(jax.devices()) >= 8:
        with spmd.use_mesh(make_mesh(8)):
            assert spmd.per_device_batch(16) == 2
            assert spmd.per_device_batch(12) is None
    assert spmd.per_device_batch(16) == 16
    # normally-shaped train conv does not take the packed-consumer path
    cfg2 = B.ConvConfig(64, 128, kernel_size=3, stride=2)
    p2, s2 = B.Conv.init(jax.random.key(2), cfg2)
    with mock.patch("yolo_re_tpu.ops.stem_train."
                    "stem2_conv_from_packed_train",
                    side_effect=AssertionError("must not engage")):
        y = jax.random.normal(jax.random.key(3), (2, 8, 12, 64),
                              jnp.bfloat16)
        B.Conv.apply(cfg2, p2, s2, y, train=True)


def test_csp_chain_kernel_matches_packed_loop():
    """The VMEM-fused bottleneck chain (ops/pallas/csp_chain_kernel.py,
    interpret mode on CPU) must equal the per-conv packed XLA loop it
    replaces (ops/packed_elan.py csp interior), including the image edge
    rows (out-of-image conv outputs re-zeroed) and the residual adds."""
    from yolo_re_tpu.models.fuse import _fuse
    from yolo_re_tpu.ops import packed_elan as pe
    from yolo_re_tpu.ops.pallas.csp_chain_kernel import (
        bottleneck_chain,
        build_bottleneck_chain_weights,
        supports_chain,
    )

    # (num_repeats, m shape): n=1 exercises the single-block DMA arm,
    # n=2 + H=48 exercises first/middle/last row blocks (to=16, nj=3)
    for n, shape in ((1, (1, 16, 8, 128)), (2, (2, 48, 8, 128))):
        cfg = B.RepNCSPConfig(64, 64, num_repeats=n)
        p, s = B.RepNCSP.init(jax.random.key(20 + n), cfg)
        fp, _ = _fuse(B.RepNCSP, cfg, p, s)
        assert supports_chain(shape[1], shape[2], n)

        m = jax.random.normal(jax.random.key(30 + n), shape)

        # reference: the packed XLA per-conv loop over the same weights
        bots = []
        for bot in fp["bottlenecks"]:
            rw = np.asarray(bot["conv1"]["fused"]["w"], np.float32)
            rb = np.asarray(bot["conv1"]["fused"]["b"], np.float32)
            cw = np.asarray(bot["conv2"]["w"], np.float32)
            cb = np.asarray(bot["conv2"]["b"], np.float32)
            bots.append({
                "rep": {"w": jnp.asarray(pe._pack_same(rw, 4)),
                        "b": jnp.asarray(np.tile(rb, 4))},
                "conv": {"w": jnp.asarray(pe._pack_same(cw, 4)),
                         "b": jnp.asarray(np.tile(cb, 4))},
            })
        r_ref = m
        for bot in bots:
            t = pe._pconv(r_ref, bot["rep"])
            t = pe._pconv(t, bot["conv"])
            r_ref = r_ref + t

        weights = build_bottleneck_chain_weights(fp)
        r_pal = bottleneck_chain(m, weights, interpret=True)
        assert r_pal.shape == r_ref.shape
        np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                                   atol=2e-5)


def test_packed_elan_engages_chain(monkeypatch):
    """The Pallas CSP chain is OPT-IN (measured e2e -0.84% at the full
    step despite the isolated win — fusion-boundary erosion, see
    docs/performance.md "What lost"): by default apply_packed_elan must
    NOT engage it; YOLO_TPU_CSP_CHAIN=1 routes the bottlenecks through
    it and must still match the plain fused graph."""
    from unittest import mock

    from yolo_re_tpu.models.fuse import _fuse

    monkeypatch.setenv("YOLO_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("YOLO_TPU_CSP_CHAIN", "1")
    cfg = B.RepNCSPELAN4Config(96, 256, hidden_channels=128,
                               block_channels=64, num_repeats=2)
    params, stats = B.RepNCSPELAN4.init(jax.random.key(40), cfg)
    fp, fs = _fuse(B.RepNCSPELAN4, cfg, params, stats)
    assert "chain" in fp["packed"]["csp1"]

    # W=32 -> wq=8 (chain engages); bf16 only (the f32 path keeps the
    # HIGHEST-precision packed numerics for strict parity)
    x = jax.random.normal(jax.random.key(41), (2, 8, 32, 96),
                          dtype=jnp.bfloat16)
    from yolo_re_tpu.ops.pallas import csp_chain_kernel as ck
    calls = []
    orig = ck.bottleneck_chain

    def spy(m, weights, **kw):
        calls.append(m.shape)
        return orig(m, weights, **kw)

    with mock.patch.object(ck, "bottleneck_chain", side_effect=spy):
        y_chain, _ = B.RepNCSPELAN4.apply(cfg, fp, fs, x, train=False)
    assert calls == [(2, 8, 8, 128), (2, 8, 8, 128)]

    # default (unset) = OFF: no Pallas call; only the bottleneck
    # association differs (bf16 intermediates -> ~1e-3 abs)
    monkeypatch.delenv("YOLO_TPU_CSP_CHAIN")
    with mock.patch.object(ck, "bottleneck_chain",
                           side_effect=AssertionError("must not engage")):
        y_off, _ = B.RepNCSPELAN4.apply(cfg, fp, fs, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_chain, np.float32), np.asarray(y_off, np.float32),
        atol=2e-2)

    # f32 input must NOT engage the kernel (strict-parity path)
    monkeypatch.setenv("YOLO_TPU_CSP_CHAIN", "1")
    xf = jax.random.normal(jax.random.key(42), (2, 8, 32, 96))
    with mock.patch.object(ck, "bottleneck_chain",
                           side_effect=AssertionError("must not engage")):
        B.RepNCSPELAN4.apply(cfg, fp, fs, xf, train=False)
