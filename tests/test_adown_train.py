"""Train-mode Pallas ADown pair (ops/adown_train.py) vs the direct graph.

All kernel runs use interpret mode (CPU). Shapes are chosen to exercise
the single-block (nj == 1), two-block (first/last DMA edges), and
three-block (interior halo) grid paths, plus the width-padding mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_re_tpu.models.blocks import ADown, ADownConfig
from yolo_re_tpu.ops.adown_train import _adown_conv, apply_adown_train
from yolo_re_tpu.ops.conv import avg_pool2d, conv2d, max_pool2d

C = 256
HALF = 128


def _direct_prebn(xp, w1, w2):
    """Pure-XLA pre-BN ADown from the packed view (the reference math)."""
    B, H, Wp, c2 = xp.shape
    x = xp.reshape(B, H, Wp * 2, c2 // 2)
    s = avg_pool2d(x, 2, 1, 0)
    y1 = conv2d(s[..., :HALF], w1, stride=2, padding=1)
    m = max_pool2d(s[..., HALF:], 3, 2, 1)
    y2 = conv2d(m, w2, stride=1, padding=0)
    return jnp.concatenate([y1, y2], axis=-1)


def _rand(key, shape, dtype=jnp.float32, scale=1.0):
    return (jax.random.normal(key, shape) * scale).astype(dtype)


@pytest.mark.parametrize("H,W", [(16, 16), (32, 16), (48, 20),
                                 (24, 16), (20, 16)])
def test_adown_train_forward_matches_direct(H, W):
    k = jax.random.split(jax.random.key(0), 3)
    xp = _rand(k[0], (2, H, W // 2, 2 * C))
    w1 = _rand(k[1], (3, 3, HALF, HALF), scale=0.1)
    w2 = _rand(k[2], (1, 1, HALF, HALF), scale=0.1)
    got = _adown_conv(xp, w1, w2, True)
    ref = _direct_prebn(xp, w1, w2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("H,W", [(16, 16), (32, 16), (48, 20),
                                 (24, 16), (20, 16)])  # to = 8 / 4 / 2
def test_adown_train_grads_match_direct(H, W):
    k = jax.random.split(jax.random.key(1), 4)
    xp = _rand(k[0], (2, H, W // 2, 2 * C))
    w1 = _rand(k[1], (3, 3, HALF, HALF), scale=0.1)
    w2 = _rand(k[2], (1, 1, HALF, HALF), scale=0.1)
    r = _rand(k[3], (2, H // 2, W // 2, C))  # random cotangent direction

    def obj_kernel(xp, w1, w2):
        return (_adown_conv(xp, w1, w2, True) * r).sum()

    def obj_direct(xp, w1, w2):
        return (_direct_prebn(xp, w1, w2) * r).sum()

    gk = jax.grad(obj_kernel, argnums=(0, 1, 2))(xp, w1, w2)
    gd = jax.grad(obj_direct, argnums=(0, 1, 2))(xp, w1, w2)
    for name, a, b in zip(("dx", "dw1", "dw2"), gk, gd):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.abs(b).max() or 1.0
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-5,
                                   err_msg=name)


def test_adown_train_maxpool_tie_matches_select_and_scatter():
    """Exact ties inside a window: the kernel's first-max priority masks
    must route the grad exactly like XLA's select_and_scatter (first max
    in row-major window order)."""
    H = W = 16
    xp = jnp.zeros((1, H, W // 2, 2 * C), jnp.float32)
    x = xp.reshape(1, H, W, C)
    # After the 2x2 avgpool, S2[a, p] = sum of a 2x2 block. Make two cells
    # of one maxpool window tie exactly: set single pixels so windows sum
    # to the same value at (2, 2) and (3, 3) in avg coords (both inside
    # the window of output (1, 1) before scaling), channel 0 of branch 2.
    ch = HALF  # first channel of the maxpool branch
    x = x.at[0, 2, 2, ch].set(8.0)   # avg cells (1..2, 1..2) see this
    x = x.at[0, 4, 4, ch].set(8.0)
    xp = x.reshape(1, H, W // 2, 2 * C)
    w1 = jnp.zeros((3, 3, HALF, HALF), jnp.float32)
    w2 = jnp.zeros((1, 1, HALF, HALF), jnp.float32).at[0, 0, 0, 0].set(1.0)

    def obj(fn, xp):
        return fn(xp)[0, 1, 1, HALF].sum()

    gk = jax.grad(lambda xp: obj(lambda t: _adown_conv(t, w1, w2, True),
                                 xp))(xp)
    gd = jax.grad(lambda xp: obj(lambda t: _direct_prebn(t, w1, w2),
                                 xp))(xp)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(gd))
    assert float(jnp.abs(gd).sum()) > 0  # the tie actually carried grad


@pytest.mark.parametrize("H,W", [(32, 16)])
def test_apply_adown_train_block_parity_bf16(H, W):
    """Full block (kernel pair + concatenated-BN epilogue) vs the direct
    ADown.apply train path in bf16: activations and new running stats."""
    cfg = ADownConfig(C, C)
    params, stats = ADown.init(jax.random.key(0), cfg)
    x = _rand(jax.random.key(5), (2, H, W, C), jnp.bfloat16)

    ref, ns_ref = ADown.apply(cfg, params, stats, x, train=True)
    got, ns_got = apply_adown_train(cfg, params, stats, x, interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    # bf16 re-association through conv + BN normalize: bulk agrees at
    # ~1e-2, a handful of elements (2/65536 measured) reach ~6e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=1e-1)
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    assert (diff > 5e-2).mean() < 1e-3
    for branch in ("conv_stride", "conv_pool"):
        for key in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(ns_got[branch][key]),
                np.asarray(ns_ref[branch][key]), atol=1e-3,
                err_msg=f"{branch}.{key}")


def test_adown_train_wide_channels_512():
    """Channel-generic kernels: a 512-channel ADown (down2 geometry) —
    forward and grads vs the direct graph."""
    Cw, half = 512, 256
    k = jax.random.split(jax.random.key(7), 4)
    xp = _rand(k[0], (1, 16, 8, 2 * Cw))
    w1 = _rand(k[1], (3, 3, half, half), scale=0.05)
    w2 = _rand(k[2], (1, 1, half, half), scale=0.05)
    r = _rand(k[3], (1, 8, 8, Cw))

    def direct(xp, w1, w2):
        x = xp.reshape(1, 16, 16, Cw)
        s = avg_pool2d(x, 2, 1, 0)
        y1 = conv2d(s[..., :half], w1, stride=2, padding=1)
        m = max_pool2d(s[..., half:], 3, 2, 1)
        y2 = conv2d(m, w2, stride=1, padding=0)
        return jnp.concatenate([y1, y2], axis=-1)

    got = _adown_conv(xp, w1, w2, True)
    ref = direct(xp, w1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    gk = jax.grad(lambda *a: (_adown_conv(*a, True) * r).sum(),
                  argnums=(0, 1, 2))(xp, w1, w2)
    gd = jax.grad(lambda *a: (direct(*a) * r).sum(),
                  argnums=(0, 1, 2))(xp, w1, w2)
    for name, a, b in zip(("dx", "dw1", "dw2"), gk, gd):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.abs(b).max() or 1.0
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-5,
                                   err_msg=name)


def test_adown_train_under_remat():
    """TrainConfig.remat wraps block applies in jax.checkpoint; the
    custom-VJP kernel pair must trace and differentiate under it (the
    forward recomputes in the backward) with unchanged grads."""
    cfg = ADownConfig(C, C)
    params, stats = ADown.init(jax.random.key(2), cfg)
    x = _rand(jax.random.key(3), (1, 16, 16, C), jnp.bfloat16)

    def obj(fn):
        def run(p, x):
            y, _ = fn(p, stats, x)
            return (y.astype(jnp.float32) ** 2).sum()
        return run

    plain = lambda p, s, x: apply_adown_train(cfg, p, s, x, interpret=True)
    remat = jax.checkpoint(plain)
    gp = jax.grad(obj(plain))(params, x)
    gr = jax.grad(obj(remat))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adown_train_is_opt_in(monkeypatch):
    """The kernel pair measured -6.4% e2e (docs/performance.md "What
    lost") and must stay OFF unless YOLO_TPU_ADOWN_TRAIN=1 opts in."""
    from yolo_re_tpu.ops.adown_train import adown_train_enabled

    monkeypatch.delenv("YOLO_TPU_ADOWN_TRAIN", raising=False)
    assert not adown_train_enabled()
    monkeypatch.setenv("YOLO_TPU_ADOWN_TRAIN", "1")
    assert adown_train_enabled()
    monkeypatch.setenv("YOLO_TPU_ADOWN_TRAIN", "0")
    assert not adown_train_enabled()
