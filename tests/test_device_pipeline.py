"""On-device preprocessing tests (matmul resize, letterbox, HSV, flips)."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.data.device_pipeline import (
    augment_batch,
    batched_letterbox,
    hsv_jitter,
    random_flip,
    resize_bilinear,
)


def test_resize_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    img = rng.random((1, 40, 64, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), 80, 96))[0]
    ref = cv2.resize(img[0], (96, 80), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_resize_downscale_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), 32, 32))[0]
    ref = cv2.resize(img[0], (32, 32), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_batched_letterbox_matches_host():
    import cv2

    from yolo_re_tpu.data.augment import letterbox as host_letterbox

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (50, 100, 3), dtype=np.uint8)
    dev = np.asarray(batched_letterbox(jnp.asarray(img[None]), 64))[0]
    host, _, _ = host_letterbox(img, 64)
    diff = np.abs(dev * 255.0 - host.astype(np.float32))
    # identical geometry; interpolation rounding only
    assert dev.shape == (64, 64, 3)
    assert diff.mean() < 1.0
    assert np.median(diff) < 1.0


def test_hsv_jitter_identity_at_zero_gain():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    out = hsv_jitter(img, jax.random.key(0), 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_hsv_jitter_valid_range():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    out = np.asarray(hsv_jitter(img, jax.random.key(1)))
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


def test_random_flip_labels():
    img = jnp.zeros((1, 4, 4, 3)).at[:, :, 0, :].set(1.0)  # left col white
    targets = jnp.asarray([[[0, 0.25, 0.5, 0.2, 0.2]]], jnp.float32)
    out_img, out_t = random_flip(img, targets, jax.random.key(0),
                                 flip_lr=1.0, flip_ud=0.0)
    assert float(out_img[0, 0, -1, 0]) == 1.0  # white moved to right col
    np.testing.assert_allclose(float(out_t[0, 0, 1]), 0.75)
    # padding rows (zero wh) untouched
    pad = jnp.zeros((1, 1, 5))
    _, out_pad = random_flip(img, pad, jax.random.key(0), flip_lr=1.0)
    np.testing.assert_allclose(np.asarray(out_pad), 0.0)


def test_augment_batch_jits():
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    targets = jnp.zeros((2, 4, 5))
    f = jax.jit(augment_batch)
    out_img, out_t = f(img, targets, jax.random.key(0))
    assert out_img.shape == img.shape
    assert out_t.shape == targets.shape


def test_mosaic_affine_geometry():
    """Deterministic geometry: identity zoom, centered shift -> the output
    is the canvas center crop, and a box lands where the affine says."""
    from yolo_re_tpu.data.device_pipeline import mosaic_affine

    s = 32
    img = jnp.zeros((1, s, s, 3), jnp.float32)
    # distinctive pixel at tile-0 position (24, 24) -> canvas (24, 24)
    img = img.at[0, 24, 24].set(1.0)
    targets = jnp.asarray([[[2, 0.75, 0.75, 0.125, 0.125]]], jnp.float32)

    partner = jnp.zeros((1, 3), jnp.int32)
    zoom = jnp.ones((1,))
    shift = jnp.full((1, 2), 0.5 * s)  # centered: src = dst + s/2

    out, t = mosaic_affine(img, targets, jax.random.key(0),
                           partner_idx=partner, zoom=zoom, shift=shift)
    assert out.shape == (1, s, s, 3) and t.shape == (1, 4, 5)
    # canvas (24, 24) -> out (24 - 16, 24 - 16) = (8, 8)
    assert float(out[0, 8, 8, 0]) == 1.0
    # box center (0.75*s, 0.75*s) on canvas -> dst = (c - s) + s/2
    # tile 0: c = 24 -> dst 8 -> normalized 0.25; tile 3: c = 24+s -> dst 40 (off-canvas, clipped/filtered or partial)
    rows = np.asarray(t[0])
    got = rows[(rows[:, 3] > 0)]
    assert np.any(np.isclose(got[:, 1], 0.25, atol=1e-5) &
                  np.isclose(got[:, 2], 0.25, atol=1e-5)), got


def test_mosaic_affine_fill_and_zoom_out():
    """Zoom < 1 shows grey fill outside the canvas and shrinks boxes."""
    from yolo_re_tpu.data.device_pipeline import mosaic_affine

    s = 32
    img = jnp.ones((1, s, s, 3), jnp.float32)
    targets = jnp.asarray([[[0, 0.5, 0.5, 0.5, 0.5]]], jnp.float32)
    out, t = mosaic_affine(
        img, targets, jax.random.key(0), partner_idx=jnp.zeros((1, 3), jnp.int32),
        zoom=jnp.asarray([0.25]), shift=jnp.full((1, 2), 0.5 * s))
    # canvas spans src [-48, 80); half the output samples outside -> fill
    pad = 114.0 / 255.0
    assert abs(float(out[0, 0, 0, 0]) - pad) < 1e-5   # top-left: outside
    assert float(out[0, s // 2, s // 2, 0]) == 1.0    # center: inside
    rows = np.asarray(t[0])
    got = rows[rows[:, 3] > 0]
    np.testing.assert_allclose(got[:, 3], 0.5 * 0.25, atol=1e-5)


def test_augment_batch_full_jits():
    from yolo_re_tpu.data.device_pipeline import augment_batch_full

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))
    targets = jnp.zeros((4, 6, 5), jnp.float32)
    targets = targets.at[:, 0].set(jnp.asarray([1, 0.5, 0.5, 0.4, 0.4]))
    f = jax.jit(augment_batch_full)
    out, t = f(img, targets, jax.random.key(1))
    assert out.shape == img.shape
    # capacity is compacted back to the input's static max_boxes
    assert t.shape == targets.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # at least some mosaic boxes survive
    assert int((t[..., 3] > 0).sum()) > 0
    # valid rows are compacted to the front
    valid = np.asarray(t[..., 3] > 0)
    for row in valid:
        nz = np.flatnonzero(row)
        assert nz.size == 0 or nz.max() == nz.size - 1
