"""On-device batched image preprocessing (TPU-resident, jit-friendly).

The reference does all image work on the host with OpenCV
(src/yolo/data/augment.py:12-94, dataset.py:222-236). On TPU the host is
often a single core feeding many chips, so the batched, fixed-shape parts
of the pipeline move onto the device:

- bilinear resize as two MXU matmuls against static interpolation-weight
  matrices (cv2 INTER_LINEAR half-pixel semantics, border-replicate);
- letterbox (aspect-preserving resize + 114-pad, same rounding as the host
  implementation in data/augment.py:41-82);
- per-sample HSV jitter (multiplicative gains like the reference's LUTs,
  augment.py:19-38) and horizontal/vertical flips, driven by the jax PRNG
  so they live inside the donated jitted train step.

Everything here is shape-static and traceable; geometry constants are
computed in Python from static shapes at trace time.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_PAD = 114.0 / 255.0


# ---------------------------------------------------------------------------
# bilinear resize as matmuls
# ---------------------------------------------------------------------------

@lru_cache(maxsize=128)
def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) interpolation weights, cv2 INTER_LINEAR semantics:
    half-pixel centers `src = (dst + 0.5) * in/out - 0.5`, border replicate."""
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
    x0 = np.floor(src).astype(np.int64)
    frac = (src - x0).astype(np.float32)
    lo = np.clip(x0, 0, in_size - 1)
    hi = np.clip(x0 + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - frac)
    np.add.at(m, (rows, hi), frac)
    return m


def resize_bilinear(img: jax.Array, out_h: int, out_w: int,
                    precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Batched bilinear resize (B, H, W, C) -> (B, out_h, out_w, C).

    Separable: one matmul over rows, one over columns — both land on the
    MXU. Matches `cv2.resize(..., INTER_LINEAR)` to float rounding.
    """
    _, h, w, _ = img.shape
    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = img.astype(dtype)
    if h != out_h:
        rh = jnp.asarray(_resize_matrix(h, out_h), dtype)
        x = jnp.einsum("oh,bhwc->bowc", rh, x, precision=precision)
    if w != out_w:
        rw = jnp.asarray(_resize_matrix(w, out_w), dtype)
        x = jnp.einsum("pw,bhwc->bhpc", rw, x, precision=precision)
    return x


def batched_letterbox(images: jax.Array, new_shape: int | tuple[int, int],
                      dtype=jnp.float32) -> jax.Array:
    """Letterbox a uniform-size batch on device.

    images: (B, H, W, 3) uint8 (or float already in [0, 1]).
    Returns (B, S_h, S_w, 3) in [0, 1], aspect-preserving resize with
    114-grey padding — same gain/rounding as the host `letterbox`
    (data/augment.py:41-82, reference src/yolo/data/augment.py:40-94) so
    box rescaling downstream is identical.
    """
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    _, h, w, _ = images.shape
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0

    r = min(new_shape[0] / h, new_shape[1] / w)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    dw, dh = (new_shape[1] - new_w) / 2, (new_shape[0] - new_h) / 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))

    x = resize_bilinear(x, new_h, new_w)
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                constant_values=_PAD)
    return jnp.clip(x, 0.0, 1.0).astype(dtype)


# ---------------------------------------------------------------------------
# color / flip augmentation
# ---------------------------------------------------------------------------

def _rgb_to_hsv(img: jax.Array) -> jax.Array:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    return jnp.stack([h, s, maxc], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = h * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    i = i.astype(jnp.int32) % 6
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter(img: jax.Array, key: jax.Array, h_gain: float = 0.015,
               s_gain: float = 0.7, v_gain: float = 0.4) -> jax.Array:
    """Per-sample multiplicative HSV jitter on float RGB in [0, 1].

    Mirrors the reference LUT semantics (src/yolo/data/augment.py:12-37):
    hue scaled then wrapped, saturation/value scaled then clipped — with an
    independent gain triple per batch element.
    """
    b = img.shape[0]
    gains = jnp.asarray([h_gain, s_gain, v_gain], jnp.float32)
    r = jax.random.uniform(key, (b, 3), minval=-1.0, maxval=1.0) * gains + 1.0
    r = r[:, None, None, :]
    hsv = _rgb_to_hsv(img.astype(jnp.float32))
    h = (hsv[..., 0] * r[..., 0]) % 1.0
    s = jnp.clip(hsv[..., 1] * r[..., 1], 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * r[..., 2], 0.0, 1.0)
    out = _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))
    return jnp.clip(out, 0.0, 1.0).astype(img.dtype)


def random_flip(img: jax.Array, targets: jax.Array, key: jax.Array,
                flip_lr: float = 0.5, flip_ud: float = 0.0
                ) -> tuple[jax.Array, jax.Array]:
    """Per-sample horizontal/vertical flips with label updates.

    img: (B, H, W, 3); targets: (B, M, 5) [cls, x, y, w, h] normalized,
    zero-padded rows (w == h == 0) are left untouched. Reference semantics:
    src/yolo/data/transforms.py:271-297.
    """
    b = img.shape[0]
    k_lr, k_ud = jax.random.split(key)
    do_lr = jax.random.uniform(k_lr, (b,)) < flip_lr
    do_ud = jax.random.uniform(k_ud, (b,)) < flip_ud

    img = jnp.where(do_lr[:, None, None, None], img[:, :, ::-1], img)
    img = jnp.where(do_ud[:, None, None, None], img[:, ::-1], img)

    valid = (targets[..., 3] > 0) & (targets[..., 4] > 0)
    x = jnp.where(valid & do_lr[:, None], 1.0 - targets[..., 1], targets[..., 1])
    y = jnp.where(valid & do_ud[:, None], 1.0 - targets[..., 2], targets[..., 2])
    targets = targets.at[..., 1].set(x).at[..., 2].set(y)
    return img, targets


def augment_batch(images: jax.Array, targets: jax.Array, key: jax.Array,
                  hsv_h: float = 0.015, hsv_s: float = 0.7,
                  hsv_v: float = 0.4, flip_lr: float = 0.5,
                  flip_ud: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """Device-side tail of the train-time augmentation pipeline.

    Applies HSV jitter then flips; mosaic/mixup/perspective stay on the
    host (they need variable geometry). Fully traceable — lives inside the
    Trainer's donated jitted train step when `device_augment=True`.
    """
    k_hsv, k_flip = jax.random.split(key)
    if hsv_h or hsv_s or hsv_v:
        images = hsv_jitter(images, k_hsv, hsv_h, hsv_s, hsv_v)
    if flip_lr or flip_ud:
        images, targets = random_flip(images, targets, k_flip,
                                      flip_lr, flip_ud)
    return images, targets
