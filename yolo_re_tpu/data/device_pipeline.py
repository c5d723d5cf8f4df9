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


# ---------------------------------------------------------------------------
# on-device mosaic + scale/translate (the reference's heavy host stages)
# ---------------------------------------------------------------------------

def _affine_weights(srcf: jax.Array, src_size: int) -> jax.Array:
    """(B, out) fractional source coords -> (B, out, src) bilinear weights.

    Hat function: each output row mixes the two neighboring source rows;
    rows sampling outside [0, src-1] get weight-sum < 1 (the remainder is
    fill, applied by the caller). Built from traced per-sample scalars, so
    random zoom/translate live inside jit — resampling stays two MXU
    matmuls per batch (same trick as `resize_bilinear`, but with the
    weight matrix computed on device from the traced geometry).
    """
    j = jnp.arange(src_size, dtype=jnp.float32)
    return jnp.clip(1.0 - jnp.abs(srcf[..., None] - j), 0.0, 1.0)


def _compose_warp_matrices(key: jax.Array, zoom: jax.Array,
                           shift: jax.Array, canvas_size: int, *,
                           degrees: float, shear: float,
                           perspective: float) -> jax.Array:
    """Per-sample forward 3x3 warp matrices, host `random_perspective`
    composition M = T @ S @ R @ P @ C (data/augment.py:103-142, reference
    src/yolo/data/augment.py:97-184): center at canvas/2, perspective,
    rotation+scale (cv2.getRotationMatrix2D convention), shear, translate.

    zoom (B,), shift (B, 2) [y, x] in output pixels. Returns (B, 3, 3) f32
    mapping canvas pixel coords -> output pixel coords.
    """
    b = zoom.shape[0]
    ka, ksx, ksy, kpx, kpy = jax.random.split(key, 5)
    ang = jax.random.uniform(ka, (b,), minval=-degrees, maxval=degrees)
    shx = jnp.tan(jnp.deg2rad(
        jax.random.uniform(ksx, (b,), minval=-shear, maxval=shear)))
    shy = jnp.tan(jnp.deg2rad(
        jax.random.uniform(ksy, (b,), minval=-shear, maxval=shear)))
    px = jax.random.uniform(kpx, (b,), minval=-perspective,
                            maxval=perspective)
    py = jax.random.uniform(kpy, (b,), minval=-perspective,
                            maxval=perspective)

    zero = jnp.zeros((b,), jnp.float32)
    one = jnp.ones((b,), jnp.float32)

    def mat(rows):
        return jnp.stack([jnp.stack(r, -1) for r in rows], -2)

    half = canvas_size / 2.0
    C = mat([[one, zero, -half * one], [zero, one, -half * one],
             [zero, zero, one]])
    P = mat([[one, zero, zero], [zero, one, zero], [px, py, one]])
    # cv2.getRotationMatrix2D(angle=a, center=(0,0), scale=z):
    # [[z cos a, z sin a, 0], [-z sin a, z cos a, 0]]
    rad = jnp.deg2rad(ang)
    ca, sa = jnp.cos(rad) * zoom, jnp.sin(rad) * zoom
    R = mat([[ca, sa, zero], [-sa, ca, zero], [zero, zero, one]])
    S = mat([[one, shx, zero], [shy, one, zero], [zero, zero, one]])
    T = mat([[one, zero, shift[:, 1]], [zero, one, shift[:, 0]],
             [zero, zero, one]])
    mm = lambda a_, b_: jnp.einsum("bij,bjk->bik", a_, b_)
    return mm(T, mm(S, mm(R, mm(P, C))))


def warp_perspective(canvas: jax.Array, M: jax.Array, out_size: int, *,
                     pad: float = _PAD,
                     use_perspective: bool = False) -> jax.Array:
    """Batched inverse-mapped bilinear warp with constant border fill.

    canvas (B, Hc, Wc, C); M (B, 3, 3) FORWARD matrices (canvas px ->
    output px, host cv2.warpAffine/warpPerspective semantics with
    borderValue=114). Non-separable (rotation/shear/perspective), so this
    samples via 4 batched gathers instead of the two-matmul fast path —
    used only when those hyps are nonzero.
    """
    b, hc, wc, c = canvas.shape
    minv = jnp.linalg.inv(M.astype(jnp.float32))
    ox = jnp.arange(out_size, dtype=jnp.float32)
    gx = jnp.broadcast_to(ox[None, :], (out_size, out_size))
    gy = jnp.broadcast_to(ox[:, None], (out_size, out_size))
    def comp(row):
        return (minv[:, row, 0, None, None] * gx
                + minv[:, row, 1, None, None] * gy
                + minv[:, row, 2, None, None])
    sx, sy = comp(0), comp(1)
    if use_perspective:
        w = comp(2)
        w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
        sx, sy = sx / w, sy / w

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0).astype(jnp.float32)
    fy = (sy - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = canvas.astype(jnp.float32).reshape(b, hc * wc, c)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < hc) & (xi >= 0) & (xi < wc)
        idx = jnp.clip(yi, 0, hc - 1) * wc + jnp.clip(xi, 0, wc - 1)
        v = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1)
        v = v.reshape(b, out_size, out_size, c)
        return jnp.where(inb[..., None], v, pad)

    out = (tap(y0i, x0i) * ((1 - fy) * (1 - fx))[..., None]
           + tap(y0i, x0i + 1) * ((1 - fy) * fx)[..., None]
           + tap(y0i + 1, x0i) * (fy * (1 - fx))[..., None]
           + tap(y0i + 1, x0i + 1) * (fy * fx)[..., None])
    return out.astype(canvas.dtype)


def warp_boxes(M: jax.Array, cx: jax.Array, cy: jax.Array, bw: jax.Array,
               bh: jax.Array, out_size: int, *, use_perspective: bool
               ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Axis-aligned bbox of each box's 4 warped corners, clipped to the
    output canvas (host label path, data/augment.py:152-165). M (B, 3, 3);
    cx/cy/bw/bh (B, ...) canvas-pixel boxes. Returns x1, y1, x2, y2."""
    hw, hh = bw / 2, bh / 2
    xs = jnp.stack([cx - hw, cx + hw, cx - hw, cx + hw], axis=-1)
    ys = jnp.stack([cy - hh, cy - hh, cy + hh, cy + hh], axis=-1)
    extra = (1,) * (xs.ndim - 2)
    m = M.reshape(M.shape[0], *extra, 3, 3)
    xp = m[..., 0:1, 0] * xs + m[..., 0:1, 1] * ys + m[..., 0:1, 2]
    yp = m[..., 1:2, 0] * xs + m[..., 1:2, 1] * ys + m[..., 1:2, 2]
    if use_perspective:
        w = m[..., 2:3, 0] * xs + m[..., 2:3, 1] * ys + m[..., 2:3, 2]
        w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
        xp, yp = xp / w, yp / w
    x1 = jnp.clip(xp.min(-1), 0.0, out_size)
    y1 = jnp.clip(yp.min(-1), 0.0, out_size)
    x2 = jnp.clip(xp.max(-1), 0.0, out_size)
    y2 = jnp.clip(yp.max(-1), 0.0, out_size)
    return x1, y1, x2, y2


def mosaic_affine(images: jax.Array, targets: jax.Array, key: jax.Array,
                  partner_idx: jax.Array | None = None,
                  zoom: jax.Array | None = None,
                  shift: jax.Array | None = None, *,
                  scale: float = 0.9, translate: float = 0.1,
                  degrees: float = 0.0, shear: float = 0.0,
                  perspective: float = 0.0,
                  mosaic_p: float = 1.0, max_out: int | None = None,
                  pad: float = _PAD) -> tuple[jax.Array, jax.Array]:
    """Batch-internal 4-image mosaic + random zoom/translate, on device.

    The reference runs Mosaic + random_perspective on the host
    (src/yolo/data/transforms.py:64-162, augment.py:97-184) — the two
    stages that halve this single-core host's throughput and cost 4 image
    decodes per sample. With the default hyps (degrees = shear =
    perspective = 0, reference config.py:24-73) the warp is axis-aligned,
    so the whole composition is exact separable resampling:

        canvas = 2x2 grid of [self, 3 random batch partners]   (2S x 2S)
        out(y, x) = canvas((y - u_y)/z + S, (x - u_x)/z + S)
        z ~ U(1-scale, 1+scale),  u ~ U(0.5-translate, 0.5+translate)*S

    computed as two batched matmuls against per-sample interpolation
    matrices. Semantics notes vs the host path: partner tiles are the
    batch's already-letterboxed squares (their 114 padding matches the
    mosaic fill), the random mosaic center is absorbed into the
    translate jitter, and partners are drawn from the current batch.

    images (B, S, S, C) float [0,1]; targets (B, M, 5) [cls, xywh]
    normalized. Returns (images (B, S, S, C), targets (B, max_out, 5)),
    max_out defaulting to 4M. partner_idx/zoom/shift override the random
    draws (for tests).
    """
    b, s, _, c = images.shape
    m = targets.shape[1]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    if partner_idx is None:
        partner_idx = jax.random.randint(k1, (b, 3), 0, b)
    if zoom is None:
        zoom = jax.random.uniform(k2, (b,), minval=max(1.0 - scale, 0.1),
                                  maxval=1.0 + scale)
    if shift is None:
        shift = jax.random.uniform(
            k3, (b, 2), minval=0.5 - translate, maxval=0.5 + translate) * s

    tiles = jnp.stack([images, images[partner_idx[:, 0]],
                       images[partner_idx[:, 1]], images[partner_idx[:, 2]]],
                      axis=1)                                  # (B, 4, S, S, C)
    canvas = tiles.reshape(b, 2, 2, s, s, c).transpose(0, 1, 3, 2, 4, 5)
    canvas = canvas.reshape(b, 2 * s, 2 * s, c)

    # degrees/shear/perspective are static config floats: zero (every
    # shipped preset) keeps the separable two-matmul fast path; nonzero
    # takes the general gather-based warp (host random_perspective
    # semantics, data/augment.py:103-175).
    general = bool(degrees or shear or perspective)
    if general:
        M = _compose_warp_matrices(k5, zoom, shift, 2 * s, degrees=degrees,
                                   shear=shear, perspective=perspective)
        out = warp_perspective(canvas, M, s, pad=pad,
                               use_perspective=perspective > 0)
    else:
        dst = jnp.arange(s, dtype=jnp.float32)
        z = zoom[:, None]
        src_y = (dst[None] - shift[:, :1]) / z + s
        src_x = (dst[None] - shift[:, 1:]) / z + s
        wy = _affine_weights(src_y, 2 * s)                     # (B, S, 2S)
        wx = _affine_weights(src_x, 2 * s)

        # keep resampling in the image dtype (bf16 under the trainer): a
        # mixed bf16 x f32 einsum would promote the canvas back to f32.
        wy = wy.astype(images.dtype)
        wx = wx.astype(images.dtype)
        out = jnp.einsum("boh,bhwc->bowc", wy, canvas)
        out = out + ((1.0 - wy.sum(-1))[..., None, None]
                     * pad).astype(out.dtype)
        out = jnp.einsum("bpw,bhwc->bhpc", wx, out)
        out = out + ((1.0 - wx.sum(-1))[:, None, :, None]
                     * pad).astype(out.dtype)
        out = out.astype(images.dtype)

    # -- labels: tile offset -> canvas px -> affine -> normalized ------------
    tile_t = jnp.stack([targets, targets[partner_idx[:, 0]],
                        targets[partner_idx[:, 1]], targets[partner_idx[:, 2]]],
                       axis=1)                                 # (B, 4, M, 5)
    off = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]]) * s
    cx = tile_t[..., 1] * s + off[None, :, None, 1]
    cy = tile_t[..., 2] * s + off[None, :, None, 0]
    bw = tile_t[..., 3] * s
    bh = tile_t[..., 4] * s
    valid = (tile_t[..., 3] > 0) & (tile_t[..., 4] > 0)

    zq = zoom[:, None, None]
    if general:
        x1, y1, x2, y2 = warp_boxes(M, cx, cy, bw, bh, s,
                                    use_perspective=perspective > 0)
        bw, bh = bw * zq, bh * zq      # box1 * s for the area-ratio filter
    else:
        cx = zq * (cx - s) + shift[:, None, None, 1]
        cy = zq * (cy - s) + shift[:, None, None, 0]
        bw, bh = bw * zq, bh * zq
        x1 = jnp.clip(cx - bw / 2, 0.0, s)
        y1 = jnp.clip(cy - bh / 2, 0.0, s)
        x2 = jnp.clip(cx + bw / 2, 0.0, s)
        y2 = jnp.clip(cy + bh / 2, 0.0, s)
    w2, h2 = x2 - x1, y2 - y1
    # candidate filter == host _box_candidates (data/augment.py:158-166);
    # the survival threshold relaxes under perspective like the host's.
    area_thr = 0.01 if perspective else 0.1
    ar = jnp.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    keep = valid & (w2 > 2) & (h2 > 2) & (ar < 100) \
        & (w2 * h2 / (bw * bh + 1e-16) > area_thr)

    flat = jnp.stack([tile_t[..., 0],
                      (x1 + x2) / 2 / s, (y1 + y2) / 2 / s,
                      w2 / s, h2 / s], axis=-1).reshape(b, 4 * m, 5)
    flat = flat * keep.reshape(b, 4 * m)[..., None]

    # compact valid rows first (stable), cap capacity
    max_out = max_out or 4 * m
    order = jnp.argsort(~keep.reshape(b, 4 * m), axis=1, stable=True)
    flat = jnp.take_along_axis(flat, order[..., None], axis=1)[:, :max_out]

    if mosaic_p < 1.0:
        do = jax.random.uniform(k4, (b,)) < mosaic_p
        plain_t = jnp.zeros((b, max_out, 5), targets.dtype)
        plain_t = plain_t.at[:, :min(m, max_out)].set(targets[:, :max_out])
        out = jnp.where(do[:, None, None, None], out, images)
        flat = jnp.where(do[:, None, None], flat, plain_t)
    return out, flat


def cap_targets(targets: jax.Array, cap: int) -> jax.Array:
    """Compact valid GT rows first (stable) and cap capacity at `cap`.

    Keeps the loss's static (B, M, A) assigner tensors bounded — mosaic
    (x4) and mixup (x2) would otherwise multiply the padded GT capacity
    and with it the assigner's memory footprint.
    """
    valid = (targets[..., 3] > 0) & (targets[..., 4] > 0)
    order = jnp.argsort(~valid, axis=1, stable=True)
    return jnp.take_along_axis(targets, order[..., None], axis=1)[:, :cap]


def mixup(images: jax.Array, targets: jax.Array, key: jax.Array,
          p: float = 0.15) -> tuple[jax.Array, jax.Array]:
    """Device MixUp: beta(32,32) blend with the batch rolled by one
    (reference: src/yolo/data/transforms.py:165-194). Target capacity
    doubles; padding rows stay zero."""
    b = images.shape[0]
    k1, k2 = jax.random.split(key)
    r = jax.random.beta(k1, 32.0, 32.0, (b,)).astype(jnp.float32)
    do = jax.random.uniform(k2, (b,)) < p
    partner = jnp.roll(images, 1, axis=0)
    blend = (images.astype(jnp.float32) * r[:, None, None, None]
             + partner.astype(jnp.float32) * (1 - r)[:, None, None, None])
    images = jnp.where(do[:, None, None, None], blend.astype(images.dtype),
                       images)
    partner_t = jnp.roll(targets, 1, axis=0)
    partner_t = partner_t * do[:, None, None]  # only when mixed
    return images, jnp.concatenate([targets, partner_t], axis=1)


def augment_batch_full(images: jax.Array, targets: jax.Array,
                       key: jax.Array, *, scale: float = 0.9,
                       translate: float = 0.1, degrees: float = 0.0,
                       shear: float = 0.0, perspective: float = 0.0,
                       mosaic_p: float = 1.0,
                       mixup_p: float = 0.15, hsv_h: float = 0.015,
                       hsv_s: float = 0.7, hsv_v: float = 0.4,
                       flip_lr: float = 0.5, flip_ud: float = 0.0,
                       max_out: int | None = None
                       ) -> tuple[jax.Array, jax.Array]:
    """The whole train-time augmentation pipeline on device: mosaic +
    full random_perspective warp (zoom/translate separable fast path;
    rotation/shear/perspective general path) + mixup + HSV + flips. The
    host then only decodes and letterboxes (its 'minimal' path) — on this
    single-core host that is the difference between a loader-bound and a
    device-bound trainer."""
    k1, k2, k3 = jax.random.split(key, 3)
    cap = max_out or targets.shape[1]
    if mosaic_p > 0:
        images, targets = mosaic_affine(
            images, targets, k1, scale=scale, translate=translate,
            degrees=degrees, shear=shear, perspective=perspective,
            mosaic_p=mosaic_p)
    if mixup_p > 0:
        images, targets = mixup(images, targets, k2, p=mixup_p)
    # one final compaction back to the pipeline's static GT capacity —
    # mosaic/mixup grew it x8; the loss assigner's memory is O(B*M*A).
    targets = cap_targets(targets, cap)
    return augment_batch(images, targets, k3, hsv_h=hsv_h, hsv_s=hsv_s,
                         hsv_v=hsv_v, flip_lr=flip_lr, flip_ud=flip_ud)


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
