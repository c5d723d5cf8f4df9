"""Pallas TPU kernel: greedy NMS with the candidate set resident in VMEM.

The XLA fallback (ops/nms.py) runs the greedy loop as a `lax.scan`, whose
per-step argmax/IoU vectors round-trip through HBM between iterations. Here
the whole loop runs inside ONE Pallas kernel: boxes live as a (4, K) tile
(coordinates on sublanes, candidates on lanes — K padded to a multiple of
128) and scores as (1, K), both in VMEM (~40 KB at K=2048), so each of the
max_det iterations is pure VPU work on on-chip data.

Layout notes (see /opt/skills/guides/pallas_guide.md):
- candidates on the 128-lane minor axis; all IoU math is (1, K) row ops;
- `jax.lax.fori_loop` carries the live-score row functionally;
- dynamic scalar picks/stores use plain dynamic indexing;
- grid = batch: one program instance per image.

The kernel returns the *selection* (indices + validity); gathering the
selected boxes/scores/classes is a cheap XLA gather outside.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, idx_ref, *, iou_thres: float,
                max_det: int):
    # boxes_ref: (1, 4, K); scores_ref: (1, 1, K); idx_ref: (1, 1, max_det)
    k = scores_ref.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, max_det), 1)

    x1 = boxes_ref[0, 0:1, :]
    y1 = boxes_ref[0, 1:2, :]
    x2 = boxes_ref[0, 2:3, :]
    y2 = boxes_ref[0, 3:4, :]
    areas = (x2 - x1) * (y2 - y1)          # (1, K)

    def body(i, carry):
        live, out_idx = carry
        # Argmax + scalar pick via masked reductions: Mosaic has no
        # value-level dynamic_slice, and lane-select keeps this pure VPU.
        score = jnp.max(live)
        keep = score > 0.0
        idx = jnp.argmax(live[0, :]).astype(jnp.int32)
        sel = lanes == idx                  # (1, K) one-hot
        pick = lambda row: jnp.sum(jnp.where(sel, row, 0.0))
        cx1, cy1, cx2, cy2 = pick(x1), pick(y1), pick(x2), pick(y2)
        carea = (cx2 - cx1) * (cy2 - cy1)

        iw = jnp.maximum(jnp.minimum(x2, cx2) - jnp.maximum(x1, cx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, cy2) - jnp.maximum(y1, cy1), 0.0)
        inter = iw * ih
        iou = inter / (areas + carea - inter)

        suppress = (iou > iou_thres) | sel
        live = jnp.where(keep & suppress, 0.0, live)

        value = jnp.where(keep, idx, -1)
        out_idx = jnp.where(out_lanes == i, value, out_idx)
        return live, out_idx

    init = (scores_ref[0], jnp.full((1, max_det), -1, jnp.int32))
    _, out_idx = jax.lax.fori_loop(0, max_det, body, init, unroll=False)
    idx_ref[0] = out_idx


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("iou_thres", "max_det", "interpret"))
def pallas_nms_select(
    boxes_off: jax.Array,    # (B, K, 4) xyxy with class offsets
    scores: jax.Array,       # (B, K) confidence, <= 0 marks invalid
    iou_thres: float = 0.45,
    max_det: int = 300,
    interpret: bool | None = None,
) -> jax.Array:
    """Greedy NMS selection; returns (B, max_det) int32 indices, -1 = none."""
    if interpret is None:
        # Mosaic kernels only compile for TPU; interpret elsewhere (tests).
        interpret = jax.default_backend() != "tpu"
    b, k, _ = boxes_off.shape
    k_pad = _round_up(k, 128)
    if k_pad != k:
        boxes_off = jnp.pad(boxes_off, ((0, 0), (0, k_pad - k), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, k_pad - k)),
                         constant_values=-1.0)

    boxes_t = jnp.swapaxes(boxes_off, 1, 2).astype(jnp.float32)  # (B, 4, K)
    scores_2d = scores[:, None, :].astype(jnp.float32)           # (B, 1, K)

    idx = pl.pallas_call(
        partial(_nms_kernel, iou_thres=iou_thres, max_det=max_det),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, k_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, max_det), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, max_det), jnp.int32),
        interpret=interpret,
    )(boxes_t, scores_2d)
    return idx[:, 0, :]
