"""Pallas TPU kernel: ADown fused end-to-end from the width-packed layout.

ADown (reference: src/yolo/blocks/downsample.py:24-50) is
avgpool(2,1,0) -> channel split -> [3x3 s2 conv | maxpool(3,2,1) + 1x1
conv] -> concat. Its XLA lowering materializes the stride-1 avgpool (a
~420 MB tensor at stage1 shapes, measured ~2.5x off roofline) and, when
fed by the width-packed stage1 ELAN (ops/packed_elan.py), pays an extra
lane-relayout to un-pack the producer's output. This kernel does the
whole block in one pass over the PACKED input:

    (B, H, Wp, 2C) packed p=2 over C=256  ->  (B, H/2, Wp, 256)

Per grid step (batch, row-block) it holds a (2*TO+2)-row slice in VMEM
(double-buffered DMA: the next block streams in while the current one
computes), forms the 2x2 window sums with a handful of VPU adds (even
pixels = in-col phase sum, odd pixels = cross-col phase sum; the /4 is
folded into the conv weights - max is monotone so the maxpool branch
commutes with the scale), and computes both branches on-chip: the
stride-2 3x3 conv as six (TO*Wp, 256)x(256, 128) MXU matmuls over
[s_even | s_odd] lane pairs (full 128-lane contraction and output), and
the maxpool branch as shifted maxima + one (TO*Wp, 128)x(128, 128)
matmul. Row-parity selections are (pairs, 2) reshapes on the major dims
(Mosaic has no strided row slice). Nothing but the input slice and the
(TO, Wp, 256) result touches HBM.

Avgpool edge semantics match torch exactly: the 'valid' avg domain is
rows/pixels 0..H-2 / 0..W-2; outside it the conv branch sees zeros
(zero-padding) and the maxpool branch sees -inf (torch max_pool2d
padding) - handled by a global-row mask and last-column constructions.

Numerics: same f32-accumulated sums as the fused XLA graph, re-associated
(the folded /4 scales weights in f32 at build time); pinned by
tests/test_blocks.py::test_pallas_adown_matches_fused (interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 256          # ADown in_channels this kernel supports (stage1 -> down1)
HALF = C // 2


def build_adown_kernel_weights(fused, dtype=jnp.bfloat16):
    """Fused ADown params -> kernel weight set.

    conv_stride (3,3,128,128) becomes wk (3,2,256,128): width-window
    (col o-1, col o) over [s_even | s_odd] lanes — tap 0 reads s_odd
    (avg pixel 2o-1), tap 1 reads s_even then s_odd (pixels 2o, 2o+1).
    The avgpool's 1/4 is folded into both branch weights.
    """
    ws = np.asarray(jax.device_get(fused["conv_stride"]["w"]),
                    np.float32) * 0.25
    wk = np.zeros((3, 2, 2 * HALF, HALF), np.float32)
    wk[:, 0, HALF:] = ws[:, 0]
    wk[:, 1, :HALF] = ws[:, 1]
    wk[:, 1, HALF:] = ws[:, 2]
    w2 = np.asarray(jax.device_get(fused["conv_pool"]["w"]),
                    np.float32)[0, 0] * 0.25               # (128, 128)
    return {
        "wk": jnp.asarray(wk, dtype),
        "b1": jnp.asarray(np.asarray(jax.device_get(
            fused["conv_stride"]["b"]), np.float32)[None, :]),
        "w2": jnp.asarray(w2, dtype),
        "b2": jnp.asarray(np.asarray(jax.device_get(
            fused["conv_pool"]["b"]), np.float32)[None, :]),
    }


def _kernel(x_hbm, wk_ref, b1_ref, w2_ref, b2_ref, out_ref, scratch, sem,
            *, to: int, wp: int, h: int, wp_true: int, raw: bool = False,
            c: int = C):
    half = c // 2
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nj = pl.num_programs(1)
    step = b * nj + j
    rows = 2 * to + 2

    # Edge-clamped DMA: no padded copy of the input. The first block's
    # scratch row 0 and the last block's final row are left as garbage —
    # every avg row they influence is outside [0, h-2] and the row masks
    # below select 0 / -inf for it unconditionally (jnp.where, NaN-safe).
    def dma_op(slot, bb, jj, do):
        def run(src, dst):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start() if do == "start" else d.wait()

        if nj == 1:                      # static: single block covers all
            run(x_hbm.at[bb, pl.ds(0, 2 * to)],
                scratch.at[slot, pl.ds(1, 2 * to)])
            return
        first, last = jj == 0, jj == nj - 1

        @pl.when(first)
        def _():
            run(x_hbm.at[bb, pl.ds(0, rows - 1)],
                scratch.at[slot, pl.ds(1, rows - 1)])

        @pl.when(last)
        def _():
            run(x_hbm.at[bb, pl.ds(2 * to * jj - 1, rows - 1)],
                scratch.at[slot, pl.ds(0, rows - 1)])

        @pl.when((~first) & (~last))
        def _():
            run(x_hbm.at[bb, pl.ds(2 * to * jj - 1, rows)],
                scratch.at[slot, pl.ds(0, rows)])

    @pl.when(step == 0)
    def _():
        dma_op(0, b, j, "start")

    @pl.when(step + 1 < nb * nj)
    def _():
        s2 = step + 1
        b2 = s2 // nj
        j2 = s2 - b2 * nj
        dma_op(s2 % 2, b2, j2, "start")

    dma_op(step % 2, b, j, "wait")
    X = scratch[step % 2]                        # (rows+1, Wp, 2C)

    # The scratch carries ONE EXTRA (never-DMA'd, garbage) row so every
    # (pairs, 2) reshape below is a pure major-dim reshape instead of a
    # zero-row concat copy (4 full-tensor copies saved per step). The
    # garbage propagates only into pair slot (to, 1) = avg row 2to+1,
    # which no kh tap selects, and into row-masked rows.
    q0, q1 = X[..., :c], X[..., c:]
    q0h = q0[:-1] + q0[1:]                       # (rows, Wp, C) 2x2 sums
    q1h = q1[:-1] + q1[1:]
    s_even = q0h + q1h                           # window sum at even pixels
    # odd pixels: q1 of col c + q0 of col c+1 (lane-rolled; the wrapped
    # last column is invalid and masked by odd_ok below)
    s_odd = q1h + jnp.roll(q0h, -1, axis=1)      # (rows, Wp, C)

    # global avg row of local row i: g = 2*to*j - 1 + i (input zero-padded
    # one row top/bottom); valid iff 0 <= g <= h-2
    g = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
         + 2 * to * j - 1)
    row_ok = (g >= 0) & (g <= h - 2)
    # odd pixel 2c+1 is valid iff 2c+1 <= W-2, i.e. c < wp_true - 1 (with
    # width padded to a sublane multiple, cols >= wp_true-1 are invalid;
    # this also kills the jnp.roll wrap above)
    odd_ok = (jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
              < wp_true - 1)

    f32 = jnp.float32

    # ---- branch 1: stride-2 3x3 conv over avg (zero padding) ----
    # Output col o reads avg pixels 2o-1 (odd col o-1), 2o (even col o),
    # 2o+1 (odd col o). Each source is materialized as its own aligned
    # (rows, Wp, 128) array and contracted separately — lane-concats of
    # differently-offset slices hit a Mosaic "offset mismatch" limit at
    # widths not divisible by 16, and the split matmuls cost the same
    # MXU work anyway.
    ze = jnp.where(row_ok, s_even[..., :half], 0)
    z_cur = jnp.where(row_ok & odd_ok, s_odd[..., :half], 0)
    z_prev = jnp.roll(z_cur, 1, axis=1)          # col 0 <- z_cur[-1] == 0

    def pairs(a):
        # avg row 2i+kh for output row i via a (pairs, 2) major reshape
        return a.reshape(to + 1, 2, wp, half)

    pe, pp, pc = pairs(ze), pairs(z_prev), pairs(z_cur)
    acc = jnp.zeros((to * wp, half), f32)
    for kh, sel in enumerate((lambda q: q[0:to, 0], lambda q: q[0:to, 1],
                              lambda q: q[1:to + 1, 0])):
        acc = acc + jnp.dot(sel(pp).reshape(to * wp, half),
                            wk_ref[kh, 0, half:], preferred_element_type=f32)
        acc = acc + jnp.dot(sel(pe).reshape(to * wp, half),
                            wk_ref[kh, 1, :half], preferred_element_type=f32)
        acc = acc + jnp.dot(sel(pc).reshape(to * wp, half),
                            wk_ref[kh, 1, half:], preferred_element_type=f32)
    if raw:          # train mode: pre-BN conv output, no bias/activation
        y1 = acc
    else:
        y1 = acc + b1_ref[:]
        y1 = y1 * jax.nn.sigmoid(y1)

    # ---- branch 2: maxpool(3,2,1) over avg (-inf padding) + 1x1 conv ----
    neg = jnp.asarray(-jnp.inf, s_even.dtype)
    be = s_even[..., half:]
    bo = jnp.where(row_ok & odd_ok, s_odd[..., half:], neg)
    bo_prev = jnp.roll(bo, 1, axis=1)            # col 0 <- bo[-1] == -inf
    m_w = jnp.maximum(jnp.maximum(bo_prev, be), bo)   # (rows, Wp, 128)
    m_w = jnp.where(row_ok, m_w, neg)
    mpair = m_w.reshape(to + 1, 2, wp, half)
    m = jnp.maximum(jnp.maximum(mpair[0:to, 0], mpair[0:to, 1]),
                    mpair[1:to + 1, 0])               # (to, Wp, 128)
    y2 = jnp.dot(m.reshape(to * wp, half).astype(wk_ref.dtype), w2_ref[:],
                 preferred_element_type=f32)
    if not raw:
        y2 = y2 + b2_ref[:]
        y2 = y2 * jax.nn.sigmoid(y2)

    out = jnp.concatenate([y1, y2], axis=-1).reshape(1, to, wp, c)
    out_ref[:] = out.astype(out_ref.dtype)


def adown_from_packed(xp: jax.Array, weights, *, interpret: bool = False,
                      raw: bool = False):
    """xp: (B, H, Wp, 512) width-packed p=2 over 256ch -> (B, H/2, Wp, 256).

    The producer view of the unpacked tensor is (B, H, 2*Wp, 256).
    raw=True (train forward, ops/adown_train.py): emit the PRE-BN conv
    outputs of both branches (no bias, no SiLU); weights then carry the
    in-trace packed RAW kernels (avgpool /4 still folded in).
    """
    B, h, wp_true, c2 = xp.shape
    c = c2 // 2
    assert c2 == 2 * c and c % 256 == 0, c2   # branch halves = full tiles
    h_out = h // 2
    # TO=8 keeps peak VMEM (double-buffered scratch + the avg/branch
    # intermediates) around 9 MB — TO=16 exceeds the ~16 MB v5e VMEM.
    to = next(t for t in (8, 4, 2, 1) if h_out % t == 0)
    # Mosaic requires sublane (the packed-col dim) slices in multiples of
    # 8: pad the width, mask the edge column inside, slice the output.
    wp = (wp_true + 7) // 8 * 8
    if wp != wp_true:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp - wp_true), (0, 0)))

    dtype = xp.dtype
    kernel = partial(_kernel, to=to, wp=wp, h=h, wp_true=wp_true,
                     raw=raw, c=c)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, h_out, wp, c), dtype),
        grid=(B, h_out // to),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),         # wk
            pl.BlockSpec(memory_space=pltpu.VMEM),         # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),         # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),         # b2
        ],
        out_specs=pl.BlockSpec((1, to, wp, c),
                               lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # one extra never-DMA'd row: (pairs, 2) reshapes need an even
            # row count; the garbage row lands in unselected pair slots
            pltpu.VMEM((2, 2 * to + 3, wp, 2 * c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, weights["wk"].astype(dtype), weights["b1"],
      weights["w2"].astype(dtype), weights["b2"])
    return out if wp == wp_true else out[:, :, :wp_true]
