"""Pallas TPU prototype: stride-1 3x3 conv at sub-128 channel widths.

stage1's inner convs (64ch at 160x160, reference src/yolo/blocks/gelan.py)
are the largest remaining single-chip cost (docs/performance.md): XLA runs
them lane-padded (2x HBM) at ~15-25% MXU utilization, and the width-packed
rewrite (ops/packed_elan.py) recovers lanes only by doubling FLOPs.

This kernel works on the free width-packed (B, H, W/2, 2C) byte view
(lanes = [even col | odd col]) and runs SIX canonical full-K/full-N MXU
dots per row block — two per kernel row ky, one on the raw packed row and
one on a lane-swapped rolled pair, with block-structured (2C, 2C) weight
matrices (build_conv3_weights) whose useful density is 3/4. No im2col
concat, no Mosaic-inserted transpose, no FLOP doubling, f32 accumulation
in VMEM, and the accumulator lanes are already the packed output.

Grid: (batch, row blocks of TO), double-buffered edge-clamped row-slab DMA
(adown/stem kernel pattern).

RECORDED NEGATIVE RESULT (do not wire in without re-measuring): at
(32, 160, 160, 64) bf16 on v5e this measures 2.23 ms vs 1.92 ms for
XLA's direct lowering — the column-tap relayouts + f32 SiLU epilogue
(~1 ms VPU) outweigh the MXU/HBM gains, so a fused stage1 chain built
from it would recover only intermediate-tensor traffic. Kept with its
interpret-mode test as the measured end of the stage1-chain-kernel idea
(docs/performance.md "What lost").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_conv3_weights(fused):
    """Fused conv params {'w': (3,3,C,Cout), 'b': (Cout,)} -> kernel set.

    Two (2C, 2Cout) matrices per kernel row ky, against the width-packed
    lane layout [even col | odd col]:

      wm[ky] = [[w1, w0],      applied to the packed row xr = [a | b]
                [w2, w1]]      (a = x[2u], b = x[2u+1])
      wz[ky] = [[w0, 0 ],      applied to z = [b<<1 | a>>1]
                [0, w2]]       (prev odd col, next even col)

    so acc = sum_ky xr.wm + z.wz accumulates both output parities on full
    128-lane K and N with 3/4 useful density — measured faster than 18
    half-K parity dots (3.25 ms) and than XLA's padded-lane lowering.
    """
    w = np.asarray(jax.device_get(fused["w"]), np.float32)
    b = np.asarray(jax.device_get(fused["b"]), np.float32)
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    wm = np.zeros((3, 2 * cin, 2 * cout), np.float32)
    wz = np.zeros((3, 2 * cin, 2 * cout), np.float32)
    for ky in range(3):
        w0, w1, w2 = w[ky, 0], w[ky, 1], w[ky, 2]
        wm[ky, :cin, :cout] = w1
        wm[ky, cin:, :cout] = w2
        wm[ky, :cin, cout:] = w0
        wm[ky, cin:, cout:] = w1
        wz[ky, :cin, :cout] = w0
        wz[ky, cin:, cout:] = w2
    return {"wm": jnp.asarray(wm), "wz": jnp.asarray(wz),
            "b2": jnp.asarray(np.concatenate([b, b])[None, :])}


def _kernel(x_hbm, wm_ref, wz_ref, b_ref, out_ref, scratch, sem, *, to: int,
            width: int, cin: int, cout: int, nj: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    step = b * nj + j
    rows = to + 2  # input rows j*to - 1 .. j*to + to

    def dma_op(slot, bb, jj, do):
        def run(src, dst):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start() if do == "start" else d.wait()

        if nj == 1:
            run(x_hbm.at[bb, pl.ds(0, to)], scratch.at[slot, pl.ds(1, to)])
            return
        first, last = jj == 0, jj == nj - 1

        @pl.when(first)
        def _():
            run(x_hbm.at[bb, pl.ds(0, rows - 1)],
                scratch.at[slot, pl.ds(1, rows - 1)])

        @pl.when(last)
        def _():
            run(x_hbm.at[bb, pl.ds(to * jj - 1, rows - 1)],
                scratch.at[slot, pl.ds(0, rows - 1)])

        @pl.when((~first) & (~last))
        def _():
            run(x_hbm.at[bb, pl.ds(to * jj - 1, rows)],
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

    slot = step % 2

    @pl.when(j == 0)
    def _():
        scratch[slot, 0] = jnp.zeros_like(scratch[slot, 0])

    @pl.when(j == nj - 1)
    def _():
        scratch[slot, rows - 1] = jnp.zeros_like(scratch[slot, rows - 1])

    # Packed-native accumulation (Mosaic cannot shape-cast the packed
    # (rows, W/2, 2C) view back to (rows, W, C)): per kernel row ky, the
    # raw packed row xr = [a | b] and the lane-swapped rolled pair
    # z = [b<<1 | a>>1] contract with the wm/wz matrices built in
    # build_conv3_weights — two full-K, full-N MXU dots per ky, and the
    # accumulator's lanes are already the packed [out_even | out_odd].
    f32 = jnp.float32
    w2 = width // 2
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, w2, 1), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * cin), 2)
    X = scratch[slot]                                 # (rows, W/2, 2C)
    dn = (((2,), (0,)), ((), ()))
    acc = jnp.zeros((to, w2, 2 * cout), f32) + b_ref[:]
    for ky in range(3):
        xr = X[ky:to + ky]                            # (to, W/2, 2C)
        rp = jnp.where(sub > 0, jnp.roll(xr, 1, axis=1), 0)
        rn = jnp.where(sub < w2 - 1, jnp.roll(xr, -1, axis=1), 0)
        swap = jnp.roll(jnp.where(lane < cin, rn, rp), cin, axis=2)
        acc = acc + jax.lax.dot_general(
            xr, wm_ref[ky], dimension_numbers=dn, preferred_element_type=f32)
        acc = acc + jax.lax.dot_general(
            swap, wz_ref[ky], dimension_numbers=dn,
            preferred_element_type=f32)
    y = acc * jax.nn.sigmoid(acc)
    out_ref[0] = y.astype(out_ref.dtype)


def conv3_silu(x: jax.Array, weights, *, interpret: bool = False):
    """x (B, H, W, C) -> SiLU(conv3x3_s1_p1(x) + b), natural-layout kernel.

    HBM transfers use the free width-packed (B, H, W/2, 2C) byte view so
    the manual DMA's trailing lane dim is 128-aligned; requires W even
    and 2C a lane multiple.
    """
    B, H, W, cin = x.shape
    cout = weights["wm"].shape[2] // 2
    assert W % 2 == 0 and (2 * cin) % 128 == 0 and (2 * cout) % 128 == 0
    to = next(t for t in (16, 8, 4, 2) if H % t == 0)
    dtype = x.dtype
    xp = x.reshape(B, H, W // 2, 2 * cin)
    kernel = partial(_kernel, to=to, width=W, cin=cin, cout=cout,
                     nj=H // to)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W // 2, 2 * cout), dtype),
        grid=(B, H // to),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, to, W // 2, 2 * cout),
                               lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, to + 2, W // 2, 2 * cin), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, weights["wm"].astype(dtype), weights["wz"].astype(dtype),
      weights["b2"])
    return out.reshape(B, H, W, cout)
