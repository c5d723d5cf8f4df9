"""Pallas TPU kernel: the 3-channel stem conv (Conv 3->64, k3 s2 p1 + SiLU).

The network's first conv (reference: src/yolo/blocks/conv.py:55-93 with
cin=3) is the worst-mapped layer in the whole model for XLA on v5e: with
3 input channels the im2col contraction is K=27, the native conv emitter
runs far off roofline, and — decisive, read off the compiled layouts —
the (B, 320, 320, 64) result is lane-padded T(8,128) in HBM, so XLA
physically writes 840 MB for a 420 MB tensor and the consumer re-reads
840 MB. The layer costs ~4.1 ms of a ~40 ms gelan-c/640 batch-32 forward
(and its consumer pays the padding again).

This kernel picks layouts on BOTH sides of the op:

Input: a one-off XLA transpose+pad rewrites x (B, H, W, 3) into

    xt (B, H, 8, wp)      wp = W/2 rounded up to a lane multiple (128)

where row iy holds eight "phase planes" in sublanes: the even-pixel
channels (p=0..2) and odd-pixel channels (p=3..5) of that row, with the
output-pixel index ox in the **lane** dimension (planes 6..7 and lanes
>= W/2 are zero padding — manual DMA needs tile-aligned trailing dims).
A stride-2 3x3 window over output pixel ox reads, per kernel row ky: the
odd plane lane-rolled right by one (input col 2ox-1), the even plane
(col 2ox), and the odd plane (col 2ox+1), so the transposed im2col
matrix P^T (27 x wp) of one output row is nine (3, wp) plane slices
stacked along sublanes.

Output: ROW-PAIRED packed layout — lanes hold (row parity, channel):

    out (B, H/4, wp->wo, 2*Cout)   out[b, i, ox, 64r+c] = stem[b, 2i+r, ox, c]

Two adjacent output rows' P^T stack along sublanes ((to/2, 64, wp), a
free leading-dim reshape) and contract with the block-diagonal

    W2 (64, 128) = [[Wp, 0], [0, Wp]],   Wp = w.reshape(27, 64) -> (32, 64)

in ONE MXU dot per row-pair block: full 128-lane results (the naive
(wp, 64) result wastes half of every vreg), half the MXU passes of the
per-row dot, a full-lane f32 bias+SiLU epilogue, and an exactly-packed
420 MB store with no transposes anywhere. Consumers read the packed
tensor directly: the next conv (64->128 k3 s2) becomes a dense
(2,3)-window conv over row pairs (see `pack_next_conv_weights`), or
`unpack_rows` restores NHWC with one XLA relayout.

Grid: (batch, row-pair blocks of TO/2). Each step DMAs a (2*TO+1, 8, wp)
input row slab (double-buffered, edge-clamped like
ops/pallas/adown_kernel.py: the first block's top row is garbage and
zeroed in-kernel — conv zero padding).

Numerics: same bf16-operand / f32-accumulate contraction as the fused XLA
conv, re-associated; pinned by tests/test_blocks.py (interpret mode) and
on-chip by scripts/tpu_validate_stem.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CIN = 3
PLANES = 8  # 6 phase planes, sublane-padded to the tile height


def build_stem_kernel_weights(fused):
    """Fused stem params {'w': (3,3,3,Cout) HWIO, 'b': (Cout,)} -> kernel set.

    W2 is the row-pair block-diagonal (64, 2*Cout): sublanes 0..31 carry
    the even output row's im2col rows (HWIO order 9*ky + 3*kx + c, padded
    27 -> 32), sublanes 32..63 the odd row's, each feeding its own Cout
    lane half.
    """
    w = np.asarray(jax.device_get(fused["w"]), np.float32)
    kh, kw, cin, cout = w.shape
    assert (kh, kw, cin) == (3, 3, CIN)
    wp = np.zeros((32, cout), np.float32)
    wp[:27] = w.reshape(27, cout)
    w2 = np.zeros((64, 2 * cout), np.float32)
    w2[:32, :cout] = wp
    w2[32:, cout:] = wp
    b = np.asarray(jax.device_get(fused["b"]), np.float32)
    return {"w2": jnp.asarray(w2),
            "b2": jnp.asarray(np.concatenate([b, b])[None, :])}


def _kernel(xt_hbm, w2_ref, b2_ref, out_ref, scratch, sem, *, to: int,
            wo: int, wp: int, cout: int, nj: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    step = b * nj + j
    rows = 2 * to + 1  # input rows 2*j*to - 1 .. 2*(j+1)*to - 1

    # Edge-clamped double-buffered DMA (adown_kernel.py pattern): scratch
    # row r holds input row 2*to*j - 1 + r. Only the first row block
    # reaches above the image (global row -1): its scratch row 0 is
    # skipped by the DMA and zeroed below (conv zero padding). nj is
    # static: with a single row block the j>0 arm would slice
    # rows = 2*to+1 > H out of xt, so it must not be traced at all.
    def dma_op(slot, bb, jj, do):
        def run(src, dst):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start() if do == "start" else d.wait()

        first = jj == 0

        @pl.when(first)
        def _():
            run(xt_hbm.at[bb, pl.ds(0, rows - 1)],
                scratch.at[slot, pl.ds(1, rows - 1)])

        if nj > 1:
            @pl.when(~first)
            def _():
                run(xt_hbm.at[bb, pl.ds(2 * to * jj - 1, rows)],
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

    @pl.when(j == 0)
    def _():
        scratch[step % 2, 0] = jnp.zeros_like(scratch[step % 2, 0])

    # Assemble P^T for ALL `to` output rows of the block at once: two
    # overlapping slab loads, row parity via leading-dim reshapes (free
    # address arithmetic), then fold adjacent output-row pairs into the
    # sublane (K) dim and fire ONE (to/2, 64, wp) x (64, 2*cout) MXU dot.
    slot = step % 2
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wp), 2)
    zpad = jnp.zeros((to, 5, wp), scratch.dtype)

    a0 = scratch[slot, pl.ds(0, 2 * to)].reshape(to, 2, PLANES, wp)
    a2 = scratch[slot, pl.ds(2, 2 * to)].reshape(to, 2, PLANES, wp)
    pieces = []
    for sl in (a0[:, 0], a0[:, 1], a2[:, 0]):            # ky = 0, 1, 2
        odd = sl[:, 3:6]
        # input col 2*ox - 1 = odd plane at ox-1: one-lane roll right,
        # lane 0 -> 0 (left zero padding)
        prev = jnp.where(lane > 0, jnp.roll(odd, 1, axis=2), 0)
        pieces += [prev, sl[:, :3], odd]
    p = jnp.concatenate(pieces + [zpad], axis=1)         # (to, 32, wp)
    pr = p.reshape(to // 2, 2, 32, wp)
    p2 = jnp.concatenate([pr[:, 0], pr[:, 1]], axis=1)   # (to/2, 64, wp)
    acc = jax.lax.dot_general(
        p2, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                      # (to/2, wp, 2*cout)
    y = acc + b2_ref[:]
    y = y * jax.nn.sigmoid(y)
    out_ref[0] = y[:, :wo].astype(out_ref.dtype)


def stem_conv_packed(x: jax.Array, weights, *, interpret: bool = False):
    """x (B, H, W, 3) -> row-paired packed stem output (B, H/4, W/2, 2*Cout):

        out[b, i, ox, Cout*r + c] = SiLU(conv3x3_s2_p1(x) + bias)[b, 2i+r, ox, c]

    The packed tensor is exactly lane-tiled in HBM (no T(8,128) channel
    padding); use `unpack_rows` for NHWC or `pack_next_conv_weights` to
    let the following stride-2 conv consume it directly.
    """
    B, H, W, c = x.shape
    assert c == CIN and H % 4 == 0 and W % 2 == 0
    ho, wo = H // 2, W // 2
    wp = -(-wo // 128) * 128
    cout = weights["w2"].shape[1] // 2
    # Row-block size: 32 measured ~5% faster than 16 at 640px (2.78 vs
    # 2.93 ms) — fewer grid steps amortize the per-step DMA/weight setup.
    # YOLO_TPU_STEM_TO is read at TRACE time (baked into the jit cache);
    # changing it after the first compile of a shape has no effect.
    import os
    tmax = max(2, int(os.environ.get("YOLO_TPU_STEM_TO", "32")))
    to = next(t for t in (tmax, 32, 16, 8, 4, 2) if ho % t == 0 and t <= tmax)
    dtype = x.dtype

    # Phase-plane view: xt[b, iy, 3*(ix%2)+cin, ix//2] = x[b, iy, ix, cin].
    # One XLA transpose+pad of the (dense) input; all later data movement
    # is in-kernel. Planes 6..7 and lanes >= wo are zeros.
    xt = jnp.transpose(x.reshape(B, H, wo, 6), (0, 1, 3, 2))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, PLANES - 6), (0, wp - wo)))

    kernel = partial(_kernel, to=to, wo=wo, wp=wp, cout=cout, nj=ho // to)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, ho // 2, wo, 2 * cout), dtype),
        grid=(B, ho // to),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # xt (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b2
        ],
        out_specs=pl.BlockSpec((1, to // 2, wo, 2 * cout),
                               lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * to + 2, PLANES, wp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, weights["w2"].astype(dtype), weights["b2"])


def unpack_rows(packed: jax.Array) -> jax.Array:
    """(B, HO/2, WO, 2C) row-paired -> (B, HO, WO, C) NHWC (one XLA relayout)."""
    B, h2, wo, c2 = packed.shape
    c = c2 // 2
    y = packed.reshape(B, h2, wo, 2, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(B, 2 * h2, wo, c)


def stem_conv(x: jax.Array, weights, *, interpret: bool = False):
    """x (B, H, W, 3) -> SiLU(conv3x3_s2_p1(x) + b), (B, H/2, W/2, Cout)."""
    return unpack_rows(stem_conv_packed(x, weights, interpret=interpret))


def pack_next_conv_weights(fused):
    """Rewrite the FOLLOWING conv's fused params (k3 s2 p1, Cin=64) to
    consume the row-paired packed stem output directly.

    A 3x3 stride-2 conv whose input rows are packed in lane pairs
    (r, c) becomes a (2, 3)-window conv over row pairs with stride
    (1, 2) and padding ((1, 0), (1, 1)): output row oy reads input rows
    2oy-1, 2oy, 2oy+1 = (pair oy-1, odd), (pair oy, even), (pair oy,
    odd). Tap (pair 0, even) is identically zero.
    """
    w = np.asarray(jax.device_get(fused["w"]), np.float32)
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    w2 = np.zeros((2, kw, 2 * cin, cout), np.float32)
    w2[0, :, cin:] = w[0]
    w2[1, :, :cin] = w[1]
    w2[1, :, cin:] = w[2]
    return dict(fused, w=jnp.asarray(w2))
