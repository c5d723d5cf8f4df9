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


def _dma_phase(xt_hbm, scratch, sem, *, to: int, nj: int):
    """Edge-clamped double-buffered input DMA shared by the forward and
    weight-grad kernels (adown_kernel.py pattern): scratch row r holds
    input row 2*to*j - 1 + r. Only the first row block reaches above the
    image (global row -1): its scratch row 0 is skipped by the DMA and
    zeroed (conv zero padding). nj is static: with a single row block the
    j>0 arm would slice rows = 2*to+1 > H out of xt, so it must not be
    traced at all. Returns the ready slot index."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    step = b * nj + j
    rows = 2 * to + 1  # input rows 2*j*to - 1 .. 2*(j+1)*to - 1

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

    return step % 2


def _assemble_p2(scratch, slot, *, to: int, wp: int):
    """Assemble P^T for ALL `to` output rows of the block at once: two
    overlapping slab loads, row parity via leading-dim reshapes (free
    address arithmetic), then fold adjacent output-row pairs into the
    sublane (K) dim -> (to/2, 64, wp)."""
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
    return jnp.concatenate([pr[:, 0], pr[:, 1]], axis=1)  # (to/2, 64, wp)


def _kernel(xt_hbm, w2_ref, b2_ref, out_ref, scratch, sem, *, to: int,
            wo: int, wp: int, cout: int, nj: int, act: bool,
            bf16_epi: bool):
    slot = _dma_phase(xt_hbm, scratch, sem, to=to, nj=nj)
    p2 = _assemble_p2(scratch, slot, to=to, wp=wp)
    # ONE (to/2, 64, wp) x (64, 2*cout) MXU dot per row-pair block.
    acc = jax.lax.dot_general(
        p2, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (to/2, wp, 2*cout)
    # slice the lane padding off BEFORE the epilogue: the bias/SiLU VPU
    # work runs on wo lanes instead of wp (wp-wo = 64 padding lanes at
    # 640px, ~17% of the epilogue); identical values for the kept lanes.
    y = acc[:, :wo] + b2_ref[:]
    if act:
        s = jax.nn.sigmoid(y)            # exp is f32-only on the VPU
        if bf16_epi:
            # bf16 final multiply (YOLO_TPU_STEM_BF16_EPI=1): <= ~1 bf16
            # ulp vs the f32 multiply-then-cast. NOTE a fully-bf16 SiLU
            # (jax.nn.sigmoid on bf16) trips a Mosaic verifier bug
            # (vector.broadcast f32->bf16) — keep the sigmoid f32.
            out_ref[0] = y.astype(out_ref.dtype) * s.astype(out_ref.dtype)
            return
        y = y * s
    out_ref[0] = y.astype(out_ref.dtype)


def _wgrad_kernel(xt_hbm, g_ref, out_ref, scratch, acc_ref, sem, *,
                  to: int, wo: int, wp: int, nj: int):
    """dW2 (64, 2*cout) = sum over row-pair blocks of P2^T . g.

    g arrives in the forward's row-paired packed layout (auto-pipelined
    block (1, to/2, wo, 2*cout)); it is zero-padded to wp lanes so the
    contraction can run over the full padded width (P2's lanes >= wo
    multiply zeros — including the lane-roll garbage at lane wo). The
    off-diagonal quarters of the (64, 2*cout) result (even-row taps x
    odd-row grads) are computed-and-discarded by the caller's unpacking;
    that 2x MXU waste is ~0.2 ms at 640px/b32, cheaper than splitting
    the dot. The f32 accumulator lives in VMEM across the sequential
    grid; the last step writes it out."""
    step = pl.program_id(0) * nj + pl.program_id(1)
    nb = pl.num_programs(0)
    slot = _dma_phase(xt_hbm, scratch, sem, to=to, nj=nj)
    p2 = _assemble_p2(scratch, slot, to=to, wp=wp)
    g = g_ref[0].astype(scratch.dtype)                   # (to/2, wo, 2cout)
    g = jnp.pad(g, ((0, 0), (0, wp - wo), (0, 0)))
    # Mosaic supports only single-dim contractions: unroll the row-pair
    # dim into to/2 plain (64, wp) x (wp, 2cout) MXU dots (static, <= 16).
    d = sum(
        jax.lax.dot_general(
            p2[i], g[i], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for i in range(p2.shape[0]))                     # (64, 2*cout)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += d

    @pl.when(step == nb * nj - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _block_rows(ho: int) -> int:
    # Row-block size: 32 measured ~5% faster than 16 at 640px (2.78 vs
    # 2.93 ms) — fewer grid steps amortize the per-step DMA/weight setup.
    # YOLO_TPU_STEM_TO is read at TRACE time (baked into the jit cache);
    # changing it after the first compile of a shape has no effect.
    import os
    tmax = max(2, int(os.environ.get("YOLO_TPU_STEM_TO", "32")))
    return next(t for t in (tmax, 32, 16, 8, 4, 2)
                if ho % t == 0 and t <= tmax)


def to_phase_planes(x: jax.Array) -> jax.Array:
    """x (B, H, W, 3) -> phase-plane view xt (B, H, 8, wp):
    xt[b, iy, 3*(ix%2)+cin, ix//2] = x[b, iy, ix, cin]. One XLA
    transpose+pad of the (dense) input; all later data movement is
    in-kernel. Planes 6..7 and lanes >= W/2 are zeros."""
    B, H, W, c = x.shape
    assert c == CIN and W % 2 == 0
    wo = W // 2
    wp = -(-wo // 128) * 128
    xt = jnp.transpose(x.reshape(B, H, wo, 6), (0, 1, 3, 2))
    return jnp.pad(xt, ((0, 0), (0, 0), (0, PLANES - 6), (0, wp - wo)))


def _stem_pallas(xt, w2, b2, *, ho: int, wo: int, act: bool, dtype,
                 interpret: bool = False):
    import os

    wp = xt.shape[-1]
    cout = w2.shape[1] // 2
    to = _block_rows(ho)
    B = xt.shape[0]
    bf16_epi = (dtype == jnp.bfloat16
                and os.environ.get("YOLO_TPU_STEM_BF16_EPI", "0") == "1")
    kernel = partial(_kernel, to=to, wo=wo, wp=wp, cout=cout,
                     nj=ho // to, act=act, bf16_epi=bf16_epi)
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
    )(xt, w2.astype(dtype), b2)


def stem_conv_packed(x: jax.Array, weights, *, interpret: bool = False):
    """x (B, H, W, 3) -> row-paired packed stem output (B, H/4, W/2, 2*Cout):

        out[b, i, ox, Cout*r + c] = SiLU(conv3x3_s2_p1(x) + bias)[b, 2i+r, ox, c]

    The packed tensor is exactly lane-tiled in HBM (no T(8,128) channel
    padding); use `unpack_rows` for NHWC or `pack_next_conv_weights` to
    let the following stride-2 conv consume it directly.
    """
    B, H, W, c = x.shape
    assert c == CIN and H % 4 == 0 and W % 2 == 0
    xt = to_phase_planes(x)
    return _stem_pallas(xt, weights["w2"], weights["b2"], ho=H // 2,
                        wo=W // 2, act=True, dtype=x.dtype,
                        interpret=interpret)


def stem_conv_packed_raw(xt: jax.Array, w2: jax.Array, *, wo: int,
                         dtype=jnp.bfloat16, interpret: bool = False):
    """Pre-BN variant for TRAINING: phase-plane input xt (B, H, 8, wp),
    TRACED block-diagonal weights w2 (64, 2*Cout) built in-trace from the
    raw kernel (see ops/stem_train.py), no bias, no activation. Returns
    the row-paired packed conv output (B, H/4, wo, 2*Cout) in `dtype`
    (bf16: the cast into the compute dtype happens in the kernel
    epilogue, matching the bf16 train path of ops/conv.py:251-268)."""
    cout = w2.shape[1] // 2
    b2 = jnp.zeros((1, 2 * cout), jnp.float32)
    return _stem_pallas(xt, w2, b2, ho=xt.shape[1] // 2, wo=wo, act=False,
                        dtype=dtype, interpret=interpret)


def stem_wgrad_packed(xt: jax.Array, g: jax.Array, *,
                      interpret: bool = False):
    """Weight gradient of the packed stem conv: xt (B, H, 8, wp) phase
    planes, g (B, H/4, wo, 2*Cout) cotangent in the row-paired packed
    layout -> dW2 (64, 2*Cout) f32 (the cotangent of w2; unpack with the
    transpose of the w2 packing). XLA's own weight-grad conv for the
    cin=3 stride-2 stem runs ~15x off roofline (8.1 of the 15.9 ms
    train-mode stem1, docs/performance.md); this is two MXU passes over
    the already-materialized phase planes instead."""
    B, H, _, wp = xt.shape
    _, h4, wo, cout2 = g.shape
    ho = H // 2
    assert h4 == ho // 2
    to = _block_rows(ho)
    kernel = partial(_wgrad_kernel, to=to, wo=wo, wp=wp, nj=ho // to)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, cout2), jnp.float32),
        grid=(B, ho // to),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # xt (manual DMA)
            pl.BlockSpec((1, to // 2, wo, cout2),    # g (auto-pipelined)
                         lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * to + 2, PLANES, wp), xt.dtype),
            pltpu.VMEM((64, cout2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, g)


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
