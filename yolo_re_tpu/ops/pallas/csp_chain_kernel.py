"""Pallas TPU kernel: the CSP bottleneck chain, fused in VMEM (inference).

The round-3 verdict left one stage1 question open: the per-conv Pallas
building block measured SLOWER than XLA (ops/pallas/conv3_kernel.py,
2.23 vs 1.92 ms at 64ch) because each call pays HBM in/out plus a VPU
epilogue — but a *chain* keeps the intermediates in VMEM, which is where
the remaining stage1 headroom lives (docs/performance.md "Where the
remaining headroom is"). This kernel is that measured data point: the
RepNCSP bottleneck pair

    r = m + conv2_3x3(silu)( rep_3x3(silu)(m) )        (n times)

fused end-to-end on the p=4 width-packed layout the stage1 CSP interior
already uses (ops/packed_elan.py: m is (B, H, W/4, 128) = 4 pixels x
32ch per lane group; reference block: src/yolo/blocks/bottleneck.py:26-55
inside src/yolo/blocks/csp.py:28-64). In/out are both p=4 — no parity
conversion anywhere, so the kernel is drop-in at the two stage1 CSP
sites.

Each 3x3 conv runs as SIX full-K/full-N (128,128) MXU dots per row block
(the conv3_kernel wm/wz trick generalized to 4 pixel phases): per kernel
row ky, the raw packed row contracts with a block-tridiagonal "wm"
holding the in-column taps (10/16 blocks useful), and a lane-shifted
cross-column array contracts with "wz" (prev-col phase 3 -> out phase 0,
next-col phase 0 -> out phase 3). Useful density 12/32 = 2.67x FLOP
inflation — vs the 4x of the XLA p=4 packed conv it replaces, and with
no HBM boundary between the chained convs.

Grid: (batch, row blocks of TO). Double-buffered edge-clamped row-slab
DMA with a 2n-row halo (chain of 2n 3x3 convs); out-of-image conv
outputs are re-zeroed after each SiLU so the next conv's zero padding
matches the unfused graph exactly.

Numerics: the same bf16-operand / f32-accumulate / bf16-cast-per-conv
sums as the packed XLA path (ops/packed_elan.py::_pconv), re-associated;
pinned by tests/test_blocks.py (interpret mode) and on-chip by
scripts/microbench_stage1.py STAGE=chain.

OUTCOME (2026-08-20, the measured answer to the round-3 question): the
isolated segment wins — 0.788->0.732 ms (1.08x) at n=1, 1.603->1.294 ms
(1.24x) at n=2 — but the full gelan-c/640/b32 step measures NEGATIVE:
ABBA 4x4, chain 797.4+-3.5 vs XLA loop 804.2+-2.2 img/s (-0.84%).
Fusion-boundary erosion (the pallas_call pins the layouts/fusions of
the neighboring packed convs); at gelan-c's n=1 the 56 us/segment
margin is smaller than the boundary tax. Shipped OPT-IN via
YOLO_TPU_CSP_CHAIN=1.

ROUND-5 CLOSURE of the "re-try at num_repeats>=2" note: measured e2e on
gelan-c-d2 (depth_multiplier 2.0 -> n=2 at the same C=32/P=4 geometry,
configs/models/gelan-c-d2.yaml) — ABBA 2x, chain 716.0+-2.3 vs XLA
loop 717.2+-0.2 img/s (-0.16%, within noise; the 1.24x isolated depth
scaling is fully absorbed by the same boundary tax). The kernel stays
opt-in at every shipped depth; this experiment is CLOSED — do not
re-try without a structurally different integration (e.g. fusing the
chain's entry/exit convs into the kernel itself). Full record:
docs/performance.md "What lost".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 32          # bottleneck channel width (block_channels // 2)
P = 4           # pixels per lane group (p=4 packing)
LANES = P * C   # 128


def _parity_mats(w: np.ndarray):
    """w (3, 3, C, C) HWIO -> (wm, wz), each (3, 128, 128).

    Out pixel 4q+po taps in pixels 4q+po-1 .. 4q+po+1: in-column phases
    pi = po+kx-1 in [0, 4) go to wm (block (pi -> po) = w[ky, kx]); the
    two cross-column taps (po=0 <- prev col phase 3, po=3 <- next col
    phase 0) go to wz against the z array built in-kernel.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw, cin, cout) == (3, 3, C, C)
    wm = np.zeros((3, LANES, LANES), np.float32)
    wz = np.zeros((3, LANES, LANES), np.float32)
    for ky in range(3):
        for po in range(P):
            for kx in range(3):
                pi = po + kx - 1
                if 0 <= pi < P:
                    wm[ky, pi * C:(pi + 1) * C,
                       po * C:(po + 1) * C] = w[ky, kx]
        # z lanes 0:32 = prev col phase 3; lanes 96:128 = next col phase 0
        wz[ky, 0:C, 0:C] = w[ky, 0]
        wz[ky, 3 * C:, 3 * C:] = w[ky, 2]
    return wm, wz


def build_bottleneck_chain_weights(fused_csp):
    """Fused RepNCSP params (models/fuse.py pytree: bottlenecks[i] =
    {"conv1": {"fused": {w, b}}, "conv2": {w, b}}, each conv (3,3,32,32))
    -> stacked kernel weight set {wm, wz: (n, 2, 3, 128, 128), b: (n, 2,
    128) f32} (bias tiled over the 4 pixel phases)."""
    wms, wzs, bs = [], [], []
    for bot in fused_csp["bottlenecks"]:
        per_conv = []
        for leaf in (bot["conv1"]["fused"], bot["conv2"]):
            w = np.asarray(jax.device_get(leaf["w"]), np.float32)
            b = np.asarray(jax.device_get(leaf["b"]), np.float32)
            wm, wz = _parity_mats(w)
            per_conv.append((wm, wz, np.tile(b, P)))
        wms.append(np.stack([pc[0] for pc in per_conv]))
        wzs.append(np.stack([pc[1] for pc in per_conv]))
        bs.append(np.stack([pc[2] for pc in per_conv]))
    return {"wm": jnp.asarray(np.stack(wms)),
            "wz": jnp.asarray(np.stack(wzs)),
            "b": jnp.asarray(np.stack(bs))}


def _kernel(x_hbm, wm_ref, wz_ref, b_ref, out_ref, scratch, sem, *,
            to: int, n: int, h: int, wq: int, nj: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    step = b * nj + j
    H2 = 2 * n              # halo rows each side (2n chained 3x3 convs)
    R = to + 4 * n          # slab rows

    def dma_op(slot, bb, jj, do):
        def run(src, dst):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start() if do == "start" else d.wait()

        if nj == 1:
            run(x_hbm.at[bb, pl.ds(0, to)], scratch.at[slot, pl.ds(H2, to)])
            return
        first, last = jj == 0, jj == nj - 1

        @pl.when(first)
        def _():
            run(x_hbm.at[bb, pl.ds(0, to + H2)],
                scratch.at[slot, pl.ds(H2, to + H2)])

        @pl.when(last)
        def _():
            run(x_hbm.at[bb, pl.ds(to * jj - H2, to + H2)],
                scratch.at[slot, pl.ds(0, to + H2)])

        @pl.when((~first) & (~last))
        def _():
            run(x_hbm.at[bb, pl.ds(to * jj - H2, R)],
                scratch.at[slot, pl.ds(0, R)])

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

    # halo rows beyond the image are never DMA'd: zero them (conv padding)
    @pl.when(j == 0)
    def _():
        scratch[slot, pl.ds(0, H2)] = jnp.zeros_like(
            scratch[slot, pl.ds(0, H2)])

    @pl.when(j == nj - 1)
    def _():
        scratch[slot, pl.ds(to + H2, H2)] = jnp.zeros_like(
            scratch[slot, pl.ds(to + H2, H2)])

    X = scratch[slot]                                   # (R, wq, 128)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wq, 1), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    f32 = jnp.float32
    dn = (((2,), (0,)), ((), ()))
    base = to * j - H2                                  # global row of X[0]

    cur = X
    off = 0
    for i in range(n):
        res = cur
        for ci in range(2):
            rows = cur.shape[0]
            ro = rows - 2
            # cross-column taps: rolled packed cols with conv zero padding
            rp = jnp.where(col > 0, jnp.roll(cur, 1, axis=1), 0)
            rn = jnp.where(col < wq - 1, jnp.roll(cur, -1, axis=1), 0)
            z = jnp.where(lane < 2 * C, jnp.roll(rp, C, axis=2),
                          jnp.roll(rn, -C, axis=2))
            acc = jnp.zeros((ro, wq, LANES), f32) + b_ref[i, ci]
            for ky in range(3):
                acc = acc + jax.lax.dot_general(
                    cur[ky:ro + ky], wm_ref[i, ci, ky],
                    dimension_numbers=dn, preferred_element_type=f32)
                acc = acc + jax.lax.dot_general(
                    z[ky:ro + ky], wz_ref[i, ci, ky],
                    dimension_numbers=dn, preferred_element_type=f32)
            y = acc * jax.nn.sigmoid(acc)
            off += 1
            # out-of-image rows must be ZERO for the next conv's padding
            # (the unfused graph pads each conv's input tensor, not the
            # slab) — re-zero by global row index.
            g = (jax.lax.broadcasted_iota(jnp.int32, (ro, 1, 1), 0)
                 + base + off)
            y = jnp.where((g >= 0) & (g <= h - 1), y, 0)
            cur = y.astype(X.dtype)
        cur = res[2:2 + cur.shape[0]] + cur             # shortcut add
    out_ref[0] = cur.astype(out_ref.dtype)


def bottleneck_chain(m: jax.Array, weights, *, interpret: bool = False):
    """m (B, H, Wq, 128) p=4-packed 32ch -> same shape: n fused
    (rep3x3 -> conv3x3 -> +residual) bottlenecks with every intermediate
    in VMEM. Requires Wq % 8 == 0 (DMA sublane tiling) and H % TO == 0;
    callers gate and fall back to the XLA packed graph otherwise."""
    B, h, wq, c4 = m.shape
    assert c4 == LANES, c4
    n = weights["wm"].shape[0]
    to = next(t for t in (32, 16, 8, 4) if h % t == 0 and t >= 2 * n)
    nj = h // to
    dtype = m.dtype
    kernel = partial(_kernel, to=to, n=n, h=h, wq=wq, nj=nj)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, h, wq, LANES), dtype),
        grid=(B, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # m (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # wm
            pl.BlockSpec(memory_space=pltpu.VMEM),       # wz
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b
        ],
        out_specs=pl.BlockSpec((1, to, wq, LANES),
                               lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, to + 4 * n, wq, LANES), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(m, weights["wm"].astype(dtype), weights["wz"].astype(dtype),
      weights["b"])


def supports_chain(h: int, wq: int, n: int) -> bool:
    """Static gate: DMA sublane tiling needs Wq % 8 == 0; the row-block
    chooser needs H divisible by a block >= 2n."""
    return (wq % 8 == 0 and n <= 4
            and any(h % t == 0 and t >= 2 * n for t in (32, 16, 8, 4)))
