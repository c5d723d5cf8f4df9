"""Width-packed execution of small-channel RepNCSPELAN4 blocks (inference).

stage1 of every config here (gelan-c/e, yolov9-c: hidden=128, block=64 at
1/4 input resolution) runs its inner convs at 32-64 channels — a quarter
to half of the TPU's 128 vector lanes. XLA stores and streams those
tensors lane-padded and runs the convs at ~15% MXU utilization
(docs/performance.md). This module re-expresses the whole block in a
"width-packed" layout at fuse time:

    (B, H, W, C)  ->  (B, H, W/p, p*C)      p = 2 or 4, so p*C >= 128

which in row-major NHWC is the same byte order (adjacent pixels become
extra lanes). Every conv becomes a dense full-lane conv over the packed
grid with a block-structured kernel built from the fused weights:

- 3x3 convs: 3 packed-width taps, kernel (3, 3, p*C, p*Cout) — p x the
  FLOPs of the original, but on full lanes (measured 2.7x faster at 32ch,
  1.4x at 64ch than the direct lowering on v5e).
- the CSP entry 1x1s (64->32) become stride-2 packed convs that emit the
  p=4 layout directly, so no tensor in the chain ever drops below 128
  lanes (sub-128 intermediates re-introduce lane padding and relayouts —
  a first version that had them measured 11% slower than this one).
- channel splits/concats become lane slices/concats; the fixed lane
  permutations they induce are folded into the next 1x1 conv's packed
  weights, so the packed graph has zero gather/transpose ops.

Whole-chain effect, measured on one v5e chip (batch 32 @160^2, bf16,
scripts/microbench_stage1.py): 12.9 -> 9.2 ms (1.40x), max abs error vs
the direct graph 3.7e-8 at f32.

The transform runs once in `models/fuse.py`; `RepNCSPELAN4.apply` takes
the packed path when packed weights are present and the trace-time width
is divisible by 4 (anchor-grid widths always are under the stride-32
contract; anything else falls back to the regular fused graph).

Reference parity: this is a pure re-association of the same f32-accumulated
sums (reference block: src/yolo/blocks/gelan.py:27-66); equivalence is
pinned by tests/test_blocks.py::test_packed_elan_matches_fused.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict[str, Any]

# the only geometry this scheme supports (== every stage1 in configs/):
# hidden=128 -> ya/yb are 64ch (128 lanes at p=2); block=64 -> inner
# bottleneck convs are 32ch (128 lanes at p=4).
HIDDEN, BLOCK = 128, 64
_HB = BLOCK // 2          # bottleneck width (32)


def supports_packing(cfg) -> bool:
    return (cfg.hidden_channels == HIDDEN and cfg.block_channels == BLOCK)


# ---------------------------------------------------------------------------
# Fuse-time weight transforms (host-side numpy; run once)
# ---------------------------------------------------------------------------

def _pack_same(w: np.ndarray, p: int) -> np.ndarray:
    """(kh, kw, cin, cout) HWIO -> (kh, taps, p*cin, p*cout) packed kernel.

    Output phase q in packed col j is original pixel p*j+q; original width
    tap k reads pixel p*j+q+k-kw//2, i.e. packed col j + tap, phase q_in.
    For kw<=3 and p>=2 taps collapse to {-1,0,+1} (SAME padding: one
    packed col of zero-pixels each side reproduces the original edges).
    """
    kh, kw, cin, cout = w.shape
    half = kw // 2
    taps = 3 if kw > 1 else 1
    wp = np.zeros((kh, taps, p * cin, p * cout), w.dtype)
    for q in range(p):
        for k in range(kw):
            off = q + k - half
            tap = off // p
            q_in = off - tap * p
            wp[:, tap + (1 if kw > 1 else 0),
               q_in * cin:(q_in + 1) * cin,
               q * cout:(q + 1) * cout] += w[:, k]
    return wp


def _pack_downsample(w: np.ndarray, cin: int, cout: int) -> np.ndarray:
    """1x1 conv cin->cout as a p=2 -> p=4 packed conv.

    Input (B,H,W/2,2*cin), window (1,2) stride (1,2) -> (B,H,W/4,4*cout):
    output phase q reads input col-tap q//2, phase q%2.
    """
    wp = np.zeros((1, 2, 2 * cin, 4 * cout), w.dtype)
    for q in range(4):
        t, qi = q // 2, q % 2
        wp[0, t, qi * cin:(qi + 1) * cin, q * cout:(q + 1) * cout] = w[0, 0]
    return wp


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), np.float32)


def build_packed_elan(fused: Params) -> Params:
    """Fused (BN-folded, RepConv-merged) RepNCSPELAN4 params -> packed set.

    Expects the pytree produced by models/fuse.py for this block:
    conv_in/conv1/conv2/conv_out as {"w","b"}, csp1/csp2 with
    conv1/conv2/conv3 {"w","b"} and bottlenecks[i] {"conv1": {"fused":
    {"w","b"}}, "conv2": {"w","b"}}.
    """
    h, b, hb = HIDDEN, BLOCK, _HB

    def wb(p):  # fused leaf -> (np w, np b)
        return _np(p["w"]), _np(p["b"])

    P: Params = {}
    w, bias = wb(fused["conv_in"])
    cin = w.shape[2]
    wp = _pack_same(w, 2)
    # reorder output lanes to [ya_pix0(64) ya_pix1 yb_pix0 yb_pix1] so the
    # two chunk halves are contiguous 128-lane slices of the packed tensor
    order = np.concatenate([np.arange(0, b), np.arange(h, h + b),
                            np.arange(b, h), np.arange(h + b, 2 * h)])
    P["conv_in"] = {"w": wp[:, :, :, order], "b": np.tile(bias, 2)[order]}

    def pack_csp(C):
        out: Params = {}
        for k in ("conv1", "conv2"):
            w_, b_ = wb(C[k])
            out[k] = {"w": _pack_downsample(w_, b, hb), "b": np.tile(b_, 4)}
        bots = []
        for bot in C["bottlenecks"]:
            rw, rb = wb(bot["conv1"]["fused"])
            cw, cb = wb(bot["conv2"])
            bots.append({
                "rep": {"w": _pack_same(rw, 4), "b": np.tile(rb, 4)},
                "conv": {"w": _pack_same(cw, 4), "b": np.tile(cb, 4)},
            })
        out["bottlenecks"] = bots
        # Pallas fused bottleneck chain (ops/pallas/csp_chain_kernel.py):
        # the same (rep -> conv -> +residual) sequence with every
        # intermediate in VMEM; OPT-IN via YOLO_TPU_CSP_CHAIN=1 (isolated
        # 1.08x at n=1 but e2e -0.84% — see _chain_enabled below), else
        # the XLA loop above runs. Weights are always built (cheap; kept
        # so the opt-in needs no re-fuse).
        from yolo_re_tpu.ops.pallas.csp_chain_kernel import (
            build_bottleneck_chain_weights)
        out["chain"] = build_bottleneck_chain_weights(C)
        # conv3 reads concat([m (p=4-packed 32ch), y2 (p=4-packed 32ch)])
        # = 256 lanes [m_q0..q3 | y2_q0..q3]; emits p=4-packed 64ch.
        w3, b3 = wb(C["conv3"])
        w3p = np.zeros((1, 1, 4 * b, 4 * b), w3.dtype)
        for q in range(4):
            w3p[0, 0, q * hb:(q + 1) * hb, q * b:(q + 1) * b] = w3[0, 0, :hb]
            w3p[0, 0, 2 * b + q * hb:2 * b + (q + 1) * hb,
                q * b:(q + 1) * b] = w3[0, 0, hb:]
        out["conv3"] = {"w": w3p, "b": np.tile(b3, 4)}
        return out

    P["csp1"], P["csp2"] = pack_csp(fused["csp1"]), pack_csp(fused["csp2"])
    for k in ("conv1", "conv2"):
        w_, b_ = wb(fused[k])
        P[k] = {"w": _pack_same(w_, 2), "b": np.tile(b_, 2)}

    # conv_out reads concat([ya, yb, y1, y2]) where each part is p=2-packed
    # 64ch; actual lanes are [A_q0 A_q1 B_q0 B_q1 ...], canonical packing
    # of the 256ch concat is [all 256 at q0 | all at q1].
    wo, bo = wb(fused["conv_out"])
    cat = h + 2 * b
    wop = _pack_same(wo, 2)
    actual_to_canon = np.empty(2 * cat, np.int64)
    lane = 0
    for s in range(4):
        for q in range(2):
            for c in range(b):
                actual_to_canon[lane] = q * cat + s * b + c
                lane += 1
    P["conv_out"] = {"w": wop[:, :, actual_to_canon, :], "b": np.tile(bo, 2)}

    return jax.tree_util.tree_map(jnp.asarray, P)


# ---------------------------------------------------------------------------
# Packed apply (eval path)
# ---------------------------------------------------------------------------

def _pconv(x, p, *, stride_w=1):
    """Packed conv + bias + SiLU, f32 accumulation, input-dtype output."""
    w = p["w"]
    kh, kw = w.shape[0], w.shape[1]
    pad_h = kh // 2
    pad_w = 1 if (kw == 3) else 0
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, stride_w),
        ((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32)
    y = y + p["b"].astype(y.dtype)
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _chain_enabled() -> bool:
    # Opt-in (default OFF): the VMEM-fused chain wins in isolation
    # (segment 1.08x at n=1, 1.24x at n=2) but measured e2e NEGATIVE at
    # the full gelan-c/640/b32 step — ABBA 4x4: chain 797.4+-3.5 vs
    # XLA loop 804.2+-2.2 img/s (-0.84%). Same erosion mechanism as the
    # ADown train pair: the pallas_call pins fusion boundaries around
    # the packed convs that XLA otherwise overlaps. Record in
    # docs/performance.md "What lost".
    import os

    return os.environ.get("YOLO_TPU_CSP_CHAIN", "0") == "1"


def _bottlenecks(m: jax.Array, C: Params) -> jax.Array:
    """The CSP bottleneck sequence on the p=4 packed layout: the Pallas
    VMEM-fused chain when the geometry/backend qualify (shard_mapped
    per-device under a mesh), else the per-conv XLA loop."""
    if "chain" in C and _chain_enabled():
        from functools import partial

        from yolo_re_tpu.ops.pallas.csp_chain_kernel import (
            bottleneck_chain,
            supports_chain,
        )
        from yolo_re_tpu.parallel.spmd import (
            pallas_interpret,
            pallas_supported,
            shard_batchwise,
        )
        n = C["chain"]["wm"].shape[0]
        # bf16-gated: the kernel's MXU dots run at default (bf16-operand)
        # precision; the f32 path is the strict-parity path and must keep
        # the packed _pconv's HIGHEST-precision numerics (ops/conv.py).
        if (m.dtype == jnp.bfloat16 and pallas_supported()
                and supports_chain(m.shape[1], m.shape[2], n)):
            return shard_batchwise(
                partial(bottleneck_chain, interpret=pallas_interpret()),
                m, C["chain"])
    r = m
    for bot in C["bottlenecks"]:
        t = _pconv(r, bot["rep"])
        t = _pconv(t, bot["conv"])
        r = r + t                                   # shortcut (32->32)
    return r


def apply_packed_elan(packed: Params, x: jax.Array, out_channels: int):
    """x: (B, H, W, cin) with W % 4 == 0 -> (B, H, W, out_channels).

    If the fuse pass marked this block "emit_packed" (its sole consumer
    runs on the packed layout), the final un-packing reshape is skipped
    and the p=2-packed (B, H, W/2, 2*out_channels) tensor is returned.
    """
    h, b = HIDDEN, BLOCK
    B_, H, W, cin = x.shape
    x2 = x.reshape(B_, H, W // 2, 2 * cin)
    y = _pconv(x2, packed["conv_in"])
    ya, yb = y[..., :2 * b], y[..., 2 * b:]

    def csp(z, C):
        m = _pconv(z, C["conv1"], stride_w=2)      # (B,H,W/4,128) p=4 32ch
        r = _bottlenecks(m, C)
        y2 = _pconv(z, C["conv2"], stride_w=2)
        y3 = _pconv(jnp.concatenate([r, y2], -1), C["conv3"])
        return y3.reshape(B_, H, W // 2, 2 * b)    # p=4 64ch -> p=2 view

    y1 = _pconv(csp(yb, packed["csp1"]), packed["conv1"])
    y2 = _pconv(csp(y1, packed["csp2"]), packed["conv2"])
    cat = jnp.concatenate([ya, yb, y1, y2], -1)
    out = _pconv(cat, packed["conv_out"])
    if "emit_packed" in packed:
        return out                               # (B, H, W/2, 2*out)
    return out.reshape(B_, H, W, out_channels)

