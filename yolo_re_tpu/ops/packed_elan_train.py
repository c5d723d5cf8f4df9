"""Width-packed TRAIN-mode execution of stage1-geometry RepNCSPELAN4.

The inference packed path (ops/packed_elan.py) re-expresses the block on a
(B, H, W/p, p*C) layout so no tensor drops below 128 lanes — but it needs
BN-folded weights, so training fell back to the direct graph. The round-3
per-layer backward profile (scripts/profile_train.py --per-layer) showed
that fallback costs 73 ms of the 182 ms train step (40%): the 32/64-channel
convs at 160² run at 2-36 TF/s on a 197 TF/s chip because every sub-128-lane
tensor is T(8,128) lane-padded in HBM and quarter-fills the MXU.

This module runs the SAME packed layout with raw (unfused) weights:

- Packed kernels are built from the raw HWIO kernels INSIDE the traced
  function. The packing is linear (slice-scatter of weight blocks), so
  autodiff propagates cotangents straight back to the raw weights — the
  gradients are exactly the packed-conv gradients of the same re-associated
  sums, no custom VJP needed. The per-step packing cost is a handful of
  scatters over <1 MB weight tensors.
- BatchNorm runs in packed space: lane-wise moments over (B, H, W/p) are
  phase-folded to per-raw-channel statistics (each raw channel appears in
  exactly p equal-sized lane blocks, so the average of its p lane means IS
  the batch mean; same for E[x²]). This matches the bf16 train path's
  one-pass moments (ops/conv.py:251-268) up to f32 reduction order —
  which is why the packed path gates on compute dtype bf16: the f32 path
  keeps the two-pass unpacked graph for exact reference parity.
- RepConv runs both raw branches (3x3 + 1x1, each with its own BN) packed,
  summed pre-activation — the reference's training semantics
  (reference: src/yolo/blocks/conv.py:109-145).

The returned new-stats pytree is structurally identical to the direct
path's, so Trainer/EMA/checkpointing see no difference.

Measured (one v5e chip, gelan-c stage1 shapes, batch 32 @160², bf16,
scripts/tpu_probe_train_stage1.py): single 3x3 64->64 fwd+bwd 4.99->3.63 ms
packed; see docs/performance.md for the whole-block and end-to-end numbers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from yolo_re_tpu.ops.conv import BN_EPS, BN_MOMENTUM, _conv_acc_f32
from yolo_re_tpu.ops.packed_elan import BLOCK, HIDDEN, _HB, supports_packing

Params = dict[str, Any]

__all__ = ["apply_packed_elan_train", "supports_packing"]


def _conv_f32(x, w, strides, padding):
    """bf16 conv with f32 accumulation/output, differentiable — the
    shared custom-VJP conv (ops/conv.py:_conv_acc_f32, which accepts the
    packed path's asymmetric (1, stride_w) strides as tuples)."""
    return _conv_acc_f32(x, w, strides, padding, 1, 1)


# ---------------------------------------------------------------------------
# In-trace kernel packing (jnp mirrors of packed_elan's fuse-time numpy)
# ---------------------------------------------------------------------------

def _pack_same_jnp(w: jax.Array, p: int) -> jax.Array:
    """Raw (kh, kw, cin, cout) kernel -> (kh, taps, p*cin, p*cout) packed
    kernel, same math as packed_elan._pack_same but traced (linear in w)."""
    kh, kw, cin, cout = w.shape
    half = kw // 2
    taps = 3 if kw > 1 else 1
    wp = jnp.zeros((kh, taps, p * cin, p * cout), w.dtype)
    for q in range(p):
        for k in range(kw):
            off = q + k - half
            tap = off // p
            q_in = off - tap * p
            wp = wp.at[:, tap + (1 if kw > 1 else 0),
                       q_in * cin:(q_in + 1) * cin,
                       q * cout:(q + 1) * cout].add(w[:, k])
    return wp


def _pack_downsample_jnp(w: jax.Array, cin: int, cout: int) -> jax.Array:
    """Raw 1x1 kernel -> p=2 -> p=4 packed stride-2 conv kernel
    (packed_elan._pack_downsample, traced)."""
    wp = jnp.zeros((1, 2, 2 * cin, 4 * cout), w.dtype)
    for q in range(4):
        t, qi = q // 2, q % 2
        wp = wp.at[0, t, qi * cin:(qi + 1) * cin,
                   q * cout:(q + 1) * cout].set(w[0, 0])
    return wp


# ---------------------------------------------------------------------------
# Packed conv + train-mode BN (+ optional SiLU)
# ---------------------------------------------------------------------------

def bn_act_train(y, p_raw, stats, lane_to_raw, *, act=True):
    """Train BatchNorm on a lane-packed bf16 tensor (phase-folded batch
    stats) -> optional SiLU.

    y: (B, H, Wp, lanes) bf16 pre-BN activations where packed lane l
    carries raw channel lane_to_raw[l] and every raw channel appears
    lanes/C times with equal pixel counts; p_raw: raw {"scale","bias"};
    stats: raw {"mean","var"}. Returns (bf16 activations, running-stat
    update) with the exact update formula of ops/conv.py:conv_bn_act
    (bf16 one-pass moments with f32 accumulators)."""
    lanes = y.shape[-1]
    C = p_raw["scale"].shape[0]
    phases = lanes // C
    yf = y.astype(jnp.float32)
    lane_mean = jnp.mean(yf, axis=(0, 1, 2))
    lane_sq = jnp.mean(jnp.square(yf), axis=(0, 1, 2))
    # phase-fold: every raw channel owns `phases` equal-count lanes
    mean = jnp.zeros((C,), jnp.float32).at[lane_to_raw].add(lane_mean) / phases
    meansq = jnp.zeros((C,), jnp.float32).at[lane_to_raw].add(lane_sq) / phases
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)

    n = y.shape[0] * y.shape[1] * y.shape[2] * phases
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": (1.0 - BN_MOMENTUM) * stats["mean"] + BN_MOMENTUM * mean,
        "var": (1.0 - BN_MOMENTUM) * stats["var"] + BN_MOMENTUM * unbiased,
    }

    inv = lax.rsqrt(var + BN_EPS) * p_raw["scale"]
    shift = p_raw["bias"] - mean * inv
    y = y * inv[lane_to_raw].astype(y.dtype) + shift[lane_to_raw].astype(y.dtype)
    if act:
        y = y * jax.nn.sigmoid(y)
    return y.astype(jnp.bfloat16), new_stats


def _pconv_bn(x, wp, p_raw, stats, lane_to_raw, *, stride_w=1, act=True):
    """Packed conv -> train BatchNorm (phase-folded stats) -> SiLU.

    wp: packed kernel; p_raw: raw {"w","scale","bias"} (only scale/bias
    used here); lane_to_raw: static (lanes,) int map from packed output
    lane to raw channel (every raw channel appears lanes/C times).
    Returns (bf16 activations, {"mean","var"} running-stat update) with
    the exact update formula of ops/conv.py:conv_bn_act.
    """
    kh, kw = wp.shape[0], wp.shape[1]
    pad_h = kh // 2
    pad_w = 1 if (kw == 3) else 0
    y = _conv_f32(x, wp.astype(x.dtype), (1, stride_w),
                  ((pad_h, pad_h), (pad_w, pad_w)))
    y = y.astype(jnp.bfloat16)
    return bn_act_train(y, p_raw, stats, lane_to_raw, act=act)


def _canon(p: int, c: int) -> np.ndarray:
    """lane -> raw channel for canonical [q0-block | q1-block | ...]."""
    return np.tile(np.arange(c), p)


# ---------------------------------------------------------------------------
# The packed train-mode block
# ---------------------------------------------------------------------------

def apply_packed_elan_train(cfg, params: Params, stats: Params, x: jax.Array):
    """Train-mode RepNCSPELAN4 on the width-packed layout.

    x: (B, H, W, cin) bf16 with W % 4 == 0 and stage1 geometry
    (hidden=128, block=64 — supports_packing). Returns
    (out (B,H,W,out_channels) bf16, new_stats) with new_stats exactly
    mirroring RepNCSPELAN4.apply's pytree.
    """
    h, b, hb = HIDDEN, BLOCK, _HB
    B_, H, W, cin = x.shape
    x2 = x.reshape(B_, H, W // 2, 2 * cin)

    # conv_in with output lanes reordered to [ya_q0 ya_q1 yb_q0 yb_q1] so
    # the chunk halves are contiguous 128-lane slices (packed_elan's trick)
    w_in = _pack_same_jnp(params["conv_in"]["w"], 2)
    order = np.concatenate([np.arange(0, b), np.arange(h, h + b),
                            np.arange(b, h), np.arange(h + b, 2 * h)])
    lane_in = order % h  # raw channel of each reordered packed lane
    y, ns_conv_in = _pconv_bn(x2, w_in[:, :, :, order], params["conv_in"],
                              stats["conv_in"], lane_in)
    ya, yb = y[..., :2 * b], y[..., 2 * b:]

    c4_32, c4_64 = _canon(4, hb), _canon(4, b)

    def csp(z, P, S):
        ns: Params = {}
        m, ns["conv1"] = _pconv_bn(
            z, _pack_downsample_jnp(P["conv1"]["w"], b, hb),
            P["conv1"], S["conv1"], c4_32, stride_w=2)
        r = m
        nbots = []
        for pb, sb in zip(P["bottlenecks"], S["bottlenecks"]):
            nb: Params = {}
            # RepConv: 3x3 + 1x1 branches, own BNs, sum pre-SiLU
            rp, rs = pb["conv1"], sb["conv1"]
            t1, s1 = _pconv_bn(r, _pack_same_jnp(rp["conv1"]["w"], 4),
                               rp["conv1"], rs["conv1"], c4_32, act=False)
            t2, s2 = _pconv_bn(r, _pack_same_jnp(rp["conv2"]["w"], 4),
                               rp["conv2"], rs["conv2"], c4_32, act=False)
            t = t1 + t2
            t = (t * jax.nn.sigmoid(t)).astype(jnp.bfloat16)
            nb["conv1"] = {"conv1": s1, "conv2": s2}
            t, nb["conv2"] = _pconv_bn(t, _pack_same_jnp(pb["conv2"]["w"], 4),
                                       pb["conv2"], sb["conv2"], c4_32)
            r = r + t  # shortcut (in == out == 32)
            nbots.append(nb)
        ns["bottlenecks"] = nbots
        y2, ns["conv2"] = _pconv_bn(
            z, _pack_downsample_jnp(P["conv2"]["w"], b, hb),
            P["conv2"], S["conv2"], c4_32, stride_w=2)
        # conv3 reads concat[r (p4 32ch) | y2 (p4 32ch)] = 256 lanes
        w3 = P["conv3"]["w"]
        w3p = jnp.zeros((1, 1, 4 * b, 4 * b), w3.dtype)
        for q in range(4):
            w3p = w3p.at[0, 0, q * hb:(q + 1) * hb,
                         q * b:(q + 1) * b].set(w3[0, 0, :hb])
            w3p = w3p.at[0, 0, 2 * b + q * hb:2 * b + (q + 1) * hb,
                         q * b:(q + 1) * b].set(w3[0, 0, hb:])
        y3, ns["conv3"] = _pconv_bn(jnp.concatenate([r, y2], -1), w3p,
                                    P["conv3"], S["conv3"], c4_64)
        return y3.reshape(B_, H, W // 2, 2 * b), ns  # p=4 64ch -> p=2 view

    ns_all: Params = {"conv_in": ns_conv_in}
    c2_64 = _canon(2, b)
    y1c, ns_all["csp1"] = csp(yb, params["csp1"], stats["csp1"])
    y1, ns_all["conv1"] = _pconv_bn(
        y1c, _pack_same_jnp(params["conv1"]["w"], 2),
        params["conv1"], stats["conv1"], c2_64)
    y2c, ns_all["csp2"] = csp(y1, params["csp2"], stats["csp2"])
    y2, ns_all["conv2"] = _pconv_bn(
        y2c, _pack_same_jnp(params["conv2"]["w"], 2),
        params["conv2"], stats["conv2"], c2_64)

    # conv_out reads concat[ya yb y1 y2] with each part p=2-packed:
    # permute the canonical packed input lanes to the actual layout
    cat = jnp.concatenate([ya, yb, y1, y2], -1)
    catc = h + 2 * b
    wo = _pack_same_jnp(params["conv_out"]["w"], 2)
    actual_to_canon = np.empty(2 * catc, np.int64)
    lane = 0
    for s in range(4):
        for q in range(2):
            for c in range(b):
                actual_to_canon[lane] = q * catc + s * b + c
                lane += 1
    out_c = cfg.out_channels
    out, ns_all["conv_out"] = _pconv_bn(
        cat, wo[:, :, actual_to_canon, :], params["conv_out"],
        stats["conv_out"], _canon(2, out_c))
    return out.reshape(B_, H, W, out_c), ns_all
