"""Train-mode ADown on the packed layout: Pallas forward + backward pair.

The round-3 per-layer backward profile (scripts/profile_train.py
--per-layer) left down1 — ADown(256, 256) @160², reference
src/yolo/blocks/downsample.py:24-50 — as the largest train item without a
fast path: 13.8 ms fwd+bwd of the 157.7 ms step. Its convs are a rounding
error at roofline (~1.3 ms); the cost is XLA's lowering of the stride-1
avgpool (a ~420 MB materialized tensor, ~2.5x off roofline), the maxpool,
their backwards (pad + reduce_window / select_and_scatter), and the
boundary relayout from the width-packed stage1 producer. The inference
path already fuses all of it in VMEM (ops/pallas/adown_kernel.py,
5.1 -> 2.45 ms); this module extends that kernel to training:

- forward: the SAME packed-input kernel in `raw` mode — pre-BN branch
  outputs, no bias/SiLU — with the packed weights built from the raw HWIO
  kernels IN-TRACE. Consumes the stage1 packed-train output through a
  free byte-order view (reshape∘reshape cancels; no relayout).
- backward: a full Pallas kernel (ops/pallas/adown_train_kernel.py)
  producing dx and both weight grads — window-sum recompute, first-max
  priority masks matching XLA's select_and_scatter tie semantics exactly,
  dS accumulated into row/col-parity planes (no scatters).
- BatchNorm + SiLU run OUTSIDE the kernel on the lane-aligned (…, 256)
  pre-BN tensor with the two branches' BN params concatenated — the
  bf16 one-pass moments of ops/packed_elan_train.bn_act_train (identity
  lane map), running stats split back per branch.

bf16-only (the f32 path keeps the exact two-pass reference numerics),
TPU-only in the product path (interpret mode drives the kernels on CPU in
tests). Gated to the C=256 ADown geometry (down1 / pan_down1 in gelan-c
and yolov9-c; the other ADowns have 256-channel halves and no padding
problem... their pooling still pays, but the kernel is C-specialized).
Kill switch: YOLO_TPU_ADOWN_TRAIN=0. Honors the same GSPMD mesh guard as
the stem path (pallas_call has no SPMD partitioning rule).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.ops.packed_elan_train import bn_act_train
from yolo_re_tpu.ops.pallas.adown_kernel import C, HALF, adown_from_packed
from yolo_re_tpu.ops.pallas.adown_train_kernel import adown_bwd_from_packed

__all__ = ["apply_adown_train", "adown_train_supported",
           "adown_train_enabled"]


def adown_train_enabled() -> bool:
    """Trace-time kill switch + the shared GSPMD mesh guard."""
    import os

    from yolo_re_tpu.ops import stem_train

    if stem_train._MESH_GUARD:
        return False
    return os.environ.get("YOLO_TPU_ADOWN_TRAIN", "1") != "0"


def adown_train_supported(cfg, x) -> bool:
    """Shape gate: the kernel pair is specialized to the C=256 ADown
    (halves 128 = one full lane tile) and needs H % 4 == 0 (row blocks of
    >= 2 output rows), W % 2 == 0 (packed columns)."""
    return (cfg.in_channels == C and cfg.out_channels == C
            and x.ndim == 4 and x.shape[-1] == C
            and x.shape[1] % 4 == 0 and x.shape[2] % 2 == 0)


def _pack_wk(w1q: jax.Array) -> jax.Array:
    """(3, 3, 128, 128) scaled raw kernel -> the forward kernel's
    (3, 2, 256, 128) width-window layout (adown_kernel.
    build_adown_kernel_weights, traced; linear in w1q)."""
    wk = jnp.zeros((3, 2, 2 * HALF, HALF), w1q.dtype)
    wk = wk.at[:, 0, HALF:].set(w1q[:, 0])
    wk = wk.at[:, 1, :HALF].set(w1q[:, 1])
    wk = wk.at[:, 1, HALF:].set(w1q[:, 2])
    return wk


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _adown_conv(xp, w1, w2, interpret):
    """Pre-BN packed ADown: xp (B, H, Wp, 512) -> (B, H/2, Wp, 256)
    bf16, lanes [branch1 | branch2]. w1 (3, 3, 128, 128) raw HWIO,
    w2 (1, 1, 128, 128) raw."""
    w1q = w1 * 0.25
    w2q = w2[0, 0] * 0.25
    z = jnp.zeros((1, HALF), jnp.float32)
    return adown_from_packed(
        xp, {"wk": _pack_wk(w1q), "b1": z, "w2": w2q, "b2": z},
        raw=True, interpret=interpret)


def _adown_conv_fwd(xp, w1, w2, interpret):
    return _adown_conv(xp, w1, w2, interpret), (xp, w1, w2)


def _adown_conv_bwd(interpret, res, g):
    xp, w1, w2 = res
    w1q = (w1 * 0.25).astype(xp.dtype)
    w2q = (w2[0, 0] * 0.25).astype(xp.dtype)
    dx, dwq1, dwq2 = adown_bwd_from_packed(xp, g, w1q, w2q,
                                           interpret=interpret)
    dw1 = (dwq1.reshape(3, 3, HALF, HALF) * 0.25).astype(w1.dtype)
    dw2 = (dwq2[None, None] * 0.25).astype(w2.dtype)
    return dx, dw1, dw2


_adown_conv.defvjp(_adown_conv_fwd, _adown_conv_bwd)


def apply_adown_train(cfg, params, stats, x, *, interpret=False):
    """Train-mode ADown(256, 256): packed Pallas conv pair (custom VJP) ->
    one-pass train BN over the concatenated branch params -> SiLU.

    x (B, H, W, 256) bf16 NHWC (a free byte-order view re-packs it; when
    the producer is the packed train-mode stage1 the two reshapes cancel
    and no relayout happens). Returns (out (B, H/2, W/2, 256) bf16,
    new_stats) with new_stats exactly mirroring ADown.apply's pytree.
    """
    B, H, W, Cin = x.shape
    xp = x.reshape(B, H, W // 2, 2 * Cin)
    y = _adown_conv(xp, params["conv_stride"]["w"], params["conv_pool"]["w"],
                    interpret)
    p_cat = {
        "scale": jnp.concatenate([params["conv_stride"]["scale"],
                                  params["conv_pool"]["scale"]]),
        "bias": jnp.concatenate([params["conv_stride"]["bias"],
                                 params["conv_pool"]["bias"]]),
    }
    s_cat = {
        "mean": jnp.concatenate([stats["conv_stride"]["mean"],
                                 stats["conv_pool"]["mean"]]),
        "var": jnp.concatenate([stats["conv_stride"]["var"],
                                stats["conv_pool"]["var"]]),
    }
    out, ns = bn_act_train(y, p_cat, s_cat, np.arange(C), act=True)
    new_stats = {
        "conv_stride": {"mean": ns["mean"][:HALF], "var": ns["var"][:HALF]},
        "conv_pool": {"mean": ns["mean"][HALF:], "var": ns["var"][HALF:]},
    }
    return out, new_stats
