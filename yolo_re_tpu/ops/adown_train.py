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
tests). The kernels are channel-generic (any C with whole-tile halves,
C % 256 == 0); wide (>256ch) sites additionally need
YOLO_TPU_ADOWN_TRAIN_WIDE=1 — see adown_train_supported.

**OPT-IN (YOLO_TPU_ADOWN_TRAIN=1), measured e2e NEGATIVE with the C=256
sites on**: the isolated down1 f+b A/B is only 1.02x (direct 10.59 ms vs
kernel 10.34, scripts/tpu_validate_adown_train.py STAGE=bench) and the
full train step measures 195.0 +- 0.1 vs 208.4 +- 0.1 img/s — a -6.4%
regression (2x2 ABBA, scripts/ab_bench.py --flip YOLO_TPU_ADOWN_TRAIN=0).
Mechanism: the custom-VJP pair pins its boundaries — nothing upstream or
downstream can fuse across the two pallas_calls, the backward kernel's
window-sum recompute duplicates work XLA shares with neighbouring
fusions, and the saved residual (xp) forces an extra HBM round trip the
XLA graph avoids by fusing the pool backwards into adjacent consumers.
Kept as a recorded experiment (interpret-mode parity + real-Mosaic
compile stay tested); honors the same GSPMD mesh guard as the stem path
(pallas_call has no SPMD partitioning rule).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.ops.packed_elan_train import bn_act_train
from yolo_re_tpu.ops.pallas.adown_kernel import C, adown_from_packed
from yolo_re_tpu.ops.pallas.adown_train_kernel import adown_bwd_from_packed

__all__ = ["apply_adown_train", "adown_train_supported",
           "adown_train_enabled"]


def adown_train_enabled() -> bool:
    """Trace-time OPT-IN switch (default OFF — the kernel pair measured a
    -6.4% e2e regression, see module docstring). Mesh-sharded steps keep
    the kernels via shard_map (parallel/spmd.py), like the stem path."""
    import os

    return os.environ.get("YOLO_TPU_ADOWN_TRAIN") == "1"


def adown_train_supported(cfg, x) -> bool:
    """Shape gate: channel halves must be whole 128-lane tiles (C % 256),
    in == out (every ADown in the configs), H % 4 == 0 (row blocks of
    >= 2 output rows), W % 2 == 0 (packed columns). C=256 (down1 /
    aux_down1 / pan_down1) is on by default — its producer is the packed
    stage1 whose byte-order view cancels; wider ADowns (down2/3,
    pan_down2: plain-NHWC producers, so the packed view is a real
    relayout) are opt-in via YOLO_TPU_ADOWN_TRAIN_WIDE=1 until the e2e
    A/B says otherwise."""
    import os

    if not (cfg.in_channels == cfg.out_channels
            and cfg.in_channels % 256 == 0
            and x.ndim == 4 and x.shape[-1] == cfg.in_channels
            and x.shape[1] % 4 == 0 and x.shape[2] % 2 == 0):
        return False
    if cfg.in_channels != C:
        return os.environ.get("YOLO_TPU_ADOWN_TRAIN_WIDE") == "1"
    return True


def _pack_wk(w1q: jax.Array) -> jax.Array:
    """(3, 3, half, half) scaled raw kernel -> the forward kernel's
    (3, 2, 2*half, half) width-window layout (adown_kernel.
    build_adown_kernel_weights, traced; linear in w1q)."""
    half = w1q.shape[-1]
    wk = jnp.zeros((3, 2, 2 * half, half), w1q.dtype)
    wk = wk.at[:, 0, half:].set(w1q[:, 0])
    wk = wk.at[:, 1, :half].set(w1q[:, 1])
    wk = wk.at[:, 1, half:].set(w1q[:, 2])
    return wk


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _adown_conv(xp, w1, w2, interpret):
    """Pre-BN packed ADown: xp (B, H, Wp, 2C) -> (B, H/2, Wp, C),
    lanes [branch1 | branch2]. w1 (3, 3, C/2, C/2) raw HWIO,
    w2 (1, 1, C/2, C/2) raw. Under an active mesh the pallas_call runs
    per-device on the batch shard (shard_map, parallel/spmd.py)."""
    from yolo_re_tpu.parallel.spmd import shard_batchwise

    def fwd(xp_, wk, w2q):
        z = jnp.zeros((1, w2q.shape[-1]), jnp.float32)
        return adown_from_packed(
            xp_, {"wk": wk, "b1": z, "w2": w2q, "b2": z},
            raw=True, interpret=interpret)

    return shard_batchwise(fwd, xp, _pack_wk(w1 * 0.25), w2[0, 0] * 0.25)


def _adown_conv_fwd(xp, w1, w2, interpret):
    return _adown_conv(xp, w1, w2, interpret), (xp, w1, w2)


def _adown_conv_bwd(interpret, res, g):
    xp, w1, w2 = res
    w1q = (w1 * 0.25).astype(xp.dtype)
    w2q = (w2[0, 0] * 0.25).astype(xp.dtype)
    from jax.sharding import PartitionSpec as P

    from yolo_re_tpu.parallel.mesh import DATA_AXIS
    from yolo_re_tpu.parallel.spmd import active_mesh

    mesh = active_mesh()
    if mesh is None or mesh.size == 1:
        dx, dwq1, dwq2 = adown_bwd_from_packed(xp, g, w1q, w2q,
                                               interpret=interpret)
    else:
        # Per-shard backward kernel; the replicated weights' cotangents
        # are the psum of the per-device sums (see stem_train's bwd).
        def bwd(xp_, g_, w1q_, w2q_):
            dx_, d1, d2 = adown_bwd_from_packed(xp_, g_, w1q_, w2q_,
                                                interpret=interpret)
            return (dx_, jax.lax.psum(d1, DATA_AXIS),
                    jax.lax.psum(d2, DATA_AXIS))

        dx, dwq1, dwq2 = jax.shard_map(
            bwd, mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
            out_specs=(P(DATA_AXIS), P(), P()),
            check_vma=False)(xp, g, w1q, w2q)
    half = w1.shape[-1]
    dw1 = (dwq1.reshape(3, 3, half, half) * 0.25).astype(w1.dtype)
    dw2 = (dwq2[None, None] * 0.25).astype(w2.dtype)
    return dx, dw1, dw2


_adown_conv.defvjp(_adown_conv_fwd, _adown_conv_bwd)


def apply_adown_train(cfg, params, stats, x, *, interpret=False):
    """Train-mode ADown(C, C): packed Pallas conv pair (custom VJP) ->
    one-pass train BN over the concatenated branch params -> SiLU.

    x (B, H, W, C) bf16 NHWC (a free byte-order view re-packs it; when
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
    half = Cin // 2
    out, ns = bn_act_train(y, p_cat, s_cat, np.arange(Cin), act=True)
    new_stats = {
        "conv_stride": {"mean": ns["mean"][:half], "var": ns["var"][:half]},
        "conv_pool": {"mean": ns["mean"][half:], "var": ns["var"][half:]},
    }
    return out, new_stats
