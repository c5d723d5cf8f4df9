"""Train-mode packed stem path: Pallas forward + weight-grad kernels.

The per-layer backward profile (scripts/profile_train.py --per-layer)
puts the two stem convs among the largest train items left after the
packed-ELAN work: stem1 (3->64 k3 s2 @640, reference
src/yolo/blocks/conv.py:55-93 with cin=3) costs 16.35 ms fwd+bwd — 9% of
the step — because XLA's cin=3 conv emitter is far off roofline and its
weight-grad conv alone is ~8 ms (~15x off roofline; the space-to-depth
rewrite of it measured an e2e NEGATIVE at the XLA level, see
docs/performance.md "What lost"). The inference path already solved the
layout problem with the phase-plane Pallas kernel
(ops/pallas/stem_kernel.py); this module extends it to training:

- stem1 forward: the SAME phase-plane kernel minus the fused bias/SiLU
  epilogue (`stem_conv_packed_raw`), emitting the row-paired packed
  pre-BN conv output. The block-diagonal weights are built from the raw
  HWIO kernel IN-TRACE (linear), wrapped in a `jax.custom_vjp`:
  - input grad: the stem input is the image — never differentiated — so
    the backward returns symbolic zeros (DCE'd) and this path must only
    be used for the first layer of the network.
  - weight grad: `stem_wgrad_packed`, two MXU passes over the
    already-materialized phase planes, vs XLA's ~8 ms conv.
- BN1 + SiLU: train BatchNorm directly on the packed layout via the
  phase-folded one-pass moments of ops/packed_elan_train.py (row-paired
  lanes carry (row parity, channel): every raw channel owns exactly two
  equal-count lanes).
- stem2 (64->128 k3 s2): consumes the packed tensor directly as a dense
  (2, 3)-window conv over row pairs (the jnp mirror of
  stem_kernel.pack_next_conv_weights — linear, so plain autodiff yields
  exact raw-weight input/weight grads through the XLA conv) and emits
  ordinary full-lane NHWC at 1/4 resolution. NO relayout anywhere: the
  row-pair dim IS the output row dim.

bf16-only (the f32 path keeps the exact two-pass reference numerics),
first-layer-only, TPU-only in the product path (unit tests drive the
kernels in interpret mode on CPU). Kill switch: YOLO_TPU_STEM_TRAIN=0
(trace-time read, like YOLO_TPU_PACKED_TRAIN).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.ops.conv import _conv_acc_f32
from yolo_re_tpu.ops.packed_elan_train import bn_act_train
from yolo_re_tpu.ops.pallas.stem_kernel import (
    stem_conv_packed_raw,
    stem_wgrad_packed,
    to_phase_planes,
)

__all__ = ["stem1_conv_train", "stem2_conv_from_packed_train",
           "stem_train_enabled"]


def stem_train_enabled() -> bool:
    """Trace-time kill switch for the packed train-mode stem path.

    Mesh-sharded train steps keep the kernel: the pallas_calls are
    shard_mapped over the data axis of the active mesh (parallel/spmd.py)
    with an explicit psum on the weight-grad cotangent, so no GSPMD guard
    is needed (it used to strip this path under any mesh — round-3
    VERDICT Missing #2)."""
    import os

    return os.environ.get("YOLO_TPU_STEM_TRAIN", "1") != "0"


def _pack_w2_jnp(w: jax.Array) -> jax.Array:
    """Raw stem kernel (3, 3, 3, cout) HWIO -> row-pair block-diagonal
    (64, 2*cout) (the traced mirror of build_stem_kernel_weights: linear,
    so autodiff maps the dW2 cotangent back to the raw kernel exactly)."""
    cout = w.shape[-1]
    wp = jnp.zeros((32, cout), w.dtype).at[:27].set(w.reshape(27, cout))
    w2 = jnp.zeros((64, 2 * cout), w.dtype)
    w2 = w2.at[:32, :cout].set(wp)
    w2 = w2.at[32:, cout:].set(wp)
    return w2


def _pack_next_w_jnp(w: jax.Array) -> jax.Array:
    """Raw stem2 kernel (3, 3, cin, cout) -> (2, 3, 2*cin, cout) row-pair
    window kernel (traced mirror of stem_kernel.pack_next_conv_weights)."""
    _, kw, cin, cout = w.shape
    w2 = jnp.zeros((2, kw, 2 * cin, cout), w.dtype)
    w2 = w2.at[0, :, cin:].set(w[0])
    w2 = w2.at[1, :, :cin].set(w[1])
    w2 = w2.at[1, :, cin:].set(w[2])
    return w2


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _stem1_conv(xt, w2, wo, interpret):
    # Under an active mesh the pallas_call runs per-device on the batch
    # shard (shard_map; weights replicated) — no mesh, plain call.
    from yolo_re_tpu.parallel.spmd import shard_batchwise

    return shard_batchwise(
        partial(stem_conv_packed_raw, wo=wo, interpret=interpret), xt, w2)


def _stem1_conv_fwd(xt, w2, wo, interpret):
    return _stem1_conv(xt, w2, wo, interpret), xt


def _stem1_conv_bwd(wo, interpret, xt, g):
    # No input gradient: this op is only valid as the network's FIRST
    # layer (the image is not differentiated); the zeros are dead code
    # the moment nothing asks for dL/dx and XLA removes them.
    # Under a mesh the weight-grad kernel runs per-shard and the replicated
    # weight's cotangent is the explicit psum of the per-device sums —
    # exactly the collective GSPMD inserts for a regular conv weight grad.
    from jax.sharding import PartitionSpec as P

    from yolo_re_tpu.parallel.mesh import DATA_AXIS
    from yolo_re_tpu.parallel.spmd import active_mesh

    mesh = active_mesh()
    if mesh is None or mesh.size == 1:
        dw2 = stem_wgrad_packed(xt, g, interpret=interpret)
    else:
        def wg(xt_, g_):
            return jax.lax.psum(
                stem_wgrad_packed(xt_, g_, interpret=interpret), DATA_AXIS)

        # check_vma=False: see parallel/spmd.shard_batchwise; the psum
        # above makes the P() out genuinely replicated.
        dw2 = jax.shard_map(wg, mesh=mesh,
                            in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                            out_specs=P(), check_vma=False)(xt, g)
    return jnp.zeros(xt.shape, xt.dtype), dw2


_stem1_conv.defvjp(_stem1_conv_fwd, _stem1_conv_bwd)


def stem1_conv_train(cfg, params, stats, x, *, interpret=False):
    """Train-mode stem1 on the packed layout: Pallas conv (custom-VJP
    weight grads, zero input grad) -> phase-folded train BN -> SiLU.
    x (B, H, W, 3) bf16 -> ((B, H/4, W/2, 2*cout) bf16 row-paired packed,
    new BN stats). The consumer detects the packed layout by channel
    count (blocks.Conv.apply), exactly like the fused inference path."""
    cout = cfg.out_channels
    xt = to_phase_planes(x)
    w2 = _pack_w2_jnp(params["w"])
    y = _stem1_conv(xt, w2, x.shape[2] // 2, interpret)
    lane_to_raw = np.tile(np.arange(cout), 2)  # lane 64r + c -> channel c
    return bn_act_train(y, params, stats, lane_to_raw, act=True)


def stem2_conv_from_packed_train(cfg, params, stats, x, *, interpret=False):
    """Train-mode stem2 consuming the row-paired packed stem1 output:
    dense (2, 3)-window conv over row pairs (stride (1, 2), pad
    ((1, 0), (1, 1))) built from the raw weights in-trace, then ordinary
    train BN + SiLU. x (B, H/4, W/2, 2*cin) -> ((B, H/4, W/4, cout) NHWC,
    new BN stats) — plain full-lane NHWC, no relayout."""
    del interpret  # pure XLA
    cout = cfg.out_channels
    w2 = _pack_next_w_jnp(params["w"])
    y = _conv_acc_f32(x, w2.astype(x.dtype), (1, 2), ((1, 0), (1, 1)), 1, 1)
    y = y.astype(jnp.bfloat16)
    return bn_act_train(y, params, stats, np.arange(cout), act=True)
