"""GELAN / YOLOv9 building blocks, TPU-native.

Every block is a pure (init, apply) pair over nested dict pytrees:

    params, stats = Block.init(key, cfg)
    y, new_stats = Block.apply(cfg, params, stats, x, train=...)

``params`` holds trainable leaves, ``stats`` the BatchNorm running
statistics (updated functionally in train mode, passed through untouched in
eval). Layout is NHWC everywhere. Multi-input blocks (Concat, CBFuse)
receive a list as ``x``.

Block inventory and semantics mirror the reference one-for-one
(reference: src/yolo/blocks/*.py — Conv, RepConv, RepNBottleneck, RepNCSP,
RepNCSPELAN4, SPPELAN, ADown, CBLinear, CBFuse, Concat, Silence), with each
cited at its class. The architecture is theirs; the computation is built for
XLA: static shapes, f32 accumulation, channel-minor layout, BN foldable for
inference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from yolo_re_tpu.ops.conv import (
    autopad,
    avg_pool2d,
    conv_bn_act,
    conv2d,
    fold_conv_bn,
    init_conv_bn,
    init_conv_kernel,
    interpolate_nearest,
    max_pool2d,
    upsample_nearest,
)

Params = dict[str, Any]


def _packed_train_enabled(cfg) -> bool:
    """Gate for the width-packed train path: stage1 geometry only, with a
    kill switch (YOLO_TPU_PACKED_TRAIN=0, read at trace time — changing it
    after a train step compiled has no effect on that cache entry)."""
    import os

    if os.environ.get("YOLO_TPU_PACKED_TRAIN", "1") == "0":
        return False
    from yolo_re_tpu.ops.packed_elan import supports_packing
    return supports_packing(cfg)


# ---------------------------------------------------------------------------
# Conv
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ConvConfig:
    in_channels: int
    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int | None = None
    groups: int = 1
    dilation: int = 1
    activation: str = "silu"


class Conv:
    """Conv2d(bias=False) + BN(eps=1e-3, mom=0.03) + act.

    Reference: src/yolo/blocks/conv.py:55-93.
    """

    Config = ConvConfig

    @staticmethod
    def init(key, cfg: ConvConfig):
        params, stats = init_conv_bn(
            key, cfg.in_channels, cfg.out_channels, cfg.kernel_size, cfg.groups)
        return params, stats

    @staticmethod
    def apply(cfg: ConvConfig, params, stats, x, *, train=False):
        from yolo_re_tpu.parallel.spmd import (
            pallas_interpret,
            pallas_supported,
            per_device_batch,
        )

        if (train and x.dtype == jnp.bfloat16
                and cfg.in_channels == 3 and cfg.kernel_size == 3
                and cfg.stride == 2 and cfg.groups == 1
                and cfg.dilation == 1 and cfg.padding in (None, 1)
                and cfg.activation == "silu"
                and cfg.out_channels % 64 == 0
                and pallas_supported()
                # batch gate reads the PER-DEVICE shard under a mesh (the
                # win is decided by what each chip sees, not the global
                # batch); the kernel itself is shard_mapped in stem_train.
                and (per_device_batch(x.shape[0]) or 65) <= 64
                and x.shape[1] % 4 == 0
                and x.shape[2] % 2 == 0):
            from yolo_re_tpu.ops.stem_train import (
                stem1_conv_train,
                stem_train_enabled,
            )
            if stem_train_enabled():
                # Train-mode Pallas stem (ops/stem_train.py): phase-plane
                # forward + 2-MXU-pass weight grad (XLA's weight-grad conv
                # for the cin=3 s2 stem is ~8 ms, ~15x off roofline), BN on
                # the packed layout. First-layer-only (returns zero input
                # grads); the consumer detects the row-paired packed
                # layout by channel count below, like the fused path.
                # bf16-only; same batch <= 64 emitter gate as inference.
                # out_channels % 64: the packed output needs whole
                # 128-lane tiles — gelan-e's 80ch stem (160 lanes)
                # measured 92.9 -> 88.6 img/s with the kernel and is
                # gated back to XLA.
                return stem1_conv_train(cfg, params, stats, x,
                                        interpret=pallas_interpret())
        if (train and x.dtype == jnp.bfloat16
                and x.shape[-1] == 2 * cfg.in_channels
                and cfg.kernel_size == 3 and cfg.stride == 2
                and cfg.groups == 1 and cfg.dilation == 1
                and cfg.padding in (None, 1) and cfg.activation == "silu"):
            from yolo_re_tpu.ops.stem_train import (
                stem2_conv_from_packed_train,
                stem_train_enabled,
            )
            # Only the train-mode stem1 kernel produces the row-paired
            # 2*cin layout, and it only engages while stem_train_enabled()
            # — gate symmetrically so YOLO_TPU_STEM_TRAIN=0 (and the mesh
            # guard) kill the consumer too, and a miswired hand-built
            # config whose channel count merely coincides fails loudly in
            # the regular conv instead of being silently reinterpreted.
            if stem_train_enabled():
                return stem2_conv_from_packed_train(cfg, params, stats, x)
        if not train and "pallas_stem" in params:
            # Fused stem fast path (models/fuse.py post-pass): emit the
            # row-paired packed layout the Pallas kernel produces —
            # ops/pallas/stem_kernel.py. TPU only; elsewhere fall through
            # to the regular graph (consumer detects layout by shape).
            # Measured gate (v5e): XLA's cin=3 conv emitter reaches
            # roofline at batch >= ~128 (5.05 ms vs the kernel's 11.2 at
            # batch 128/640px; e2e 885 vs 926 img/s) — take the kernel
            # only at batch <= 64. At 320px the kernel itself is neutral
            # (1.29 vs 1.27 ms) but the packed stem2 still wins, so no
            # size gate (e2e 320px: 2607 on vs 2561 off). Batch gate reads
            # the per-device shard; the kernel is shard_mapped under a mesh.
            if (pallas_supported() and x.shape[1] % 4 == 0
                    and x.shape[2] % 2 == 0
                    and (per_device_batch(x.shape[0]) or 65) <= 64):
                from yolo_re_tpu.ops.pallas.stem_kernel import (
                    stem_conv_packed,
                )
                from yolo_re_tpu.parallel.spmd import shard_batchwise

                return shard_batchwise(
                    partial(stem_conv_packed, interpret=pallas_interpret()),
                    x, params["pallas_stem"]), stats
        if (not train and "packed_rows" in params
                and x.shape[-1] == 2 * cfg.in_channels):
            # Consume the stem kernel's row-paired packed output: the
            # k3 s2 conv becomes a dense (2,3)-window conv over row
            # pairs (ops/pallas/stem_kernel.py:pack_next_conv_weights).
            from yolo_re_tpu.ops.stem_packed import next_conv_from_packed
            return next_conv_from_packed(x, params["packed_rows"],
                                         cfg.activation), stats
        return conv_bn_act(
            params, stats, x,
            stride=cfg.stride,
            padding=autopad(cfg.kernel_size, cfg.padding, cfg.dilation),
            groups=cfg.groups,
            dilation=cfg.dilation,
            act=cfg.activation,
            train=train,
        )

    @staticmethod
    def fuse(cfg: ConvConfig, params, stats):
        return fold_conv_bn(params, stats), {}


# ---------------------------------------------------------------------------
# RepConv
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RepConvConfig:
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    activation: str = "silu"


class RepConv:
    """Parallel 3x3 + 1x1 conv branches summed pre-activation.

    Reference: src/yolo/blocks/conv.py:109-145. At inference the two folded
    branches collapse into a single 3x3 conv (`fuse`) — the
    re-parameterization the reference never implements (SURVEY §2.4.8).
    """

    Config = RepConvConfig

    @staticmethod
    def init(key, cfg: RepConvConfig):
        assert cfg.kernel_size == 3 and cfg.padding == 1, \
            "RepConv only supports 3x3 kernels"
        k1, k2 = jax.random.split(key)
        p1, s1 = init_conv_bn(k1, cfg.in_channels, cfg.out_channels, 3, cfg.groups)
        p2, s2 = init_conv_bn(k2, cfg.in_channels, cfg.out_channels, 1, cfg.groups)
        return {"conv1": p1, "conv2": p2}, {"conv1": s1, "conv2": s2}

    @staticmethod
    def apply(cfg: RepConvConfig, params, stats, x, *, train=False):
        if "fused" in params:
            y = conv2d(x, params["fused"]["w"], stride=cfg.stride, padding=1,
                       groups=cfg.groups)
            y = y + params["fused"]["b"].astype(y.dtype)
            from yolo_re_tpu.ops.conv import get_activation
            return get_activation(cfg.activation)(y).astype(x.dtype), stats
        y1, s1 = conv_bn_act(params["conv1"], stats["conv1"], x,
                             stride=cfg.stride, padding=1, groups=cfg.groups,
                             act="none", train=train)
        y2, s2 = conv_bn_act(params["conv2"], stats["conv2"], x,
                             stride=cfg.stride, padding=0, groups=cfg.groups,
                             act="none", train=train)
        from yolo_re_tpu.ops.conv import get_activation
        return get_activation(cfg.activation)(y1 + y2), {"conv1": s1, "conv2": s2}

    @staticmethod
    def fuse(cfg: RepConvConfig, params, stats):
        """Fold both branches' BN, pad the 1x1 to 3x3, sum -> single conv."""
        f1 = fold_conv_bn(params["conv1"], stats["conv1"])
        f2 = fold_conv_bn(params["conv2"], stats["conv2"])
        w2 = jnp.pad(f2["w"], ((1, 1), (1, 1), (0, 0), (0, 0)))
        return {"fused": {"w": f1["w"] + w2, "b": f1["b"] + f2["b"]}}, {}


# ---------------------------------------------------------------------------
# RepNBottleneck
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RepNBottleneckConfig:
    in_channels: int
    out_channels: int
    shortcut: bool = True
    groups: int = 1
    kernel_sizes: tuple[int, int] = (3, 3)
    expansion_ratio: float = 0.5


class RepNBottleneck:
    """RepConv -> Conv with optional residual (reference:
    src/yolo/blocks/bottleneck.py:26-55)."""

    Config = RepNBottleneckConfig

    @staticmethod
    def _sub(cfg: RepNBottleneckConfig):
        hidden = int(cfg.out_channels * cfg.expansion_ratio)
        c1 = RepConvConfig(cfg.in_channels, hidden, cfg.kernel_sizes[0], 1)
        c2 = ConvConfig(hidden, cfg.out_channels, cfg.kernel_sizes[1], 1,
                        groups=cfg.groups)
        return c1, c2

    @staticmethod
    def init(key, cfg: RepNBottleneckConfig):
        c1, c2 = RepNBottleneck._sub(cfg)
        k1, k2 = jax.random.split(key)
        p1, s1 = RepConv.init(k1, c1)
        p2, s2 = Conv.init(k2, c2)
        return {"conv1": p1, "conv2": p2}, {"conv1": s1, "conv2": s2}

    @staticmethod
    def apply(cfg: RepNBottleneckConfig, params, stats, x, *, train=False):
        c1, c2 = RepNBottleneck._sub(cfg)
        y, s1 = RepConv.apply(c1, params["conv1"], stats["conv1"], x, train=train)
        y, s2 = Conv.apply(c2, params["conv2"], stats["conv2"], y, train=train)
        if cfg.shortcut and cfg.in_channels == cfg.out_channels:
            y = x + y
        return y, {"conv1": s1, "conv2": s2}


# ---------------------------------------------------------------------------
# RepNCSP
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RepNCSPConfig:
    in_channels: int
    out_channels: int
    num_repeats: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion_ratio: float = 0.5


class RepNCSP:
    """CSP bottleneck with RepNBottleneck inner blocks (reference:
    src/yolo/blocks/csp.py:28-64)."""

    Config = RepNCSPConfig

    @staticmethod
    def _sub(cfg: RepNCSPConfig):
        hidden = int(cfg.out_channels * cfg.expansion_ratio)
        return (
            ConvConfig(cfg.in_channels, hidden, 1, 1),
            ConvConfig(cfg.in_channels, hidden, 1, 1),
            ConvConfig(2 * hidden, cfg.out_channels, 1),
            RepNBottleneckConfig(hidden, hidden, cfg.shortcut, cfg.groups,
                                 expansion_ratio=1.0),
        )

    @staticmethod
    def init(key, cfg: RepNCSPConfig):
        c1, c2, c3, cb = RepNCSP._sub(cfg)
        keys = jax.random.split(key, 3 + cfg.num_repeats)
        p1, s1 = Conv.init(keys[0], c1)
        p2, s2 = Conv.init(keys[1], c2)
        p3, s3 = Conv.init(keys[2], c3)
        pbs, sbs = [], []
        for i in range(cfg.num_repeats):
            pb, sb = RepNBottleneck.init(keys[3 + i], cb)
            pbs.append(pb)
            sbs.append(sb)
        return (
            {"conv1": p1, "conv2": p2, "conv3": p3, "bottlenecks": pbs},
            {"conv1": s1, "conv2": s2, "conv3": s3, "bottlenecks": sbs},
        )

    @staticmethod
    def apply(cfg: RepNCSPConfig, params, stats, x, *, train=False):
        # NOTE: a p=2 width-packed rewrite of this block's 64ch interior
        # (stage2/fpn2 geometry) was built, tested, and 2x2-A/B-measured
        # as an end-to-end NEGATIVE both ways (train 202.8 -> 201.4 img/s,
        # inference 804 -> 769) despite a 1.34x isolated fwd+bwd win —
        # the NHWC<->packed boundary reshapes are real T(8,128) tile
        # relayouts in context. See docs/performance.md "What lost" and
        # scripts/tpu_probe_train_stage1.py STAGE=csp.
        c1, c2, c3, cb = RepNCSP._sub(cfg)
        y1, s1 = Conv.apply(c1, params["conv1"], stats["conv1"], x, train=train)
        sbs = []
        for pb, sb in zip(params["bottlenecks"], stats["bottlenecks"]):
            y1, nsb = RepNBottleneck.apply(cb, pb, sb, y1, train=train)
            sbs.append(nsb)
        y2, s2 = Conv.apply(c2, params["conv2"], stats["conv2"], x, train=train)
        y, s3 = Conv.apply(c3, params["conv3"], stats["conv3"],
                           jnp.concatenate([y1, y2], axis=-1), train=train)
        return y, {"conv1": s1, "conv2": s2, "conv3": s3, "bottlenecks": sbs}


# ---------------------------------------------------------------------------
# RepNCSPELAN4
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RepNCSPELAN4Config:
    in_channels: int
    out_channels: int
    hidden_channels: int
    block_channels: int
    num_repeats: int = 1


class RepNCSPELAN4:
    """The GELAN workhorse: split, two CSP+conv branches, 4-way concat.

    Reference: src/yolo/blocks/gelan.py:27-66.
    """

    Config = RepNCSPELAN4Config

    @staticmethod
    def _sub(cfg: RepNCSPELAN4Config):
        h, b = cfg.hidden_channels, cfg.block_channels
        return (
            ConvConfig(cfg.in_channels, h, 1, 1),
            RepNCSPConfig(h // 2, b, cfg.num_repeats),
            ConvConfig(b, b, 3, 1),
            RepNCSPConfig(b, b, cfg.num_repeats),
            ConvConfig(b, b, 3, 1),
            ConvConfig(h + 2 * b, cfg.out_channels, 1, 1),
        )

    @staticmethod
    def init(key, cfg: RepNCSPELAN4Config):
        cin, csp1, cv1, csp2, cv2, cout = RepNCSPELAN4._sub(cfg)
        keys = jax.random.split(key, 6)
        names_cfgs = [("conv_in", Conv, cin), ("csp1", RepNCSP, csp1),
                      ("conv1", Conv, cv1), ("csp2", RepNCSP, csp2),
                      ("conv2", Conv, cv2), ("conv_out", Conv, cout)]
        params, stats = {}, {}
        for k, (name, cls, c) in zip(keys, names_cfgs):
            params[name], stats[name] = cls.init(k, c)
        return params, stats

    @staticmethod
    def apply(cfg: RepNCSPELAN4Config, params, stats, x, *, train=False):
        if (train and x.dtype == jnp.bfloat16 and x.shape[2] % 4 == 0
                and _packed_train_enabled(cfg)):
            # Width-packed TRAIN path (round 3): the direct graph runs this
            # block's 32/64-ch convs at 2-36 TF/s — 40% of the whole train
            # step (scripts/profile_train.py --per-layer). Packed kernels
            # are built from the raw weights in-trace, so autodiff returns
            # exact raw-weight grads; BN stats phase-fold to the raw
            # channels. bf16-only: the f32 path keeps two-pass reference
            # numerics (see ops/packed_elan_train.py).
            from yolo_re_tpu.ops.packed_elan_train import (
                apply_packed_elan_train)
            return apply_packed_elan_train(cfg, params, stats, x)
        if not train and "packed" in params and x.shape[2] % 4 == 0:
            # Width-packed fused path (built in models/fuse.py when the
            # block geometry qualifies — see ops/packed_elan.py). Batch
            # scaling note: the win is large at batch 32 (+23 img/s e2e)
            # and washes out at batch 128 (917.5 gated-off vs 917.7 on —
            # the direct lowering's utilization catches up), so the path
            # stays on unconditionally.
            from yolo_re_tpu.ops.packed_elan import apply_packed_elan
            return apply_packed_elan(params["packed"], x,
                                     cfg.out_channels), stats
        cin, csp1, cv1, csp2, cv2, cout = RepNCSPELAN4._sub(cfg)
        ns = {}
        y, ns["conv_in"] = Conv.apply(cin, params["conv_in"], stats["conv_in"],
                                      x, train=train)
        half = cfg.hidden_channels // 2
        ya, yb = y[..., :half], y[..., half:]
        y1, ns["csp1"] = RepNCSP.apply(csp1, params["csp1"], stats["csp1"],
                                       yb, train=train)
        y1, ns["conv1"] = Conv.apply(cv1, params["conv1"], stats["conv1"],
                                     y1, train=train)
        y2, ns["csp2"] = RepNCSP.apply(csp2, params["csp2"], stats["csp2"],
                                       y1, train=train)
        y2, ns["conv2"] = Conv.apply(cv2, params["conv2"], stats["conv2"],
                                     y2, train=train)
        cat = jnp.concatenate([ya, yb, y1, y2], axis=-1)
        out, ns["conv_out"] = Conv.apply(cout, params["conv_out"],
                                         stats["conv_out"], cat, train=train)
        return out, ns


# ---------------------------------------------------------------------------
# SPPELAN
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SPPELANConfig:
    in_channels: int
    out_channels: int
    hidden_channels: int


class SPPELAN:
    """Spatial pyramid pooling: 3 chained MaxPool(5,1,2) + 4-way concat.

    Reference: src/yolo/blocks/sppelan.py:24-52.
    """

    Config = SPPELANConfig

    @staticmethod
    def _sub(cfg: SPPELANConfig):
        return (
            ConvConfig(cfg.in_channels, cfg.hidden_channels, 1, 1),
            ConvConfig(4 * cfg.hidden_channels, cfg.out_channels, 1, 1),
        )

    @staticmethod
    def init(key, cfg: SPPELANConfig):
        cin, cout = SPPELAN._sub(cfg)
        k1, k2 = jax.random.split(key)
        p1, s1 = Conv.init(k1, cin)
        p2, s2 = Conv.init(k2, cout)
        return {"conv_in": p1, "conv_out": p2}, {"conv_in": s1, "conv_out": s2}

    @staticmethod
    def apply(cfg: SPPELANConfig, params, stats, x, *, train=False):
        cin, cout = SPPELAN._sub(cfg)
        y0, s1 = Conv.apply(cin, params["conv_in"], stats["conv_in"], x, train=train)
        y1 = max_pool2d(y0, 5, 1, 2)
        y2 = max_pool2d(y1, 5, 1, 2)
        y3 = max_pool2d(y2, 5, 1, 2)
        cat = jnp.concatenate([y0, y1, y2, y3], axis=-1)
        out, s2 = Conv.apply(cout, params["conv_out"], stats["conv_out"],
                             cat, train=train)
        return out, {"conv_in": s1, "conv_out": s2}


# ---------------------------------------------------------------------------
# ADown
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ADownConfig:
    in_channels: int
    out_channels: int


class ADown:
    """Stride-2 downsample: avgpool -> split -> (3x3 s2 conv | maxpool+1x1).

    Reference: src/yolo/blocks/downsample.py:24-50.
    """

    Config = ADownConfig

    @staticmethod
    def _sub(cfg: ADownConfig):
        half_out = cfg.out_channels // 2
        return (
            ConvConfig(cfg.in_channels // 2, half_out, 3, 2, 1),
            ConvConfig(cfg.in_channels // 2, half_out, 1, 1, 0),
        )

    @staticmethod
    def init(key, cfg: ADownConfig):
        cs, cp = ADown._sub(cfg)
        k1, k2 = jax.random.split(key)
        p1, s1 = Conv.init(k1, cs)
        p2, s2 = Conv.init(k2, cp)
        return ({"conv_stride": p1, "conv_pool": p2},
                {"conv_stride": s1, "conv_pool": s2})

    @staticmethod
    def apply(cfg: ADownConfig, params, stats, x, *, train=False):
        if (train and x.dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"):
            from yolo_re_tpu.ops.adown_train import (
                adown_train_enabled,
                adown_train_supported,
                apply_adown_train,
            )
            if adown_train_supported(cfg, x) and adown_train_enabled():
                # Train-mode Pallas ADown pair (ops/adown_train.py):
                # OPT-IN via YOLO_TPU_ADOWN_TRAIN=1 — isolated f+b only
                # 1.02x and the full step measured 195.0 vs 208.4 img/s
                # (-6.4%, 2x2 ABBA): the custom-VJP boundary blocks the
                # fusions XLA builds around the direct pooling graph.
                return apply_adown_train(cfg, params, stats, x)
        if (not train and "pallas" in params
                and x.shape[-1] == 2 * cfg.in_channels):
            # Producer emitted the width-packed layout (models/fuse.py
            # post-pass). On TPU run the fused Pallas kernel (shard_mapped
            # per-device under a mesh); elsewhere un-pack (bitwise view)
            # and take the regular graph.
            from yolo_re_tpu.parallel.spmd import (
                pallas_interpret,
                pallas_supported,
                shard_batchwise,
            )

            if pallas_supported():
                from yolo_re_tpu.ops.pallas.adown_kernel import (
                    adown_from_packed,
                )
                return shard_batchwise(
                    partial(adown_from_packed, interpret=pallas_interpret()),
                    x, params["pallas"]), stats
            b_, h_, wp_, c2 = x.shape
            x = x.reshape(b_, h_, wp_ * 2, c2 // 2)
        cs, cp = ADown._sub(cfg)
        x = avg_pool2d(x, 2, 1, 0)
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        y1, s1 = Conv.apply(cs, params["conv_stride"], stats["conv_stride"],
                            x1, train=train)
        x2 = max_pool2d(x2, 3, 2, 1)
        y2, s2 = Conv.apply(cp, params["conv_pool"], stats["conv_pool"],
                            x2, train=train)
        return (jnp.concatenate([y1, y2], axis=-1),
                {"conv_stride": s1, "conv_pool": s2})


# ---------------------------------------------------------------------------
# CBLinear / CBFuse (YOLOv9 auxiliary routing)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CBLinearConfig:
    in_channels: int
    out_channels_list: tuple[int, ...]
    kernel_size: int = 1
    stride: int = 1
    padding: int | None = None
    groups: int = 1

    def __post_init__(self):
        object.__setattr__(self, "out_channels_list",
                           tuple(self.out_channels_list))


class CBLinear:
    """One biased conv projecting to sum(out_list), split into a tuple.

    Reference: src/yolo/blocks/auxiliary.py:30-66.
    """

    Config = CBLinearConfig

    @staticmethod
    def init(key, cfg: CBLinearConfig):
        total = sum(cfg.out_channels_list)
        kw, kb = jax.random.split(key)
        w = init_conv_kernel(kw, cfg.kernel_size, cfg.in_channels, total,
                             cfg.groups)
        fan_in = cfg.kernel_size ** 2 * (cfg.in_channels // cfg.groups)
        bound = 1.0 / math.sqrt(fan_in)
        b = jax.random.uniform(kb, (total,), jnp.float32, -bound, bound)
        return {"w": w, "b": b}, {}

    @staticmethod
    def apply(cfg: CBLinearConfig, params, stats, x, *, train=False):
        y = conv2d(x, params["w"], stride=cfg.stride,
                   padding=autopad(cfg.kernel_size, cfg.padding),
                   groups=cfg.groups)
        y = (y + params["b"].astype(y.dtype)).astype(x.dtype)
        outs = []
        start = 0
        for c in cfg.out_channels_list:
            outs.append(y[..., start:start + c])
            start += c
        return tuple(outs), stats


@dataclass(frozen=True)
class CBFuseConfig:
    idx: tuple[int, ...]

    def __post_init__(self):
        object.__setattr__(self, "idx", tuple(self.idx))


class CBFuse:
    """Select one tensor from each CBLinear tuple, nearest-resize to the
    target's spatial size, sum with the target.

    Reference: src/yolo/blocks/auxiliary.py:76-114.
    """

    Config = CBFuseConfig

    @staticmethod
    def init(key, cfg: CBFuseConfig):
        return {}, {}

    @staticmethod
    def apply(cfg: CBFuseConfig, params, stats, x, *, train=False):
        cb_outputs, target = x[:-1], x[-1]
        h, w = target.shape[1], target.shape[2]
        total = target
        for i, cb_out in enumerate(cb_outputs):
            total = total + interpolate_nearest(cb_out[cfg.idx[i]], h, w)
        return total, stats


# ---------------------------------------------------------------------------
# Concat / Silence / Upsample
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ConcatConfig:
    dimension: int = 1  # torch channel dim; mapped to NHWC axis -1


class Concat:
    """Channel concat (reference: src/yolo/blocks/common.py:20-37)."""

    Config = ConcatConfig

    @staticmethod
    def init(key, cfg: ConcatConfig):
        return {}, {}

    @staticmethod
    def apply(cfg: ConcatConfig, params, stats, x, *, train=False):
        axis = -1 if cfg.dimension == 1 else cfg.dimension
        return jnp.concatenate(x, axis=axis), stats


@dataclass(frozen=True)
class SilenceConfig:
    pass


class Silence:
    """Identity tap (reference: src/yolo/blocks/common.py:40-50)."""

    Config = SilenceConfig

    @staticmethod
    def init(key, cfg: SilenceConfig):
        return {}, {}

    @staticmethod
    def apply(cfg: SilenceConfig, params, stats, x, *, train=False):
        return x, stats


@dataclass(frozen=True)
class UpsampleConfig:
    scale_factor: int = 2
    mode: str = "nearest"


class Upsample:
    """Nearest-neighbor upsample (reference uses nn.Upsample)."""

    Config = UpsampleConfig

    @staticmethod
    def init(key, cfg: UpsampleConfig):
        return {}, {}

    @staticmethod
    def apply(cfg: UpsampleConfig, params, stats, x, *, train=False):
        assert cfg.mode == "nearest", f"unsupported mode {cfg.mode}"
        return upsample_nearest(x, int(cfg.scale_factor)), stats


# ---------------------------------------------------------------------------
# Registry (the single dispatch mechanism — fixes SURVEY §2.4.5 where the
# reference's registry exists but its parser uses hardcoded dispatch)
# ---------------------------------------------------------------------------

BLOCKS: dict[str, type] = {
    "Conv": Conv,
    "RepConv": RepConv,
    "RepNBottleneck": RepNBottleneck,
    "RepNCSP": RepNCSP,
    "RepNCSPELAN4": RepNCSPELAN4,
    "SPPELAN": SPPELAN,
    "ADown": ADown,
    "CBLinear": CBLinear,
    "CBFuse": CBFuse,
    "Concat": Concat,
    "Silence": Silence,
    "Upsample": Upsample,
}


def get_block_class(name: str) -> type:
    try:
        return BLOCKS[name]
    except KeyError:
        raise ValueError(
            f"Unknown block type: {name}. Available: {sorted(BLOCKS)}"
        ) from None


def register_block(name: str, cls: type) -> None:
    """Register a custom block type for the YAML parser."""
    BLOCKS[name] = cls
