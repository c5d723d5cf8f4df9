"""Core convolution / pooling / resize primitives, TPU-native (NHWC, XLA).

Design: pure functions over explicit parameter pytrees. Layout is NHWC
(TPU-friendly: channels on the 128-lane minor dimension) with HWIO kernels;
the torch reference uses NCHW/OIHW (reference: src/yolo/blocks/conv.py).
Convolutions accumulate in float32 via ``preferred_element_type`` so bfloat16
activations still hit the MXU with full-precision accumulation.

BatchNorm follows the reference numerics exactly (eps=1e-3, momentum=0.03,
unbiased running-variance update; reference: src/yolo/blocks/conv.py:85).
For inference the BN affine is folded into the conv weights ahead of time
(`fold_conv_bn`), which the reference never does (SURVEY §2.4.8) — XLA then
sees a single conv+bias+activation and fuses the epilogue.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict[str, Any]

BN_EPS = 1e-3
BN_MOMENTUM = 0.03


def autopad(kernel_size: int, padding: int | None = None, dilation: int = 1) -> int:
    """'same' padding rule (reference: src/yolo/blocks/conv.py:12-21)."""
    if dilation > 1:
        kernel_size = dilation * (kernel_size - 1) + 1
    if padding is None:
        padding = kernel_size // 2
    return padding


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def silu(x):
    return x * jax.nn.sigmoid(x)


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


_ACTIVATIONS = {
    "silu": silu,
    "relu": jax.nn.relu,
    "leaky_relu": partial(jax.nn.leaky_relu, negative_slope=0.1),
    "hardswish": hardswish,
    "none": lambda x: x,
}


def get_activation(name: str):
    """Activation by name (reference: src/yolo/blocks/conv.py:24-38)."""
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation: {name}") from None


# ---------------------------------------------------------------------------
# Raw conv
# ---------------------------------------------------------------------------

def conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """2D convolution, NHWC x HWIO -> NHWC, f32 accumulation.

    Precision: DEFAULT precision feeds the MXU bf16 multiplicands even for
    f32 operands (TPU semantics — and this environment's CPU backend
    emulates it). For f32 inputs we request HIGHEST so the f32 path is
    actually f32 (required for reference parity); bf16 inputs keep DEFAULT,
    which is the fast MXU path.

    Grouped convs accept dense-expanded weights: if w's input dim already
    equals x's channel count the groups were folded into a block-diagonal
    dense kernel (models/fuse.py does this at inference — measured faster
    than feature_group_count on v5e at detect-head shapes) and the conv
    runs ungrouped. Zero off-block weights add exact zeros into the f32
    accumulator, so numerics are unchanged.
    """
    if groups > 1 and w.shape[2] == x.shape[-1]:
        groups = 1
    elif groups > 1 and x.dtype == jnp.bfloat16:
        # bf16 hot path (training + unfused inference): expand on the fly.
        # The expansion is linear, so autodiff recovers the exact grouped
        # gradients (off-block cotangents are sliced away); f32 inputs keep
        # the grouped lowering so reference-parity numerics are untouched.
        w = _block_diag_expand(w, groups)
        groups = 1
    return _conv_acc_f32(x, w.astype(x.dtype), stride, padding, groups,
                         dilation)


def _block_diag_expand(w: jax.Array, groups: int) -> jax.Array:
    """Grouped HWIO kernel (H, W, cin/groups, cout) -> dense block-diagonal
    (H, W, cin, cout). feature_group_count lowers poorly on v5e at small
    channel counts; the 4x-FLOPs dense conv is measurably faster and adds
    exact zeros into the f32 accumulator (see models/fuse.py, which bakes
    this in for fused inference so it costs nothing per step)."""
    kh, kw, cing, cout = w.shape
    out_per = cout // groups
    dense = jnp.zeros((kh, kw, cing * groups, cout), w.dtype)
    for g in range(groups):
        dense = dense.at[:, :, g * cing:(g + 1) * cing,
                         g * out_per:(g + 1) * out_per].set(
            w[:, :, :, g * out_per:(g + 1) * out_per])
    return dense


def _conv_raw(x, w, stride, padding, groups, dilation, preferred):
    precision = (lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    if not isinstance(stride, tuple):
        stride = (stride, stride)
    if not isinstance(padding, tuple):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=preferred,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _conv_acc_f32(x, w, stride, padding, groups, dilation):
    """Conv whose OUTPUT is f32 regardless of operand dtype.

    stride/padding accept ints or explicit tuples ((h,h),(w,w)) — both
    hashable, as nondiff args must be.

    `preferred_element_type=f32` alone is not differentiable for bf16
    operands (the conv transpose rejects the f32 cotangent against bf16
    operands), so the backward is defined explicitly: cast the cotangent
    to the operand dtype and take the VJP of the plain same-dtype conv —
    standard mixed-precision training semantics (grad convs also
    accumulate f32 on the MXU internally). The forward is bit-identical
    to the old preferred_element_type path.
    """
    return _conv_raw(x, w, stride, padding, groups, dilation, jnp.float32)


def _conv_acc_f32_fwd(x, w, stride, padding, groups, dilation):
    return _conv_acc_f32(x, w, stride, padding, groups, dilation), (x, w)


def _conv_acc_f32_bwd(stride, padding, groups, dilation, res, g):
    x, w = res
    _, vjp = jax.vjp(
        lambda xx, ww: _conv_raw(xx, ww, stride, padding, groups, dilation,
                                 None), x, w)
    return vjp(g.astype(x.dtype))


_conv_acc_f32.defvjp(_conv_acc_f32_fwd, _conv_acc_f32_bwd)


def init_conv_kernel(
    key: jax.Array,
    kernel_size: int,
    in_channels: int,
    out_channels: int,
    groups: int = 1,
) -> jax.Array:
    """Kaiming-uniform init matching torch Conv2d default (a=sqrt(5)).

    torch default: U(-b, b) with b = 1/sqrt(fan_in), fan_in = k*k*cin/groups.
    """
    fan_in = kernel_size * kernel_size * (in_channels // groups)
    bound = 1.0 / math.sqrt(fan_in)
    shape = (kernel_size, kernel_size, in_channels // groups, out_channels)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# Conv + BN + act block (the fundamental unit; reference Conv)
# ---------------------------------------------------------------------------

def init_conv_bn(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size: int = 1,
    groups: int = 1,
) -> tuple[Params, Params]:
    """Init (params, stats) for a Conv+BN block.

    params = {'w', 'scale', 'bias'}; stats = {'mean', 'var'}.
    """
    params = {
        "w": init_conv_kernel(key, kernel_size, in_channels, out_channels, groups),
        "scale": jnp.ones((out_channels,), jnp.float32),
        "bias": jnp.zeros((out_channels,), jnp.float32),
    }
    stats = {
        "mean": jnp.zeros((out_channels,), jnp.float32),
        "var": jnp.ones((out_channels,), jnp.float32),
    }
    return params, stats


def conv_bn_act(
    params: Params,
    stats: Params | None,
    x: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    dilation: int = 1,
    act: str = "silu",
    train: bool = False,
) -> tuple[jax.Array, Params | None]:
    """Conv -> BatchNorm -> activation (reference: src/yolo/blocks/conv.py:55-93).

    In train mode, normalizes with batch statistics and returns updated
    running stats. Under a sharded-batch `jit`, the batch-mean reductions are
    global (XLA inserts the cross-device collectives), giving SyncBatchNorm
    semantics for free — the design item SURVEY §2.2 calls out.

    If params contains a fused bias 'b' (from `fold_conv_bn`), BN is skipped.

    Output dtype == input dtype: the conv accumulates f32 internally, but
    activations stay in the compute dtype (bf16 in, bf16 out) — otherwise a
    bf16 network silently becomes an f32 one after the first layer.
    """
    in_dtype = x.dtype
    y = conv2d(x, params["w"], stride=stride, padding=padding, groups=groups,
               dilation=dilation)

    if "b" in params:  # inference-fused path
        y = y + params["b"].astype(y.dtype)
        return get_activation(act)(y).astype(in_dtype), stats

    assert stats is not None
    if train:
        if in_dtype == jnp.bfloat16:
            # bf16 training path: cast the f32 conv accumulation to bf16
            # ONCE (fused into the conv epilogue) and compute both stat
            # moments in a single pass over the bf16 tensor with f32
            # accumulators. vs the f32 path below this writes the conv
            # output at half size and reads it twice instead of three
            # times (~2.7x less BN memory traffic — the dominant cost of
            # the train-mode forward: 98 ms vs 41 ms fused-inference at
            # gelan-c/640/b32). Same semantics as torch.autocast, where BN
            # sees fp16 activations and computes f32 statistics; the
            # one-pass E[x^2]-E[x]^2 cancellation error (~1e-6 relative
            # here) is far below the bf16 quantization already applied to
            # y. The f32 path keeps two-pass for exact reference parity.
            y = y.astype(jnp.bfloat16)
            yf = y.astype(jnp.float32)  # fused into the reduce reads
            mean = jnp.mean(yf, axis=(0, 1, 2))
            meansq = jnp.mean(jnp.square(yf), axis=(0, 1, 2))
            var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        else:
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=(0, 1, 2))
            # Two-pass variance: E[(x-mean)^2] — the one-pass E[x^2]-E[x]^2
            # form cancels catastrophically in f32 and costs ~1e-3 parity
            # vs torch.
            var = jnp.mean(jnp.square(yf - mean), axis=(0, 1, 2))
        n = y.shape[0] * y.shape[1] * y.shape[2]
        # torch updates running_var with the *unbiased* batch variance.
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1.0 - BN_MOMENTUM) * stats["mean"] + BN_MOMENTUM * mean,
            "var": (1.0 - BN_MOMENTUM) * stats["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats

    inv = lax.rsqrt(var + BN_EPS) * params["scale"]
    y = y * inv.astype(y.dtype) + (params["bias"] - mean * inv).astype(y.dtype)
    return get_activation(act)(y).astype(in_dtype), new_stats


def fold_conv_bn(params: Params, stats: Params) -> Params:
    """Fold BN affine+stats into conv weight and bias for inference.

    w' = w * scale/sqrt(var+eps) (per out-channel), b' = bias - mean*scale/sqrt.
    The reference never re-parameterizes (SURVEY §2.4.8); we do, for the
    deployment/bench path, while parity tests compare the unfused numerics.
    """
    inv = params["scale"] / np.sqrt(np.asarray(stats["var"]) + BN_EPS)
    inv = jnp.asarray(inv, jnp.float32)
    return {
        "w": params["w"] * inv[None, None, None, :],
        "b": params["bias"] - stats["mean"] * inv,
    }


# ---------------------------------------------------------------------------
# Pooling / resize
# ---------------------------------------------------------------------------

def max_pool2d(x: jax.Array, kernel: int, stride: int, padding: int) -> jax.Array:
    """Max pool, NHWC.

    Init value must be a Python scalar so lax.reduce_window dispatches to
    its monoid-specialized (autodiff-supporting) primitive.
    """
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool2d(x: jax.Array, kernel: int, stride: int, padding: int = 0) -> jax.Array:
    """Average pool (count includes padding-free window only for padding=0)."""
    s = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return s / (kernel * kernel)


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Nearest-neighbor integer upsample (== torch F.interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def interpolate_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch-semantics nearest resize: src_idx = floor(dst * in/out).

    Shapes are static under jit, so indices are computed host-side.
    """
    _, h, w, _ = x.shape
    if (out_h, out_w) == (h, w):
        return x
    rows = np.floor(np.arange(out_h) * (h / out_h)).astype(np.int32)
    cols = np.floor(np.arange(out_w) * (w / out_w)).astype(np.int32)
    return x[:, rows][:, :, cols]
