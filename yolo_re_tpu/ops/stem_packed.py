"""XLA-side consumer of the Pallas stem kernel's row-paired packed layout.

The stem kernel (ops/pallas/stem_kernel.py) emits (B, H/4, W/2, 2*C) with
lanes (row parity, channel). The network's second conv (k3 s2 p1) consumes
it as a dense (2, 3)-window conv over row pairs — weights rewritten by
`pack_next_conv_weights` — producing a standard NHWC result. Measured on
v5e (gelan-c/640 batch 32, bf16): 2.68 ms vs 4.41 ms for the same conv on
the NHWC tensor, because the packed input is exactly lane-tiled while the
64-channel NHWC tensor is T(8,128)-padded to twice its size in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_re_tpu.ops.conv import get_activation


def next_conv_from_packed(x: jax.Array, params, act: str = "silu"):
    """(B, HO/2, WO, 2*Cin) row-paired -> (B, HO/2, WO/2, Cout) NHWC.

    params: {'w': (2, 3, 2*Cin, Cout) from pack_next_conv_weights,
             'b': (Cout,)} (fused conv+BN bias).
    """
    w, b = params["w"], params["b"]
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 2), ((1, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec,
        preferred_element_type=jnp.float32)
    y = get_activation(act)(y + b.astype(jnp.float32))
    return y.astype(x.dtype)
