"""gelan-e lane-padding probe: do dense zero-padded channels beat the
T(8,128) padding tax?

gelan-e (width x1.25) trains at 28.4% MFU vs gelan-c's 38.1% because its
channel counts land off the 128-lane grid: 80 (stem1, stage1 blocks),
160 (stem2, stage1 hidden), 320 (stage1 out, stage2 hidden) — 80 and 160
tensors are stored lane-padded to 128/256 in HBM (1.6x write/read tax)
and contract on a quarter-/half-full MXU. The one unexplored experiment
from the round-3 closure (VERDICT r3 Weak #2 / next #4): DENSE
zero-padding to full 128-lane multiples — 1.6x FLOPs, the exact trade the
kept grouped-conv expansion won with (docs/performance.md "What won").
The padding transform is numerics-exact in-model (zero out-channels +
zero BN scale/bias -> padded activations identically 0; zero in-channel
weights in consumers), so the probe measures the conv shapes alone:
fwd / dx / dW at gelan-e geometry, unpadded vs padded to the next lane
multiple, floor-corrected at iters=200.

Usage:  python scripts/tpu_probe_gelan_e.py          (real TPU)
        STAGE=conv|stem python scripts/tpu_probe_gelan_e.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from yolo_re_tpu.ops.conv import _conv_acc_f32  # noqa: E402
from yolo_re_tpu.utils.profiling import device_timer  # noqa: E402

B = 32
DT = jnp.bfloat16
ITERS = int(os.environ.get("PROBE_ITERS", "200"))


def _pad_to_lanes(c: int) -> int:
    return -(-c // 128) * 128


def _time_conv(hw: int, k: int, cin: int, cout: int, stride: int = 1):
    """(fwd, dx, dw) seconds for one conv shape at iters=ITERS."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, hw, hw, cin), np.float32), DT)
    w = jnp.asarray(rng.random((k, k, cin, cout), np.float32) * 0.1, DT)
    pad = k // 2

    def fwd(x, w):
        return _conv_acc_f32(x, w, (stride, stride),
                             ((pad, pad), (pad, pad)), 1, 1).astype(DT)

    def dx(g, w):
        _, vjp = jax.vjp(lambda x_: fwd(x_, w), x)
        return vjp(g)[0]

    def dw(g, x_):
        _, vjp = jax.vjp(lambda w_: fwd(x_, w_), w)
        return vjp(g)[0]

    g = fwd(x, w)
    t_f = device_timer(fwd, x, w, iters=ITERS)
    t_dx = device_timer(dx, g, w, iters=ITERS)
    t_dw = device_timer(dw, g, x, iters=ITERS)
    return t_f, t_dx, t_dw


def _report(name, hw, k, cin, cout, stride=1):
    flops = 2 * (hw // stride) ** 2 * B * k * k * cin * cout
    tf, tdx, tdw = _time_conv(hw, k, cin, cout, stride)
    # never pad the 3-channel image input (42x FLOPs); pad channels only
    cin_p = cin if cin == 3 else _pad_to_lanes(cin)
    cout_p = _pad_to_lanes(cout)
    line = (f"{name:<26} {k}x{k} {cin:>3}->{cout:<3} @{hw}^2"
            f"  fwd {tf * 1e3:7.3f} ms ({flops / tf / 1e12:5.1f} TF/s)"
            f"  dx {tdx * 1e3:7.3f}  dW {tdw * 1e3:7.3f}")
    if (cin_p, cout_p) != (cin, cout):
        pf, pdx, pdw = _time_conv(hw, k, cin_p, cout_p, stride)
        line += (f"  | padded {cin_p}->{cout_p}:"
                 f" fwd {pf * 1e3:7.3f}  dx {pdx * 1e3:7.3f}"
                 f"  dW {pdw * 1e3:7.3f}"
                 f"  (f+b {'WIN' if pf + pdx + pdw < tf + tdx + tdw else 'lose'}"
                 f" {(tf + tdx + tdw) / (pf + pdx + pdw):4.2f}x)")
    print(line, flush=True)


def stage_conv():
    print(f"batch {B} bf16, iters={ITERS} (floor-corrected)", flush=True)
    # gelan-e train geometry at 640px input
    _report("stage1 conv_in", 160, 1, 320, 160)     # after stem2 @160^2
    _report("stage1 csp 3x3", 160, 3, 80, 80)
    _report("stage1 csp entry", 160, 1, 160, 80)
    _report("stage1 conv_out", 160, 1, 320, 320)
    _report("stage2 csp 3x3", 80, 3, 160, 160)
    _report("stage2 conv_in", 80, 1, 640, 320)
    _report("fpn2 csp 3x3", 80, 3, 160, 160)
    _report("stage3 csp 3x3", 40, 3, 320, 320)


def stage_stem():
    print("stem shapes (s2)", flush=True)
    _report("stem1", 640, 3, 3, 80, stride=2)
    _report("stem2", 320, 3, 80, 160, stride=2)


STAGES = {"conv": stage_conv, "stem": stage_stem}


if __name__ == "__main__":
    which = os.environ.get("STAGE")
    for name, fn in STAGES.items():
        if which in (None, "", name):
            print(f"== {name} ==", flush=True)
            fn()
