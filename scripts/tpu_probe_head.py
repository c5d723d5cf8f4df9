"""Prototype a width-packed detect-head box tower (inference, fused).

Round-3 VERDICT item: the head is the largest inference item after stage1
(6.0 ms, 16%) and its c2=64-channel box towers pay the T(8,128) 2x
HBM-padding tax on every intermediate. Head-shape width packing of the
whole head measured only 1.06-1.11x and was not adopted; this probes the
BOX TOWER alone with a cheaper entry transform:

- entry 3x3 cin->64 emits the p=2 packed layout DIRECTLY from the
  unpacked input: kernel (3, 4, cin, 128), stride (1, 2), pad (1, 1)
  (output phase q reads raw cols 2j+q+k-1 = window tap q+k of col 2j-1;
  taps 0..3). 4/3x the FLOPs of the raw conv, but full 128-lane output
  and no input relayout.
- mid 3x3 64->64 (g=4 dense-expanded): _pack_same(w, 2) -> (3, 3, 128,
  128), 2x the (tiny) FLOPs, full lanes.
- final 1x1 g=4 biased conv: per-phase block-diagonal (1, 1, 128, 128),
  pure lane permutation, no inflation.
- the packed output (B, H, W/2, 128) reshapes to the decode-stream
  (B, H*W, 64) in the SAME row-major byte order the unpacked (B,H,W,64)
  does — the flatten costs nothing extra.

Reference tower: /root/reference/src/yolo/heads/detect.py:48-64.

MEASURED OUTCOME (2026-08, one v5e, batch 32 bf16): P3 1.09x / P4 1.06x /
P5 1.01x, towers total 8.93 -> 8.45 ms — ~0.5 ms, under the +2% e2e keep
bar even before in-context shrinkage (the entry conv's input read is
shared with the cls tower in the real head). The cin=256/512 entry conv
dominates the tower and is already well-lowered; the 64ch intermediates
are too small a slice. NOT adopted — recorded in docs/performance.md
"What lost"; this probe is the experiment record.

Usage: python scripts/tpu_probe_head.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from yolo_re_tpu.ops.conv import _block_diag_expand  # noqa: E402
from yolo_re_tpu.ops.packed_elan import _pack_same  # noqa: E402
from yolo_re_tpu.utils.profiling import device_timer  # noqa: E402

DT = jnp.bfloat16
BATCH = 32


def conv(x, w, b=None, *, stride=(1, 1), pad=((1, 1), (1, 1)), act=True):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), stride, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    if act:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def pack_entry(w: np.ndarray) -> np.ndarray:
    """(3, 3, cin, 64) -> (3, 4, cin, 128) emit-packed stride-(1,2) kernel."""
    kh, kw, cin, cout = w.shape
    wp = np.zeros((kh, 4, cin, 2 * cout), w.dtype)
    for q in range(2):
        for k in range(kw):
            wp[:, q + k, :, q * cout:(q + 1) * cout] += w[:, k]
    return wp


def pack_final_1x1(w: np.ndarray) -> np.ndarray:
    """(1, 1, 64, 64) dense -> per-phase block-diag (1, 1, 128, 128)."""
    c = w.shape[2]
    wp = np.zeros((1, 1, 2 * c, 2 * c), w.dtype)
    for q in range(2):
        wp[0, 0, q * c:(q + 1) * c, q * c:(q + 1) * c] = w[0, 0]
    return wp


def tower(level_name, hw, cin, c2=64, reg=64):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, hw, hw, cin)) * 0.5, DT)
    w1 = rng.standard_normal((3, 3, cin, c2)).astype(np.float32) * 0.02
    b1 = rng.standard_normal(c2).astype(np.float32) * 0.01
    w2g = rng.standard_normal((3, 3, c2 // 4, c2)).astype(np.float32) * 0.02
    b2 = rng.standard_normal(c2).astype(np.float32) * 0.01
    w3g = rng.standard_normal((1, 1, c2 // 4, reg)).astype(np.float32) * 0.02
    b3 = rng.standard_normal(reg).astype(np.float32) * 0.01

    w2 = np.asarray(_block_diag_expand(jnp.asarray(w2g), 4))
    w3 = np.asarray(_block_diag_expand(jnp.asarray(w3g), 4))

    def baseline(x):
        y = conv(x, jnp.asarray(w1), jnp.asarray(b1))
        y = conv(y, jnp.asarray(w2), jnp.asarray(b2))
        y = conv(y, jnp.asarray(w3), jnp.asarray(b3),
                 pad=((0, 0), (0, 0)), act=False)
        return y.reshape(BATCH, hw * hw, reg)

    w1p = jnp.asarray(pack_entry(w1))
    b1p = jnp.asarray(np.tile(b1, 2))
    w2p = jnp.asarray(_pack_same(w2, 2))
    b2p = jnp.asarray(np.tile(b2, 2))
    w3p = jnp.asarray(pack_final_1x1(w3))
    b3p = jnp.asarray(np.tile(b3, 2))

    def packed(x):
        y = conv(x, w1p, b1p, stride=(1, 2))
        y = conv(y, w2p, b2p)
        y = conv(y, w3p, b3p, pad=((0, 0), (0, 0)), act=False)
        return y.reshape(BATCH, hw * hw, reg)

    ref = jax.jit(baseline)(x)
    got = jax.jit(packed)(x)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    t_base = device_timer(baseline, x) * 1e3
    t_pack = device_timer(packed, x) * 1e3
    verdict = "WIN" if t_pack < t_base else "lose"
    print(f"{level_name:14s} base {t_base:6.3f} ms | packed {t_pack:6.3f} ms "
          f"| {t_base / t_pack:4.2f}x {verdict} | err {err:.2e}")
    return t_base, t_pack


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  batch {BATCH} bf16 box towers "
          f"(3x3 cin->64, 3x3 64->64 dense-g4, 1x1 64->64 dense-g4+bias)")
    tot_b = tot_p = 0.0
    for name, hw, cin in (("P3 80x80x256", 80, 256),
                          ("P4 40x40x512", 40, 512),
                          ("P5 20x20x512", 20, 512)):
        tb, tp = tower(name, hw, cin)
        tot_b += tb
        tot_p += tp
    print(f"{'TOTAL':14s} base {tot_b:6.3f} ms | packed {tot_p:6.3f} ms "
          f"| {tot_b / tot_p:4.2f}x")
