"""Queued TPU experiments, run as ONE process with progress prints.

Run in the background WITHOUT a killing timeout (killing mid-device-work
wedges the remote chip for ~45-60 min — see verify skill):

    python scripts/tpu_session_experiments.py > /tmp/exp.log 2>&1 &

Stages (env EXP_STAGES, comma list, default all):
  boundary — where should the packed stage1 un-pack? (a) packed conv_out
             then view (current), (b) view then unpacked conv_out.
  adown    — pallas ADown v2: small single-shot, full single-shot, then
             the fused-loop benchmark only if both succeed.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.utils.profiling import device_timer

STAGES = os.environ.get("EXP_STAGES", "boundary,adown").split(",")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage_boundary():
    from yolo_re_tpu.models import blocks as B
    from yolo_re_tpu.models.fuse import _fuse
    from yolo_re_tpu.ops.packed_elan import apply_packed_elan

    cfg = B.RepNCSPELAN4Config(128, 256, hidden_channels=128,
                               block_channels=64, num_repeats=1)
    p, s = B.RepNCSPELAN4.init(jax.random.key(0), cfg)
    fp, fs = _fuse(B.RepNCSPELAN4, cfg, p, s)
    packed = fp["packed"]
    plain = {k: v for k, v in fp.items() if k != "packed"}

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 160, 160, 128)), jnp.bfloat16)

    def consumer(y):
        # stand-in for down1's first reads: avgpool entry
        return jax.lax.reduce_window(
            y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1),
            ((0, 0), (0, 0), (0, 0), (0, 0))) * 0.25

    def chain_packed_out(a):                 # current: packed conv_out+view
        return consumer(apply_packed_elan(packed, a, 256))

    from yolo_re_tpu.ops.packed_elan import _pconv

    def chain_view_then_convout(a):
        # packed middle, but un-pack BEFORE conv_out (view + dense conv)
        Bb, H, W, cin = a.shape
        x2 = a.reshape(Bb, H, W // 2, 2 * cin)
        y = _pconv(x2, packed["conv_in"])
        ya, yb = y[..., :128], y[..., 128:]

        def csp(z, C):
            m = _pconv(z, C["conv1"], stride_w=2)
            r = m
            for bot in C["bottlenecks"]:
                t = _pconv(r, bot["rep"])
                t = _pconv(t, bot["conv"])
                r = r + t
            y2 = _pconv(z, C["conv2"], stride_w=2)
            y3 = _pconv(jnp.concatenate([r, y2], -1), C["conv3"])
            return y3.reshape(Bb, H, W // 2, 128)

        y1 = _pconv(csp(yb, packed["csp1"]), packed["conv1"])
        y2 = _pconv(csp(y1, packed["csp2"]), packed["conv2"])
        cat = jnp.concatenate([ya, yb, y1, y2], -1)      # (B,H,W/2,512)
        # un-pack here, then dense conv_out from the PLAIN fused weights.
        # cat lane order per col: [A_q0 A_q1 | B_q0 B_q1 | ...]; the
        # unpacked concat order is [A B C D] per pixel — a (4,2,64)
        # transpose of lanes, free to fold into the dense conv_out's
        # input rows? No: the unpack is positional. Emulate with reshape
        # (W/2, 4, 2, 64) -> transpose -> (W, 256).
        t = cat.reshape(Bb, H, W // 2, 4, 2, 64)
        t = t.transpose(0, 1, 2, 4, 3, 5).reshape(Bb, H, W, 256)
        co = plain["conv_out"]
        yy = jax.lax.conv_general_dilated(
            t, co["w"].astype(t.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        yy = yy + co["b"].astype(yy.dtype)
        return consumer((yy * jax.nn.sigmoid(yy)).astype(t.dtype))

    # correctness
    xs = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
    e = float(jnp.max(jnp.abs(chain_packed_out(xs) -
                              chain_view_then_convout(xs))))
    log(f"boundary variants max abs diff: {e:.2e}")

    t0 = device_timer(chain_packed_out, x, iters=100)
    log(f"stage1+consumer, packed conv_out + view : {t0*1e3:.3f} ms")
    t1 = device_timer(chain_view_then_convout, x, iters=100)
    log(f"stage1+consumer, view + dense conv_out  : {t1*1e3:.3f} ms")


def stage_adown():
    from yolo_re_tpu.models import blocks as B
    from yolo_re_tpu.models.fuse import _fuse
    from yolo_re_tpu.ops.pallas.adown_kernel import (
        adown_from_packed,
        build_adown_kernel_weights,
    )

    acfg = B.ADownConfig(256, 256)
    ap, as_ = B.ADown.init(jax.random.key(1), acfg)
    afp, afs = _fuse(B.ADown, acfg, ap, as_)
    wk = build_adown_kernel_weights(afp)
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 256)), jnp.bfloat16)
    t0 = time.time()
    y = adown_from_packed(x.reshape(2, 32, 16, 512), wk)
    log(f"adown small single-shot ok in {time.time()-t0:.1f}s "
        f"(sum {float(jnp.sum(y.astype(jnp.float32))):.1f})")

    xf = jnp.asarray(rng.standard_normal((32, 160, 80, 512)), jnp.bfloat16)
    t0 = time.time()
    y = adown_from_packed(xf, wk)
    log(f"adown FULL single-shot ok in {time.time()-t0:.1f}s "
        f"(sum {float(jnp.sum(y.astype(jnp.float32))):.1f})")

    t = device_timer(lambda a: adown_from_packed(a, wk), xf, iters=100)
    log(f"adown pallas v2 fused-loop: {t*1e3:.3f} ms")

    xb = jnp.asarray(rng.standard_normal((32, 160, 160, 256)), jnp.bfloat16)
    t = device_timer(
        lambda a: B.ADown.apply(acfg, afp, afs, a, train=False)[0],
        xb, iters=100)
    log(f"adown regular (unpacked in): {t*1e3:.3f} ms")


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    for st in STAGES:
        log(f"=== stage {st} ===")
        {"boundary": stage_boundary, "adown": stage_adown}[st.strip()]()
    log("all stages done")
