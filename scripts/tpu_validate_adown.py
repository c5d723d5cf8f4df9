"""One-shot TPU validation for the Pallas ADown kernel + related probes.

Run stages individually (they hang the shared chip if the kernel
deadlocks, so each is separately gated):

  STAGE=kernel  python scripts/tpu_validate_adown.py   # small-shape compile+run
  STAGE=bench   ...                                    # kernel micro-bench
  STAGE=stem    ...                                    # stem1 layout probes
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

STAGE = os.environ.get("STAGE", "kernel")


def make_weights():
    from yolo_re_tpu.models import blocks as B
    from yolo_re_tpu.models.fuse import _fuse
    from yolo_re_tpu.ops.pallas.adown_kernel import build_adown_kernel_weights

    acfg = B.ADownConfig(256, 256)
    ap, as_ = B.ADown.init(jax.random.key(1), acfg)
    afp, afs = _fuse(B.ADown, acfg, ap, as_)
    return acfg, afp, afs, build_adown_kernel_weights(afp)


def stage_kernel():
    from yolo_re_tpu.models import blocks as B
    from yolo_re_tpu.ops.pallas.adown_kernel import adown_from_packed

    acfg, afp, afs, wk = make_weights()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 256)), jnp.bfloat16)
    t0 = time.time()
    y_pal = adown_from_packed(x.reshape(2, 32, 16, 512), wk)
    s = float(jnp.sum(y_pal.astype(jnp.float32)))
    print(f"kernel ran in {time.time()-t0:.1f}s (sum {s:.2f})", flush=True)
    y_ref, _ = B.ADown.apply(acfg, afp, afs, x, train=False)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                - y_pal.astype(jnp.float32))))
    print(f"bf16 max abs err vs fused graph: {err:.2e}", flush=True)


def stage_bench():
    from yolo_re_tpu.models import blocks as B
    from yolo_re_tpu.ops.pallas.adown_kernel import adown_from_packed

    acfg, afp, afs, wk = make_weights()
    rng = np.random.default_rng(0)
    xpb = jnp.asarray(rng.standard_normal((32, 160, 80, 512)), jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal((32, 160, 160, 256)), jnp.bfloat16)
    t0 = device_timer(
        lambda a: B.ADown.apply(acfg, afp, afs, a, train=False)[0],
        xb, iters=100)
    print(f"ADown regular (unpacked in): {t0*1e3:.3f} ms", flush=True)
    t1 = device_timer(lambda a: adown_from_packed(a, wk), xpb, iters=100)
    print(f"ADown pallas  (packed in)  : {t1*1e3:.3f} ms", flush=True)


def stage_stem():
    """Is stem1 slow because the C=3 input is stored lane-padded?"""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 64)) * 0.1, jnp.bfloat16)

    def conv(x, wk, stride=2, pad=1):
        import functools
        y = jax.lax.conv_general_dilated(
            x, wk, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.silu(y).astype(x.dtype)

    x3 = jnp.asarray(rng.standard_normal((32, 640, 640, 3)), jnp.bfloat16)
    t = device_timer(lambda a: conv(a, w), x3, iters=100)
    print(f"stem1 3ch NHWC input : {t*1e3:.3f} ms", flush=True)

    # channel-padded to 4 (still sub-lane, but power of two)
    w4 = jnp.pad(w, ((0, 0), (0, 0), (0, 1), (0, 0)))
    x4 = jnp.asarray(rng.standard_normal((32, 640, 640, 4)), jnp.bfloat16)
    t = device_timer(lambda a: conv(a, w4), x4, iters=100)
    print(f"stem1 4ch NHWC input : {t*1e3:.3f} ms", flush=True)

    # reference elementwise pass over the same logical bytes
    t = device_timer(lambda a: a * 1.0001, x3, iters=100)
    print(f"elementwise on 3ch   : {t*1e3:.3f} ms", flush=True)
    xf = jnp.asarray(rng.standard_normal((32, 640, 15, 128)), jnp.bfloat16)
    t = device_timer(lambda a: a * 1.0001, xf, iters=100)
    print(f"elementwise on flat  : {t*1e3:.3f} ms", flush=True)

    # NCHW input (lanes = W, dense storage), NHWC output
    xn = jnp.asarray(rng.standard_normal((32, 3, 640, 640)), jnp.bfloat16)

    def conv_nchw(a):
        y = jax.lax.conv_general_dilated(
            a, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.silu(y).astype(a.dtype)

    t = device_timer(conv_nchw, xn, iters=100)
    print(f"stem1 NCHW input     : {t*1e3:.3f} ms", flush=True)

    # in-graph transpose from NCHW then normal NHWC conv
    t = device_timer(lambda a: conv(a.transpose(0, 2, 3, 1), w), xn,
                     iters=100)
    print(f"stem1 NCHW+transpose : {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    {"kernel": stage_kernel, "bench": stage_bench, "stem": stage_stem}[STAGE]()
