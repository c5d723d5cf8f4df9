"""One-shot TPU validation + timing for the TRAIN-mode Pallas ADown pair
(ops/adown_train.py): real-Mosaic compile of both kernels, numerical
parity vs the direct graph, and an isolated fwd / fwd+bwd A/B at down1
shapes. Stages (STAGE env):

  STAGE=kernel  small-shape compile + parity (fwd, then grads)
  STAGE=bench   down1-shape (32,160,160,256) direct vs kernel fwd / f+b
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

from yolo_re_tpu.models.blocks import ADown, ADownConfig
from yolo_re_tpu.ops.adown_train import apply_adown_train
from yolo_re_tpu.utils.profiling import device_timer

STAGE = os.environ.get("STAGE", "kernel")
CFG = ADownConfig(256, 256)


def _setup(B, H, W, seed=0):
    params, stats = ADown.init(jax.random.key(seed), CFG)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, H, W, 256)), jnp.bfloat16)
    return params, stats, x


def _direct(params, stats, x):
    os.environ["YOLO_TPU_ADOWN_TRAIN"] = "0"
    try:
        return ADown.apply(CFG, params, stats, x, train=True)
    finally:
        del os.environ["YOLO_TPU_ADOWN_TRAIN"]


def stage_kernel():
    params, stats, x = _setup(2, 32, 32)
    t0 = time.time()
    got, ns_g = jax.jit(lambda p, s, x: apply_adown_train(CFG, p, s, x))(
        params, stats, x)
    print(f"fwd kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)
    ref, ns_r = jax.jit(lambda p, s, x: _direct(p, s, x))(params, stats, x)
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                              - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    ds = max(float(jnp.max(jnp.abs(ns_g[b][k] - ns_r[b][k])))
             for b in ("conv_stride", "conv_pool") for k in ("mean", "var"))
    print(f"fwd parity: out {d:.2e} (rel {d / scale:.2e}, ref max "
          f"{scale:.1f}) stats {ds:.2e}", flush=True)

    def obj(fn):
        def run(p, x):
            y, _ = fn(p, stats, x)
            return (y.astype(jnp.float32) ** 2).sum()
        return run

    t0 = time.time()
    gk = jax.jit(jax.grad(obj(lambda p, s, x: apply_adown_train(CFG, p, s, x)),
                          argnums=(0, 1)))(params, x)
    jax.block_until_ready(gk)
    print(f"bwd kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)
    gd = jax.jit(jax.grad(obj(_direct), argnums=(0, 1)))(params, x)

    def by_key(tree):
        return sorted(jax.tree_util.tree_leaves_with_path(tree),
                      key=lambda kv: jax.tree_util.keystr(kv[0]))

    for (ka, a), (kb, b) in zip(by_key(gk), by_key(gd)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max() or 1.0
        rel = np.abs(a - b).max() / denom
        print(f"  grad {jax.tree_util.keystr(ka)}: rel {rel:.2e}")


def stage_bench():
    # down1 is (32, 160, 160); SIZE=80 times the pan_down1 site, whose
    # plain-NHWC producer makes the kernel's packed view a real relayout.
    size = int(os.environ.get("SIZE", "160"))
    params, stats, x = _setup(32, size, size)

    def fwd_direct(x, p):
        return _direct(p, stats, x)[0]

    def fwd_kernel(x, p):
        return apply_adown_train(CFG, p, stats, x)[0]

    tf_d = device_timer(fwd_direct, x, params) * 1e3
    tf_k = device_timer(fwd_kernel, x, params) * 1e3
    print(f"down1 fwd   direct {tf_d:6.2f} ms | kernel {tf_k:6.2f} ms "
          f"| {tf_d / tf_k:.2f}x")

    def fb(fn):
        def obj(x, p):
            return (fn(x, p).astype(jnp.float32) ** 2).sum()

        def run(x, p):
            val, grads = jax.value_and_grad(obj, argnums=(0, 1))(x, p)
            return val + sum(g.astype(jnp.float32).ravel()[0]
                             for g in jax.tree_util.tree_leaves(grads))
        return run

    tb_d = device_timer(fb(fwd_direct), x, params) * 1e3
    tb_k = device_timer(fb(fwd_kernel), x, params) * 1e3
    print(f"down1 f+b   direct {tb_d:6.2f} ms | kernel {tb_k:6.2f} ms "
          f"| {tb_d / tb_k:.2f}x {'WIN' if tb_k < tb_d else 'lose'}")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    {"kernel": stage_kernel, "bench": stage_bench}[STAGE]()
