"""One-shot TPU validation + micro-bench for the Pallas stem kernel.

The stem conv (3->64, k3 s2 p1, SiLU; reference src/yolo/blocks/conv.py:55-93
at cin=3) is the worst XLA-mapped layer of gelan-c on v5e: ~5 ms of a ~41 ms
batch-32/640 forward against a ~0.6 ms memory roofline (docs/performance.md).
ops/pallas/stem_kernel.py re-expresses it as phase-plane slabs + one MXU dot
per output row. Stages are separately gated (a deadlocked kernel wedges the
shared chip; see CLAUDE.md):

  STAGE=kernel python scripts/tpu_validate_stem.py   # small-shape compile+run
  STAGE=bench  ...    # stem1 XLA vs pallas (BENCH_B/BENCH_S override shape)
  STAGE=stem2  ...    # second conv: NHWC input vs row-paired packed input
  STAGE=model  ...    # gelan-c fused predict, stem path on/off decode parity
  STAGE=probe  ...    # epilogue/bandwidth floor probes
  STAGE=slab   ...    # slab-batching the cin=3 stem (large-batch regime)
  STAGE=slab2  ...    # slab-batching stem2 + a stage1-like 64ch conv
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
    from yolo_re_tpu.ops.pallas.stem_kernel import build_stem_kernel_weights

    cfg = B.ConvConfig(3, 64, kernel_size=3, stride=2)
    p, s = B.Conv.init(jax.random.key(3), cfg)
    fp, fs = _fuse(B.Conv, cfg, p, s)
    return cfg, fp, fs, build_stem_kernel_weights(fp)


def stage_kernel():
    from yolo_re_tpu.models import blocks as B
    from yolo_re_tpu.ops.pallas.stem_kernel import stem_conv

    cfg, fp, fs, wk = make_weights()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.bfloat16)
    t0 = time.time()
    y_pal = stem_conv(x, wk)
    s = float(jnp.sum(y_pal.astype(jnp.float32)))
    print(f"kernel ran in {time.time()-t0:.1f}s (sum {s:.2f})", flush=True)
    y_ref, _ = B.Conv.apply(cfg, fp, fs, x, train=False)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                - y_pal.astype(jnp.float32))))
    print(f"bf16 max abs err vs fused graph: {err:.2e}", flush=True)


def stage_bench():
    from yolo_re_tpu.models import blocks as B
    from yolo_re_tpu.ops.pallas.stem_kernel import stem_conv

    cfg, fp, fs, wk = make_weights()
    rng = np.random.default_rng(0)
    bsz = int(os.environ.get("BENCH_B", "32"))
    size = int(os.environ.get("BENCH_S", "640"))
    x = jnp.asarray(rng.standard_normal((bsz, size, size, 3)), jnp.bfloat16)
    print(f"batch {bsz} size {size}", flush=True)
    t0 = device_timer(
        lambda a: B.Conv.apply(cfg, fp, fs, a, train=False)[0], x, iters=50)
    print(f"stem XLA conv          : {t0*1e3:.3f} ms", flush=True)
    from yolo_re_tpu.ops.pallas.stem_kernel import stem_conv_packed

    t1 = device_timer(lambda a: stem_conv(a, wk), x, iters=50)
    print(f"stem pallas (unpacked) : {t1*1e3:.3f} ms", flush=True)
    tp = device_timer(lambda a: stem_conv_packed(a, wk), x, iters=50)
    print(f"stem pallas (packed)   : {tp*1e3:.3f} ms", flush=True)

    def xt_only(a):
        B, H, W, _ = a.shape
        wo = W // 2
        wp = -(-wo // 128) * 128
        xt = jnp.transpose(a.reshape(B, H, wo, 6), (0, 1, 3, 2))
        return jnp.pad(xt, ((0, 0), (0, 0), (0, 2), (0, wp - wo)))

    t2 = device_timer(xt_only, x, iters=50)
    print(f"xt transpose+pad alone : {t2*1e3:.3f} ms", flush=True)


def stage_stem2():
    """The following conv (64->128 k3 s2): NHWC input vs row-paired packed."""
    from yolo_re_tpu.models import blocks as B
    from yolo_re_tpu.models.fuse import _fuse
    from yolo_re_tpu.ops.pallas.stem_kernel import pack_next_conv_weights

    cfg = B.ConvConfig(64, 128, kernel_size=3, stride=2)
    p, s = B.Conv.init(jax.random.key(5), cfg)
    fp, fs = _fuse(B.Conv, cfg, p, s)
    w2 = pack_next_conv_weights(fp)["w"].astype(jnp.bfloat16)
    wn = fp["w"].astype(jnp.bfloat16)
    bias = fp["b"].astype(jnp.float32)

    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.standard_normal((32, 320, 320, 64)), jnp.bfloat16)
    xp = jnp.asarray(rng.standard_normal((32, 160, 320, 128)), jnp.bfloat16)

    def silu(v):
        return v * jax.nn.sigmoid(v)

    def conv_n(a):
        y = jax.lax.conv_general_dilated(
            a, wn, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return silu(y + bias).astype(a.dtype)

    def conv_p(a):
        y = jax.lax.conv_general_dilated(
            a, w2, (1, 2), ((1, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return silu(y + bias).astype(a.dtype)

    t0 = device_timer(conv_n, xn, iters=50)
    print(f"stem2 XLA (NHWC in)    : {t0*1e3:.3f} ms", flush=True)
    t1 = device_timer(conv_p, xp, iters=50)
    print(f"stem2 XLA (packed in)  : {t1*1e3:.3f} ms", flush=True)


def stage_model():
    """gelan-c fused predict: stem Pallas path on vs off, decode parity."""
    from yolo_re_tpu.models.yolo import YOLO

    m = YOLO.from_yaml("configs/models/gelan-c.yaml")
    params, stats = m.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 640, 640, 3)) * 0.5,
                    jnp.bfloat16)

    outs = {}
    for flag in ("0", "1"):
        os.environ["YOLO_TPU_PALLAS_STEM"] = flag
        fp, fs = m.fuse(params, stats)
        dec, _ = m.predict(fp, fs, x)
        outs[flag] = np.asarray(dec.astype(jnp.float32))
        print(f"stem={flag}: decode sum {outs[flag].sum():.3f}", flush=True)
    d = np.max(np.abs(outs["0"] - outs["1"]))
    rel = d / max(1e-9, np.max(np.abs(outs["0"])))
    print(f"decode max abs diff stem on/off: {d:.3e} (rel {rel:.2e})",
          flush=True)


def stage_slab():
    """Does XLA's conv emitter efficiency track BATCH COUNT? The isolated
    stem measures 4.18 ms at (32,640,...) but 5.05 ms at (128,640,...) —
    3.3x better per pixel. Emulate batch 128 at batch 32 by slicing each
    image into four 161-row slabs (1-row top halo, zero row for the first)
    and convolving with no vertical padding; output rows stack back into
    the NHWC result with a free reshape."""
    from yolo_re_tpu.models import blocks as B

    cfg, fp, fs, wk = make_weights()
    w = fp["w"].astype(jnp.bfloat16)
    bias = fp["b"].astype(jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 640, 640, 3)), jnp.bfloat16)

    def slab_conv(a, nslab=4):
        bsz, H, W, c = a.shape
        sh = H // nslab
        ap = jnp.pad(a, ((0, 0), (1, 0), (0, 0), (0, 0)))
        slabs = jnp.stack([
            jax.lax.dynamic_slice_in_dim(ap, sh * s, sh + 1, axis=1)
            for s in range(nslab)], axis=1)          # (B, n, sh+1, W, C)
        slabs = slabs.reshape(bsz * nslab, sh + 1, W, c)
        y = jax.lax.conv_general_dilated(
            slabs, w, (2, 2), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y + bias
        y = (y * jax.nn.sigmoid(y)).astype(a.dtype)
        return y.reshape(bsz, H // 2, W // 2, -1)

    y_ref, _ = B.Conv.apply(cfg, fp, fs, x, train=False)
    for n in (2, 4, 8, 16):
        y = slab_conv(x, n)
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                    - y_ref.astype(jnp.float32))))
        t = device_timer(lambda a, nn=n: slab_conv(a, nn), x, iters=50)
        print(f"stem slab-batched n={n}: {t*1e3:.3f} ms (err {err:.1e})",
              flush=True)


def stage_slab2():
    """Slab-batching for stride-2 stem2 (64->128 @320^2) and a
    stage1-representative stride-1 conv (64->64 3x3 @160^2)."""
    rng = np.random.default_rng(0)

    def silu(v):
        return v * jax.nn.sigmoid(v)

    # --- stem2: k3 s2 p1, 64->128, input (32, 320, 320, 64) ---
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 128)) * 0.05,
                    jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    xn = jnp.asarray(rng.standard_normal((32, 320, 320, 64)), jnp.bfloat16)

    def direct_s2(a):
        y = jax.lax.conv_general_dilated(
            a, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return silu(y + bias).astype(a.dtype)

    def slab_s2(a, nslab):
        bsz, H, W, c = a.shape
        sh = H // nslab
        ap = jnp.pad(a, ((0, 0), (1, 0), (0, 0), (0, 0)))
        slabs = jnp.stack([
            jax.lax.dynamic_slice_in_dim(ap, sh * s, sh + 1, axis=1)
            for s in range(nslab)], axis=1)
        slabs = slabs.reshape(bsz * nslab, sh + 1, W, c)
        y = jax.lax.conv_general_dilated(
            slabs, w, (2, 2), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = silu(y + bias).astype(a.dtype)
        return y.reshape(bsz, H // 2, W // 2, -1)

    t = device_timer(direct_s2, xn, iters=50)
    print(f"stem2 direct    : {t*1e3:.3f} ms", flush=True)
    yr = direct_s2(xn)
    for n in (4, 8):
        err = float(jnp.max(jnp.abs(slab_s2(xn, n).astype(jnp.float32)
                                    - yr.astype(jnp.float32))))
        t = device_timer(lambda a, nn=n: slab_s2(a, nn), xn, iters=50)
        print(f"stem2 slab n={n} : {t*1e3:.3f} ms (err {err:.1e})",
              flush=True)

    # --- stage1-like: k3 s1 p1, 64->64, input (32, 160, 160, 64) ---
    w1 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05,
                     jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((32, 160, 160, 64)), jnp.bfloat16)

    def direct_s1(a):
        y = jax.lax.conv_general_dilated(
            a, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return silu(y + b1).astype(a.dtype)

    def slab_s1(a, nslab):
        bsz, H, W, c = a.shape
        sh = H // nslab
        ap = jnp.pad(a, ((0, 0), (1, 1), (0, 0), (0, 0)))
        slabs = jnp.stack([
            jax.lax.dynamic_slice_in_dim(ap, sh * s, sh + 2, axis=1)
            for s in range(nslab)], axis=1)
        slabs = slabs.reshape(bsz * nslab, sh + 2, W, c)
        y = jax.lax.conv_general_dilated(
            slabs, w1, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = silu(y + b1).astype(a.dtype)
        return y.reshape(bsz, H, W, -1)

    t = device_timer(direct_s1, x1, iters=50)
    print(f"s1 64ch direct    : {t*1e3:.3f} ms", flush=True)
    yr = direct_s1(x1)
    for n in (4, 8):
        err = float(jnp.max(jnp.abs(slab_s1(x1, n).astype(jnp.float32)
                                    - yr.astype(jnp.float32))))
        t = device_timer(lambda a, nn=n: slab_s1(a, nn), x1, iters=50)
        print(f"s1 64ch slab n={n} : {t*1e3:.3f} ms (err {err:.1e})",
              flush=True)


def stage_probe():
    """Floor probes: what do the epilogue and a bare write cost?"""
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((32, 320, 320, 64)), jnp.bfloat16)

    t = device_timer(lambda a: a * jax.nn.sigmoid(a), y, iters=50)
    print(f"silu over output (bf16): {t*1e3:.3f} ms", flush=True)
    yf = y.astype(jnp.float32)
    t = device_timer(
        lambda a: (a * jax.nn.sigmoid(a)).astype(jnp.bfloat16), yf, iters=50)
    print(f"silu f32 -> bf16 cast  : {t*1e3:.3f} ms", flush=True)
    t = device_timer(lambda a: a + jnp.bfloat16(1.0), y, iters=50)
    print(f"add-const over output  : {t*1e3:.3f} ms", flush=True)


def stage_xt():
    """Cost of the one-off phase-plane transpose (to_phase_planes) that
    feeds the stem kernel - the last self-documented piece of the stem
    pair's gap to its ~2.3 ms floor (docs/performance.md headroom table).
    Measured alone and as transpose+kernel vs the kernel on a pre-built
    xt (the difference is what fusing the transpose away could save)."""
    from yolo_re_tpu.ops.pallas.stem_kernel import (
        _stem_pallas,
        stem_conv_packed,
        to_phase_planes,
    )

    _, fp, fs, wk = make_weights()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 640, 640, 3)), jnp.bfloat16)

    t = device_timer(lambda a: to_phase_planes(a * 1.000001), x, iters=200)
    print(f"to_phase_planes alone        : {t*1e3:.3f} ms", flush=True)

    t = device_timer(lambda a: stem_conv_packed(a * 1.000001, wk), x,
                     iters=200)
    print(f"transpose + stem kernel      : {t*1e3:.3f} ms", flush=True)

    xt = to_phase_planes(x)

    def kern_only(a):
        return _stem_pallas(a * 1.000001, wk["w2"], wk["b2"], ho=320,
                            wo=320, act=True, dtype=jnp.bfloat16)

    t = device_timer(kern_only, xt, iters=200)
    print(f"stem kernel on pre-built xt  : {t*1e3:.3f} ms", flush=True)



if __name__ == "__main__":
    {"kernel": stage_kernel, "bench": stage_bench,
     "probe": stage_probe, "stem2": stage_stem2, "model": stage_model,
     "slab": stage_slab, "slab2": stage_slab2,
     "xt": stage_xt}[STAGE]()
