"""Dissect stage1's training cost and prototype packed train-mode convs.

Round-3 follow-up to the per-layer backward profile (profile_train.py
--per-layer), which attributed 73.2 ms of the 182 ms train step (40%) to
stage1 — a RepNCSPELAN4 whose working tensors are 32/64-channel at 160²,
i.e. the T(8,128) lane-padded regime where every HBM crossing pays 2-4x
and the MXU runs quarter-full. ~338 GFLOP in 73 ms is ~9% utilization.

Stages (STAGE env var):
  block   — stage1 fwd / fwd+bwd in isolation, train vs eval-unfused,
            to split conv cost from BN-stat + dual-RepConv overhead.
  conv    — single-conv microbenches: each stage1 conv shape, fwd+bwd,
            XLA unpacked vs width-packed (p=2/4) with the packed kernel
            built from raw weights INSIDE the traced function (autodiff
            then yields exact unpacked grads through the packing).
  stem    — stem1 (3->64 s2 @640) train-mode fwd+bwd: XLA vs slab-batched
            (docs/performance.md: slabbing is bit-exact for cin=3 and
            3.3x better per pixel at inference; does it help the train
            step where the weight-grad contracts over batch?).

Usage:  python scripts/tpu_probe_train_stage1.py            # all stages
        STAGE=conv python scripts/tpu_probe_train_stage1.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from yolo_re_tpu.utils.profiling import device_timer  # noqa: E402

B, H, W = 32, 160, 160
DT = jnp.bfloat16


def timed_grad(fn, *args, wrt=(0,)):
    """fwd+bwd seconds: value_and_grad of sum(fn(args)) wrt args[wrt]."""
    def obj(*a):
        return fn(*a).astype(jnp.float32).sum()

    g = jax.value_and_grad(obj, argnums=wrt)

    def runner(x, *rest):
        val, grads = g(x, *rest)
        return val + sum(gi.astype(jnp.float32).ravel()[0]
                         for gi in jax.tree_util.tree_leaves(grads))
    return device_timer(runner, *args, iters=10)


def stage_block():
    from yolo_re_tpu.models.blocks import RepNCSPELAN4

    cfg = RepNCSPELAN4.Config(128, 256, 128, 64, num_repeats=1)
    params, stats = RepNCSPELAN4.init(jax.random.key(0), cfg)
    params = jax.tree.map(lambda p: p, params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, H, W, 128)), DT)

    def fwd_train(x, p):
        return RepNCSPELAN4.apply(cfg, p, stats, x, train=True)[0]

    def fwd_eval(x, p):
        return RepNCSPELAN4.apply(cfg, p, stats, x, train=False)[0]

    t_ft = device_timer(lambda x, p: fwd_train(x, p), x, params) * 1e3
    t_fe = device_timer(lambda x, p: fwd_eval(x, p), x, params) * 1e3

    def obj_train(p, x):
        return fwd_train(x, p).astype(jnp.float32).sum()

    def obj_eval(p, x):
        return fwd_eval(x, p).astype(jnp.float32).sum()

    def bwd_runner(obj):
        def run(x, p):
            val, grads = jax.value_and_grad(obj)(p, x)
            return val + sum(g.astype(jnp.float32).ravel()[0]
                             for g in jax.tree_util.tree_leaves(grads))
        return run

    t_bt = device_timer(bwd_runner(obj_train), x, params) * 1e3
    t_be = device_timer(bwd_runner(obj_eval), x, params) * 1e3
    print(f"stage1 fwd   train {t_ft:6.2f} ms | eval-unfused {t_fe:6.2f} ms")
    print(f"stage1 f+b   train {t_bt:6.2f} ms | eval-unfused {t_be:6.2f} ms")
    print(f"  -> BN-stat+dual-RepConv overhead: fwd {t_ft - t_fe:.2f} ms, "
          f"f+b {t_bt - t_be:.2f} ms")


def _pack_w(x, p):
    """(B,H,W,C) -> (B,H,W/p,p*C) width packing (lane fill)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // p, p * c)


def _unpack_w(x, p):
    b, h, wp, pc = x.shape
    return x.reshape(b, h, wp * p, pc // p)


def _packed_kernel_3x3(w, p, cin, cout):
    """Width-packed 3x3 kernel from the raw HWIO kernel, in-trace —
    delegates to the PRODUCT packing (ops/packed_elan_train._pack_same_jnp)
    so the probe always measures exactly what the train path runs."""
    del cin, cout  # inferred from w by the product packer
    from yolo_re_tpu.ops.packed_elan_train import _pack_same_jnp
    return _pack_same_jnp(w, p)


def conv_micro():
    from yolo_re_tpu.ops.conv import conv2d

    rng = np.random.default_rng(0)
    shapes = [
        ("conv_in 1x1 128->128", 1, 128, 128),
        ("cv 3x3 64->64", 3, 64, 64),
        ("csp 1x1 64->32", 1, 64, 32),
        ("rep 3x3 32->32", 3, 32, 32),
        ("conv_out 1x1 256->256", 1, 256, 256),
    ]
    for name, k, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, cin)), DT)
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, DT)
        t = timed_grad(
            lambda x, w, k=k: conv2d(x, w, stride=1, padding=k // 2),
            x, w, wrt=(0, 1)) * 1e3
        flops = 2 * B * H * W * k * k * cin * cout * 3  # fwd+2 grad convs
        print(f"{name:24s} XLA      f+b {t:6.2f} ms "
              f"({flops / t / 1e9:5.1f} TF/s)")

        if cout > 128 or k != 3:
            continue
        p = 128 // cout
        xp = _pack_w(x, p)

        def packed(xp, w, p=p, cin=cin, cout=cout):
            wp = _packed_kernel_3x3(w, p, cin, cout)
            return conv2d(xp, wp, stride=1, padding=1)

        # parity first
        ref = conv2d(x, w, stride=1, padding=1)
        got = _unpack_w(packed(xp, w), p)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        tp = timed_grad(packed, xp, w, wrt=(0, 1)) * 1e3
        print(f"{name:24s} packed{p}x f+b {tp:6.2f} ms "
              f"(err {err:.2e}) {'WIN' if tp < t else 'lose'} "
              f"{t / tp:.2f}x")


def stem_micro():
    from yolo_re_tpu.ops.conv import conv_bn_act, init_conv_bn

    rng = np.random.default_rng(0)
    params, stats = init_conv_bn(jax.random.key(0), 3, 64, 3)
    x = jnp.asarray(rng.standard_normal((32, 640, 640, 3)), DT)

    def stem_plain(x, p):
        return conv_bn_act(p, stats, x, stride=2, padding=1, train=True)[0]

    # wrt=(1,): weight grads ONLY — the image needs no input grad, which
    # is what the real train step computes for stem1.
    t = timed_grad(stem_plain, x, params, wrt=(1,)) * 1e3
    t_f = device_timer(lambda x, p: stem_plain(x, p), x, params) * 1e3
    print(f"stem1 train fwd {t_f:6.2f} ms | f+b (weight grads only) "
          f"{t:6.2f} ms")


STAGES = {"block": stage_block, "conv": conv_micro, "stem": stem_micro}


def stem_s2d():
    """Train-mode stem1 (3->64 s2 @640) reformulated via space-to-depth:
    x -> (B,320,320,12) phase planes, stride-1 2x2 conv with a rearranged
    kernel. Same sums re-associated; the question is whether the
    weight-grad conv (8 ms under the native stride-2 lowering, ~15x off
    roofline) lowers better when the contraction has 12 input channels
    and no stride. Inference measured s2d SLOWER for the forward alone
    (docs/performance.md 'What lost'); training is a different trade."""
    from yolo_re_tpu.ops.conv import BN_EPS, BN_MOMENTUM, init_conv_bn

    rng = np.random.default_rng(0)
    params, stats = init_conv_bn(jax.random.key(0), 3, 64, 3)
    x = jnp.asarray(rng.standard_normal((32, 640, 640, 3)), DT)

    def pack_kernel(w):
        # raw tap (kh, kw) with SAME pad 1 at stride 2: output (i,j) reads
        # raw (2i+kh-1, 2j+kw-1) = phase ((kh-1)%2, (kw-1)%2) of s2d cell
        # (i + (kh-1)//2 - ?, ...). Use explicit enumeration with a 2x2
        # window at pad 1 in s2d space... simpler: pad raw by 1, s2d the
        # padded tensor of size (642)^2 -> (321,321,12), window 2x2 valid.
        wp = jnp.zeros((2, 2, 12, 64), w.dtype)
        for kh in range(3):
            for kw in range(3):
                ph, oh = (kh % 2), kh // 2
                pw, ow = (kw % 2), kw // 2
                c0 = (ph * 2 + pw) * 3
                wp = wp.at[oh, ow, c0:c0 + 3, :].add(w[kh, kw])
        return wp

    def fwd(x, p, train_stats=True):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # 642x642
        b, h, w, c = xp.shape
        xs = xp.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        from yolo_re_tpu.ops.packed_elan_train import _conv_f32
        y = _conv_f32(xs, pack_kernel(p["w"]).astype(xs.dtype), (1, 1),
                      ((0, 0), (0, 0)))
        y = y.astype(jnp.bfloat16)
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.maximum(jnp.mean(jnp.square(yf), axis=(0, 1, 2))
                          - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + BN_EPS) * p["scale"]
        y = y * inv.astype(y.dtype) + (p["bias"] - mean * inv).astype(y.dtype)
        return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

    # parity vs the native path
    from yolo_re_tpu.ops.conv import conv_bn_act
    ref = conv_bn_act(params, stats, x, stride=2, padding=1, train=True)[0]
    got = fwd(x, params)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    t_f = device_timer(lambda x, p: fwd(x, p), x, params) * 1e3
    t = timed_grad(fwd, x, params, wrt=(1,)) * 1e3
    print(f"stem1 s2d  train fwd {t_f:6.2f} ms | f+b (weight grads) "
          f"{t:6.2f} ms | err vs native {err:.2e}")


def conv_micro2():
    """stage2/fpn2-geometry conv shapes at 80 squared (hidden 256, block
    128): the sub-128-lane pieces are the csp interiors at 64ch."""
    from yolo_re_tpu.ops.conv import conv2d

    global B, H, W
    rng = np.random.default_rng(0)
    shapes = [
        ("csp-entry 1x1 128->64", 1, 128, 64),
        ("rep 3x3 64->64 @80", 3, 64, 64),
        ("csp3 1x1 128->128", 1, 128, 128),
        ("cv 3x3 128->128 @80", 3, 128, 128),
    ]
    for name, k, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((32, 80, 80, cin)), DT)
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, DT)
        t = timed_grad(
            lambda x, w, k=k: conv2d(x, w, stride=1, padding=k // 2),
            x, w, wrt=(0, 1)) * 1e3
        flops = 2 * 32 * 80 * 80 * k * k * cin * cout * 3
        print(f"{name:24s} XLA      f+b {t:6.2f} ms "
              f"({flops / t / 1e9:5.1f} TF/s)")
        if cout != 64 or k != 3:
            continue
        xp = x.reshape(32, 80, 40, 2 * cin)

        def packed(xp, w):
            wp = _packed_kernel_3x3(w, 2, cin, cout)
            return conv2d(xp, wp, stride=1, padding=1)

        tp = timed_grad(packed, xp, w, wrt=(0, 1)) * 1e3
        print(f"{name:24s} packed2x f+b {tp:6.2f} ms "
              f"{'WIN' if tp < t else 'lose'} {t / tp:.2f}x")


def csp_stage2():
    """Whole-CSP probe at stage2/fpn2 geometry: RepNCSP(128->128, hidden
    64) at 80 squared, direct train graph vs a p=2 width-packed interior.

    The packed version needs no relayout OPS: the canonical packed layout
    [pix0-chans | pix1-chans] is byte-identical to NHWC, so entry and
    exit are plain reshapes; the 1x1s become block-structured kernels
    with zero FLOP inflation and only the 3x3s pay 2x (tiny at 64ch).

    MEASURED OUTCOME (2026-08, one v5e): 1.34x fwd+bwd IN ISOLATION
    (7.96 -> 5.94 ms) — but the full product implementation was an
    end-to-end NEGATIVE both ways (train 202.8 -> 201.4 img/s, inference
    804 -> 769, 2x2 A/B) and was reverted: in context the entry/exit
    reshapes are real T(8,128) tile RELAYOUTS (HBM stores the tiled
    layout, not the byte order), one on each side of each of 4 CSPs.
    See docs/performance.md "What lost". This stage remains as the
    recorded experiment.
    """
    from yolo_re_tpu.models.blocks import RepNCSP
    from yolo_re_tpu.ops.packed_elan_train import (
        _canon, _pack_same_jnp, _pconv_bn)

    cfg = RepNCSP.Config(128, 128, num_repeats=1)
    params, stats = RepNCSP.init(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (32, 80, 80, 128)), DT)
    hb = 64

    def direct(x, p):
        return RepNCSP.apply(cfg, p, stats, x, train=True)[0]

    def pack_entry(w):
        # 1x1 128->64 -> block-diag (1,1,256,128) emitting packed 64ch
        wp = jnp.zeros((1, 1, 256, 128), w.dtype)
        for q in range(2):
            wp = wp.at[0, 0, q * 128:(q + 1) * 128,
                       q * hb:(q + 1) * hb].set(w[0, 0])
        return wp

    def pack_conv3(w):
        # 1x1 128->128 over concat[r_q0 r_q1 y2_q0 y2_q1]
        wp = jnp.zeros((1, 1, 256, 256), w.dtype)
        for q in range(2):
            wp = wp.at[0, 0, q * hb:(q + 1) * hb,
                       q * 128:(q + 1) * 128].set(w[0, 0, :hb])
            wp = wp.at[0, 0, 128 + q * hb:128 + (q + 1) * hb,
                       q * 128:(q + 1) * 128].set(w[0, 0, hb:])
        return wp

    c2_64, c2_128 = _canon(2, hb), _canon(2, 128)

    def packed(x, P):
        B_, H_, W_, _ = x.shape
        z = x.reshape(B_, H_, W_ // 2, 256)
        m, _ = _pconv_bn(z, pack_entry(P["conv1"]["w"]), P["conv1"],
                         stats["conv1"], c2_64)
        r = m
        for pb, sb in zip(P["bottlenecks"], stats["bottlenecks"]):
            rp, rs = pb["conv1"], sb["conv1"]
            t1, _ = _pconv_bn(r, _pack_same_jnp(rp["conv1"]["w"], 2),
                              rp["conv1"], rs["conv1"], c2_64, act=False)
            t2, _ = _pconv_bn(r, _pack_same_jnp(rp["conv2"]["w"], 2),
                              rp["conv2"], rs["conv2"], c2_64, act=False)
            t = t1 + t2
            t = (t * jax.nn.sigmoid(t)).astype(jnp.bfloat16)
            t, _ = _pconv_bn(t, _pack_same_jnp(pb["conv2"]["w"], 2),
                             pb["conv2"], sb["conv2"], c2_64)
            r = r + t
        y2, _ = _pconv_bn(z, pack_entry(P["conv2"]["w"]), P["conv2"],
                          stats["conv2"], c2_64)
        y3, _ = _pconv_bn(jnp.concatenate([r, y2], -1),
                          pack_conv3(P["conv3"]["w"]), P["conv3"],
                          stats["conv3"], c2_128)
        return y3.reshape(B_, H_, W_, 128)

    ref = jax.jit(direct)(x, params)
    got = jax.jit(packed)(x, params)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    t_df = device_timer(direct, x, params) * 1e3
    t_pf = device_timer(packed, x, params) * 1e3
    t_d = timed_grad(direct, x, params, wrt=(0, 1)) * 1e3
    t_p = timed_grad(packed, x, params, wrt=(0, 1)) * 1e3
    print(f"csp@stage2 fwd  direct {t_df:6.2f} ms | packed {t_pf:6.2f} ms "
          f"| {t_df / t_pf:4.2f}x | err {err:.2e}")
    print(f"csp@stage2 f+b  direct {t_d:6.2f} ms | packed {t_p:6.2f} ms "
          f"| {t_d / t_p:4.2f}x {'WIN' if t_p < t_d else 'lose'}")


def stem_pair():
    """Train-mode stem1+stem2 (3->64->128, s2 each, @640) f+b: direct XLA
    graph vs the packed Pallas pair (ops/stem_train.py — phase-plane
    forward, 2-MXU-pass weight grad, packed BN, row-pair stem2)."""
    from yolo_re_tpu.models.blocks import Conv, ConvConfig
    from yolo_re_tpu.ops.stem_train import (
        stem1_conv_train, stem2_conv_from_packed_train)

    cfg1 = ConvConfig(3, 64, kernel_size=3, stride=2)
    cfg2 = ConvConfig(64, 128, kernel_size=3, stride=2)
    p1, s1 = Conv.init(jax.random.key(0), cfg1)
    p2, s2 = Conv.init(jax.random.key(1), cfg2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (32, 640, 640, 3)), DT)

    import os
    os.environ["YOLO_TPU_STEM_TRAIN"] = "0"

    def direct(x, ps):
        y, _ = Conv.apply(cfg1, ps[0], s1, x, train=True)
        z, _ = Conv.apply(cfg2, ps[1], s2, y, train=True)
        return z

    def packed(x, ps):
        y, _ = stem1_conv_train(cfg1, ps[0], s1, x)
        z, _ = stem2_conv_from_packed_train(cfg2, ps[1], s2, y)
        return z

    ps = (p1, p2)
    ref = jax.jit(direct)(x, ps)
    got = jax.jit(packed)(x, ps)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    t_df = device_timer(direct, x, ps) * 1e3
    t_pf = device_timer(packed, x, ps) * 1e3
    # weight grads only, like the real step (no image grad)
    t_d = timed_grad(direct, x, ps, wrt=(1,)) * 1e3
    t_p = timed_grad(packed, x, ps, wrt=(1,)) * 1e3
    del os.environ["YOLO_TPU_STEM_TRAIN"]
    print(f"stem pair fwd  direct {t_df:6.2f} ms | packed {t_pf:6.2f} ms "
          f"| {t_df / t_pf:4.2f}x | err {err:.2e}")
    print(f"stem pair f+b  direct {t_d:6.2f} ms | packed {t_p:6.2f} ms "
          f"| {t_d / t_p:4.2f}x {'WIN' if t_p < t_d else 'lose'}")


def adown_train():
    """Decompose down1's train-mode cost (per-layer profile: 13.8 ms f+b,
    the largest non-closed item after the packed stage1/stem work).

    down1 = ADown(256, 256) @160²: avgpool(2,1,0) -> chunk(2) ->
    [conv3x3 s2 128->128 | maxpool(3,2,1) + conv1x1 128->128] -> concat.
    All tensors are >=128 lanes (no padding tax) — so any headroom is in
    the POOLING lowering (reduce_window fwd + select-and-scatter bwd) and
    epilogue fusion, not lane alignment. Micro rows isolate each op,
    including a shift-add avgpool alternative vs reduce_window.
    """
    from yolo_re_tpu.models.blocks import ADown
    from yolo_re_tpu.ops.conv import avg_pool2d, conv2d, max_pool2d

    rng = np.random.default_rng(0)
    cfg = ADown.Config(256, 256)
    params, stats = ADown.init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((B, H, W, 256)), DT)

    def block(x, p):
        return ADown.apply(cfg, p, stats, x, train=True)[0]

    t_f = device_timer(block, x, params) * 1e3
    t_fb = timed_grad(block, x, params, wrt=(0, 1)) * 1e3
    print(f"down1 block     fwd {t_f:6.2f} ms | f+b {t_fb:6.2f} ms "
          f"(profile said 13.8)")

    # --- op micro rows (all with input grads, as in the real step) ---
    xa = jnp.asarray(rng.standard_normal((B, H - 1, W - 1, 128)), DT)
    t = timed_grad(lambda x: avg_pool2d(x, 2, 1, 0), x) * 1e3
    print(f"avgpool 2x2 s1 256ch @160   f+b {t:6.2f} ms")

    def avg_shift(x):
        # stride-1 2x2 mean via 4 shifted slices (no reduce_window)
        s = (x[:, :-1, :-1] + x[:, 1:, :-1] + x[:, :-1, 1:] + x[:, 1:, 1:])
        return s * 0.25

    ref = avg_pool2d(x, 2, 1, 0)
    got = avg_shift(x)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    t = timed_grad(avg_shift, x) * 1e3
    print(f"avgpool shift-add variant   f+b {t:6.2f} ms (err {err:.2e})")

    t = timed_grad(lambda x: max_pool2d(x, 3, 2, 1), xa) * 1e3
    print(f"maxpool 3x3 s2 128ch @159   f+b {t:6.2f} ms")

    w3 = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, DT)
    t = timed_grad(lambda x, w: conv2d(x, w, stride=2, padding=1),
                   xa, w3, wrt=(0, 1)) * 1e3
    fl = 2 * B * 80 * 80 * 9 * 128 * 128 * 3
    print(f"conv3x3 s2 128->128 @159    f+b {t:6.2f} ms "
          f"({fl / t / 1e9:5.1f} TF/s)")

    xm = jnp.asarray(rng.standard_normal((B, 80, 80, 128)), DT)
    w1 = jnp.asarray(rng.standard_normal((1, 1, 128, 128)) * 0.05, DT)
    t = timed_grad(lambda x, w: conv2d(x, w, stride=1, padding=0),
                   xm, w1, wrt=(0, 1)) * 1e3
    print(f"conv1x1 128->128 @80        f+b {t:6.2f} ms")

    # --- block with shift-add avgpool substituted (candidate rewrite) ---
    from yolo_re_tpu.models.blocks import Conv

    def block_shift(x, p):
        cs, cp = ADown._sub(cfg)
        xa = avg_shift(x)
        half = xa.shape[-1] // 2
        x1, x2 = xa[..., :half], xa[..., half:]
        y1, _ = Conv.apply(cs, p["conv_stride"], stats["conv_stride"],
                           x1, train=True)
        x2 = max_pool2d(x2, 3, 2, 1)
        y2, _ = Conv.apply(cp, p["conv_pool"], stats["conv_pool"],
                           x2, train=True)
        return jnp.concatenate([y1, y2], axis=-1)

    ref = jax.jit(block)(x, params)
    got = jax.jit(block_shift)(x, params)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    t_f2 = device_timer(block_shift, x, params) * 1e3
    t_fb2 = timed_grad(block_shift, x, params, wrt=(0, 1)) * 1e3
    print(f"block shift-avg fwd {t_f2:6.2f} ms | f+b {t_fb2:6.2f} ms "
          f"(err {err:.2e}) {'WIN' if t_fb2 < t_fb else 'lose'} "
          f"{t_fb / t_fb2:.2f}x")


def wgrad_micro():
    """Decompose fwd / dx / dW per conv shape for the layers dominating
    the post-ADown backward (per-layer table: fpn2 bwd/fwd 3.3x, stage2
    3.1x, fpn1 4.5x vs the ~2.0 theoretical). Each VJP piece is timed in
    isolation: the vjp runs inside the traced fn with dy as the chained
    arg, and returning only one piece lets XLA DCE the other (and the
    unused primal). TF/s are per conv pass (fwd==dx==dW FLOPs)."""
    from yolo_re_tpu.ops.conv import conv2d

    rng = np.random.default_rng(0)
    shapes = [
        ("1x1 128->64 @80", 1, 128, 64, 80),
        ("3x3 64->64 @80", 3, 64, 64, 80),
        ("1x1 128->128 @80", 1, 128, 128, 80),
        ("3x3 128->128 @80", 3, 128, 128, 80),
        ("1x1 256->128 @40", 1, 256, 128, 40),
        ("3x3 128->128 @40", 3, 128, 128, 40),
    ]
    for name, k, cin, cout, hw in shapes:
        x = jnp.asarray(rng.standard_normal((B, hw, hw, cin)), DT)
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * .05, DT)
        dy = jnp.asarray(rng.standard_normal((B, hw, hw, cout)), DT)

        def f(x, w, k=k):
            # cast the f32 accumulation to DT like the product epilogue
            # (ops/conv.py bf16 path) so the bf16 dy cotangent typechecks
            return conv2d(x, w, stride=1, padding=k // 2).astype(DT)

        def dx_only(dy, x, w):
            return jax.vjp(f, x, w)[1](dy)[0]

        def dw_only(dy, x, w):
            return jax.vjp(f, x, w)[1](dy)[1]

        # iters=200: these ops are sub-ms, and the default 10 iterations
        # leave ~2.5 ms/iter of amortized tunnel round-trip in the number
        # (every shape measured "2.5-3 ms" at iters=10 — a pure floor).
        t_f = device_timer(f, x, w, iters=200) * 1e3
        t_dx = device_timer(dx_only, dy, x, w, iters=200) * 1e3
        t_dw = device_timer(dw_only, dy, x, w, iters=200) * 1e3
        fl = 2 * B * hw * hw * k * k * cin * cout
        print(f"{name:17s} fwd {t_f:5.2f} ms ({fl / t_f / 1e9:5.1f} TF/s)"
              f" | dx {t_dx:5.2f} ({fl / t_dx / 1e9:5.1f})"
              f" | dW {t_dw:5.2f} ({fl / t_dw / 1e9:5.1f})", flush=True)


STAGES["stem_s2d"] = stem_s2d
STAGES["conv2"] = conv_micro2
STAGES["wgrad"] = wgrad_micro
STAGES["csp"] = csp_stage2
STAGES["stem_pair"] = stem_pair
STAGES["adown"] = adown_train


if __name__ == "__main__":
    which = os.environ.get("STAGE")
    print(f"devices: {jax.devices()}")
    for name, fn in STAGES.items():
        if which and name != which:
            continue
        print(f"--- {name} ---")
        fn()
