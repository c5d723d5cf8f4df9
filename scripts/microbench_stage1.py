"""Microbenchmark stage1's sub-convs and a width-packed rewrite.

stage1 (RepNCSPELAN4 128->256 @160^2) measures 11.6 ms/batch-32 against a
~3 ms bandwidth roofline (docs/performance.md). The inner convs run at
32/64 channels — half/quarter of the 128 TPU lanes. This script times each
distinct conv shape in the fused inference graph in isolation, plus a
"width-packed" variant: view (B, H, W, C) as (B, H, W/p, p*C) with
p = 128/C (a free reshape in NHWC row-major) and convolve with a
block-structured (kh, 3, p*C, p*C) kernel — p x FLOPs, full lanes.

Run on the real TPU: python scripts/microbench_stage1.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_re_tpu.utils.profiling import device_timer

B, S = 32, 160
DT = jnp.bfloat16


def pack_kernel(w: np.ndarray, p: int) -> np.ndarray:
    """(kh, kw, C, C) HWIO -> (kh, n_taps, p*C, p*C) packed-width kernel.

    Output pixel at packed lane block q_out (phase) and packed col j reads
    input pixel w_abs = p*j + q_out + (kw - kw//2... ) — derived below for
    SAME padding with odd kw. Packed tap offsets collapse to {-1, 0, +1}.
    """
    kh, kw, cin, cout = w.shape
    assert cin == cout, "packing helper assumes C_in == C_out"
    c = cin
    half = kw // 2
    wp = np.zeros((kh, 3, p * c, p * c), w.dtype)
    for q_out in range(p):          # output pixel phase within packed col
        for k in range(kw):         # original width tap
            w_off = q_out + k - half          # input pixel offset from p*j
            tap = w_off // p                  # packed col offset (floor)
            q_in = w_off - tap * p            # input phase
            assert -1 <= tap <= 1
            wp[:, tap + 1, q_in * c:(q_in + 1) * c,
               q_out * c:(q_out + 1) * c] += w[:, k]
    return wp


def conv_direct(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (jax.nn.silu(y + b)).astype(x.dtype)


def conv_packed(xp, wp, b, p):
    # xp: (B, H, W/p, p*C); SAME over packed grid with the 3-tap width dim
    kh = wp.shape[0]
    y = jax.lax.conv_general_dilated(
        xp, wp, (1, 1), ((kh // 2, kh // 2), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    c = b.shape[0]
    bp = jnp.tile(b, p)
    return (jax.nn.silu(y + bp)).astype(xp.dtype)


def check_equiv(c, k, p, rng):
    x = rng.standard_normal((2, 16, 16, c)).astype(np.float32)
    w = (rng.standard_normal((k, k, c, c)) * 0.1).astype(np.float32)
    b = (rng.standard_normal((c,)) * 0.1).astype(np.float32)
    ref = conv_direct(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    xp = jnp.asarray(x).reshape(2, 16, 16 // p, p * c)
    wp = jnp.asarray(pack_kernel(w, p))
    got = conv_packed(xp, wp, jnp.asarray(b), p).reshape(2, 16, 16, c)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    assert err < 1e-4, f"pack mismatch c={c} k={k} p={p}: {err}"


def bench_shape(name, cin, cout, k, flops_note=""):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, S, cin)), DT)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, DT)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.05, DT)
    t = device_timer(lambda a: conv_direct(a, w, b), x, iters=30)
    gf = 2 * B * S * S * cin * cout * k * k / 1e9
    print(f"{name:28s} direct {t*1e3:7.3f} ms  {gf/t/1e3:6.1f} TF/s "
          f"({gf:6.1f} GF) {flops_note}")
    return t


def bench_packed(name, c, k):
    p = 128 // c
    rng = np.random.default_rng(0)
    check_equiv(c, k, p, rng)
    xp = jnp.asarray(rng.standard_normal((B, S, S // p, p * c)), DT)
    w = (rng.standard_normal((k, k, c, c)) * 0.05).astype(np.float32)
    wp = jnp.asarray(pack_kernel(w, p), DT)
    b = jnp.asarray(rng.standard_normal((c,)) * 0.05, DT)
    t = device_timer(lambda a: conv_packed(a, wp, b, p), xp, iters=30)
    gf = 2 * B * S * S * c * c * k * k / 1e9       # useful FLOPs
    print(f"{name:28s} packed {t*1e3:7.3f} ms  {gf/t/1e3:6.1f} TF/s "
          f"useful (x{p} lanes)")
    return t


def main():
    print(f"batch {B} @ {S}^2, bf16, incl. bias+SiLU epilogue; "
          f"device={jax.devices()[0].platform}")
    # the fused-inference stage1 graph, one line per distinct conv shape
    bench_shape("conv_in 1x1 128->128", 128, 128, 1)
    bench_shape("ncsp conv1/2 1x1 64->32", 64, 32, 1)
    bench_shape("rep/bottleneck 3x3 32->32", 32, 32, 3)
    bench_shape("ncsp conv3 1x1 64->64", 64, 64, 1)
    bench_shape("branch 3x3 64->64", 64, 64, 3)
    bench_shape("conv_out 1x1 256->256", 256, 256, 1)
    print()
    bench_packed("rep/bottleneck 3x3 32->32", 32, 3)
    bench_packed("branch 3x3 64->64", 64, 3)
    bench_packed("ncsp conv3 1x1 64->64", 64, 1)


if __name__ == "__main__" and not os.environ.get("STAGE"):
    main()


# ---------------------------------------------------------------------------
# Full stage1 chain: current fused graph vs width-packed rewrite
# ---------------------------------------------------------------------------

def _conv(x, w, b, pad):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1),
        ((pad, pad), (pad, pad)) if isinstance(pad, int) else pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (jax.nn.silu(y + b)).astype(x.dtype)


def make_stage1_weights(rng, cin=128, h=128, b=64):
    def wb(k, ci, co):
        return (rng.standard_normal((k, k, ci, co)).astype(np.float32)
                * (0.4 / np.sqrt(k * k * ci)),
                rng.standard_normal((co,)).astype(np.float32) * 0.02)
    hb = b // 2
    def csp():
        return {"conv1": wb(1, b, hb), "conv2": wb(1, b, hb),
                "rep": wb(3, hb, hb), "bconv": wb(3, hb, hb),
                "conv3": wb(1, 2 * hb, b)}
    return {"conv_in": wb(1, cin, h), "csp1": csp(), "cv1": wb(3, b, b),
            "csp2": csp(), "cv2": wb(3, b, b),
            "conv_out": wb(1, h + 2 * b, 256)}


def stage1_direct(x, W, h=128):
    y = _conv(x, *W["conv_in"], 0)
    ya, yb = y[..., :h // 2], y[..., h // 2:]
    def csp(z, C):
        m = _conv(z, *C["conv1"], 0)
        r = _conv(m, *C["rep"], 1)
        r = _conv(r, *C["bconv"], 1) + m          # residual
        y2 = _conv(z, *C["conv2"], 0)
        return _conv(jnp.concatenate([r, y2], -1), *C["conv3"], 0)
    y1 = _conv(csp(yb, W["csp1"]), *W["cv1"], 1)
    y2 = _conv(csp(y1, W["csp2"]), *W["cv2"], 1)
    return _conv(jnp.concatenate([ya, yb, y1, y2], -1), *W["conv_out"], 0)


def pack_general(w, p, cin, cout, perm_in=None, perm_out=None):
    """HWIO (kh,kw,cin,cout) -> packed (kh, n_taps, p*cin, p*cout).

    perm_in/perm_out: optional lane orders of the ACTUAL packed input /
    desired output, given as index arrays of length p*cin / p*cout mapping
    lane -> (pixel_phase * cin + channel) canonical index.
    """
    kh, kw, ci, co = w.shape
    assert (ci, co) == (cin, cout)
    half = kw // 2
    wp = np.zeros((kh, 3 if kw > 1 else 1, p * cin, p * cout), w.dtype)
    for q_out in range(p):
        for k in range(kw):
            off = q_out + k - half
            tap = off // p
            q_in = off - tap * p
            wp[:, tap + (1 if kw > 1 else 0),
               q_in * cin:(q_in + 1) * cin,
               q_out * cout:(q_out + 1) * cout] += w[:, k]
    if perm_in is not None:
        wp = wp[:, :, perm_in, :]
    if perm_out is not None:
        inv = np.empty_like(perm_out)
        inv[perm_out] = np.arange(len(perm_out))
        wp = wp[:, :, :, inv]
    return wp


def _pconv(x, w, b, p, kh):
    """b must already be packed (length == w.shape[-1])."""
    pad_h = kh // 2
    pad_w = 1 if w.shape[1] > 1 else 0
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (jax.nn.silu(y + b)).astype(x.dtype)


def make_packed_stage1(W, cin=128, h=128, b=64):
    """Transform fused stage1 weights into the packed-graph weights."""
    hb = b // 2
    P = {}
    # conv_in at p=2 with output lanes reordered to [ya_p0, ya_p1, yb_p0, yb_p1]
    w, bias = W["conv_in"]
    wp = pack_general(w, 2, cin, h)
    order = np.concatenate([np.arange(0, hb * 2),            # ya pix0
                            np.arange(h, h + hb * 2),         # ya pix1
                            np.arange(hb * 2, h),              # yb pix0
                            np.arange(h + hb * 2, 2 * h)])     # yb pix1
    P["conv_in"] = (wp[:, :, :, order], np.tile(bias, 2)[order])

    def csp(C):
        out = {}
        out["conv1"] = (pack_general(C["conv1"][0], 2, b, hb),
                        np.tile(C["conv1"][1], 2))
        out["conv2"] = (pack_general(C["conv2"][0], 2, b, hb),
                        np.tile(C["conv2"][1], 2))
        out["rep"] = (pack_general(C["rep"][0], 4, hb, hb),
                      np.tile(C["rep"][1], 4))
        out["bconv"] = (pack_general(C["bconv"][0], 4, hb, hb),
                        np.tile(C["bconv"][1], 4))
        # conv3 input lanes actually [m_p0, m_p1, c2_p0, c2_p1]; canonical
        # p=2-packed concat(m, c2) is [m_p0, c2_p0, m_p1, c2_p1]
        perm_in = np.concatenate([np.arange(0, hb), np.arange(2 * hb, 3 * hb),
                                  np.arange(hb, 2 * hb), np.arange(3 * hb, 4 * hb)])
        out["conv3"] = (pack_general(C["conv3"][0], 2, 2 * hb, b,
                                     perm_in=None)[:, :, perm_in, :],
                        np.tile(C["conv3"][1], 2))
        return out
    P["csp1"], P["csp2"] = csp(W["csp1"]), csp(W["csp2"])
    P["cv1"] = (pack_general(W["cv1"][0], 2, b, b), np.tile(W["cv1"][1], 2))
    P["cv2"] = (pack_general(W["cv2"][0], 2, b, b), np.tile(W["cv2"][1], 2))
    # conv_out: input lanes [A_p0 A_p1 B_p0 B_p1 C_p0 C_p1 D_p0 D_p1]
    # canonical p=2 packing of concat(A,B,C,D) = [A_p0 B_p0 C_p0 D_p0 | A_p1 ...]
    hh = h // 2
    cat = h + 2 * b
    seg = []
    for q in range(2):
        for s, w_ in enumerate([hh, hh, b, b]):
            base = sum([hh, hh, b, b][:s]) * 2
            seg.append(np.arange(base + q * w_, base + (q + 1) * w_))
    perm_in = np.concatenate(seg)   # actual-lane -> canonical? build inverse below
    wo, bo = W["conv_out"]
    wop = pack_general(wo, 2, cat, 256)
    # wop rows are canonical [pix0(cat), pix1(cat)]; actual input lane L holds
    # canonical index perm_in[L]? No: we list, for canonical position i, the
    # actual lane seg-order. Simpler: build actual->canonical map directly.
    actual_to_canon = np.empty(2 * cat, np.int64)
    lane = 0
    for s, w_ in enumerate([hh, hh, b, b]):
        base = sum([hh, hh, b, b][:s])
        for q in range(2):
            for c in range(w_):
                actual_to_canon[lane] = q * cat + base + c
                lane += 1
    P["conv_out"] = (wop[:, :, actual_to_canon, :], np.tile(bo, 2))
    return P


def stage1_packed(x, P, h=128, b=64):
    B_, H, Wd, cin = x.shape
    hb = b // 2
    x2 = x.reshape(B_, H, Wd // 2, 2 * cin)
    y = _pconv(x2, *P["conv_in"], 2, 1)       # (B,H,W/2, 2h) reordered
    ya, yb = y[..., :h], y[..., h:]            # each p=2-packed h/2=64 ch
    def csp(z, C):
        m = _pconv(z, *C["conv1"], 2, 1)       # (B,H,W/2, 2*hb)=64 lanes
        m4 = m.reshape(B_, H, Wd // 4, 4 * hb)
        r = _pconv(m4, *C["rep"], 4, 3)
        r = _pconv(r, *C["bconv"], 4, 3) + m4
        r = r.reshape(B_, H, Wd // 2, 2 * hb)
        y2 = _pconv(z, *C["conv2"], 2, 1)
        return _pconv(jnp.concatenate([r, y2], -1), *C["conv3"], 2, 1)
    y1 = _pconv(csp(yb, P["csp1"]), *P["cv1"], 2, 3)
    y2 = _pconv(csp(y1, P["csp2"]), *P["cv2"], 2, 3)
    cat = jnp.concatenate([ya, yb, y1, y2], -1)
    out = _pconv(cat, *P["conv_out"], 2, 1)    # (B,H,W/2, 512)
    return out.reshape(B_, H, Wd, 256)


def bench_chain():
    rng = np.random.default_rng(0)
    W = make_stage1_weights(rng)
    P = make_packed_stage1(W)
    Wd = {k: jax.tree.map(jnp.asarray, v) for k, v in W.items()}
    Pd = {k: jax.tree.map(jnp.asarray, v) for k, v in P.items()}

    # numeric check at f32, small spatial
    xs = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
    ref = stage1_direct(xs, Wd)
    got = stage1_packed(xs, Pd)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"\nstage1 chain packed-vs-direct max abs err: {err:.2e}")
    assert err < 1e-3

    x = jnp.asarray(rng.standard_normal((B, S, S, 128)), DT)
    td = device_timer(lambda a: stage1_direct(a, Wd), x, iters=30)
    tp = device_timer(lambda a: stage1_packed(a, Pd), x, iters=30)
    print(f"stage1 chain direct {td*1e3:7.3f} ms   packed {tp*1e3:7.3f} ms "
          f"({td/tp:.2f}x)")


if __name__ == "__main__" and os.environ.get("CHAIN", "1") == "1":
    bench_chain()


# ---------------------------------------------------------------------------
# packed-v2: no tensor below 128 lanes, no mixed-p reshapes except two
# bitwise views (W/4,256)->(W/2,128)
# ---------------------------------------------------------------------------

def pack_downsample(w, cin, cout):
    """1x1 conv cin->cout expressed as a p=2 -> p=4 packed conv.

    Input (B,H,W/2, 2*cin), window (1,2) stride (1,2), output
    (B,H,W/4, 4*cout): output phase q reads input col-tap q//2, phase q%2.
    """
    assert w.shape[:2] == (1, 1)
    wp = np.zeros((1, 2, 2 * cin, 4 * cout), w.dtype)
    for q in range(4):
        t, qi = q // 2, q % 2
        wp[0, t, qi * cin:(qi + 1) * cin, q * cout:(q + 1) * cout] = w[0, 0]
    return wp


def make_packed_stage1_v2(W, cin=128, h=128, b=64):
    hb = b // 2
    P = {}
    w, bias = W["conv_in"]
    wp = pack_general(w, 2, cin, h)
    order = np.concatenate([np.arange(0, b), np.arange(h, h + b),
                            np.arange(b, h), np.arange(h + b, 2 * h)])
    P["conv_in"] = (wp[:, :, :, order], np.tile(bias, 2)[order])

    def csp(C):
        out = {}
        out["conv1"] = (pack_downsample(C["conv1"][0], b, hb),
                        np.tile(C["conv1"][1], 4))
        out["conv2"] = (pack_downsample(C["conv2"][0], b, hb),
                        np.tile(C["conv2"][1], 4))
        out["rep"] = (pack_general(C["rep"][0], 4, hb, hb),
                      np.tile(C["rep"][1], 4))
        out["bconv"] = (pack_general(C["bconv"][0], 4, hb, hb),
                        np.tile(C["bconv"][1], 4))
        # conv3: inputs concat([m(p=4-packed 32ch, 128 lanes),
        # y2(p=4-packed 32ch, 128 lanes)]) = 256 lanes; output p=4-packed
        # 64ch (256 lanes). Row q*32+c of m holds pixel-phase q channel c.
        w3 = C["conv3"][0]
        w3p = np.zeros((1, 1, 4 * b, 4 * b), w3.dtype)
        for q in range(4):
            w3p[0, 0, q * hb:(q + 1) * hb, q * b:(q + 1) * b] = w3[0, 0, :hb]
            w3p[0, 0, 2 * b + q * hb:2 * b + (q + 1) * hb,
                q * b:(q + 1) * b] = w3[0, 0, hb:]
        out["conv3"] = (w3p, np.tile(C["conv3"][1], 4))
        return out

    P["csp1"], P["csp2"] = csp(W["csp1"]), csp(W["csp2"])
    P["cv1"] = (pack_general(W["cv1"][0], 2, b, b), np.tile(W["cv1"][1], 2))
    P["cv2"] = (pack_general(W["cv2"][0], 2, b, b), np.tile(W["cv2"][1], 2))
    cat = h + 2 * b
    wo, bo = W["conv_out"]
    wop = pack_general(wo, 2, cat, 256)
    actual_to_canon = np.empty(2 * cat, np.int64)
    lane = 0
    for s, w_ in enumerate([b, b, b, b]):
        base = sum([b, b, b, b][:s])
        for q in range(2):
            for c in range(w_):
                actual_to_canon[lane] = q * cat + base + c
                lane += 1
    P["conv_out"] = (wop[:, :, actual_to_canon, :], np.tile(bo, 2))
    return P


def _sconv(x, w, b, stride_w):
    """Packed conv with explicit width stride (for the downsampling 1x1s)."""
    kh, kw = w.shape[0], w.shape[1]
    pad_h = kh // 2 if kh > 1 else 0
    pad_w = 1 if (kw == 3) else 0
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, stride_w), ((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (jax.nn.silu(y + b)).astype(x.dtype)


def stage1_packed_v2(x, P, h=128, b=64):
    B_, H, Wd, cin = x.shape
    x2 = x.reshape(B_, H, Wd // 2, 2 * cin)
    y = _sconv(x2, *P["conv_in"], 1)
    ya, yb = y[..., :2 * b], y[..., 2 * b:]

    def csp(z, C):
        m = _sconv(z, *C["conv1"], 2)              # (B,H,W/4,128) p=4 32ch
        r = _sconv(m, *C["rep"], 1)
        r = _sconv(r, *C["bconv"], 1) + m
        y2 = _sconv(z, *C["conv2"], 2)
        y3 = _sconv(jnp.concatenate([r, y2], -1), *C["conv3"], 1)
        return y3.reshape(B_, H, Wd // 2, 2 * b)   # p=4 64ch -> p=2 view

    y1 = _sconv(csp(yb, P["csp1"]), *P["cv1"], 1)
    y2 = _sconv(csp(y1, P["csp2"]), *P["cv2"], 1)
    cat = jnp.concatenate([ya, yb, y1, y2], -1)
    out = _sconv(cat, *P["conv_out"], 1)
    return out.reshape(B_, H, Wd, 256)


def bench_chain_v2():
    rng = np.random.default_rng(0)
    W = make_stage1_weights(rng)
    P = make_packed_stage1_v2(W)
    Wd = {k: jax.tree.map(jnp.asarray, v) for k, v in W.items()}
    Pd = {k: jax.tree.map(jnp.asarray, v) for k, v in P.items()}

    xs = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
    err = float(jnp.max(jnp.abs(stage1_direct(xs, Wd)
                                - stage1_packed_v2(xs, Pd))))
    print(f"stage1 chain v2 packed-vs-direct max abs err: {err:.2e}")
    assert err < 1e-3

    x = jnp.asarray(rng.standard_normal((B, S, S, 128)), DT)
    tp = device_timer(lambda a: stage1_packed_v2(a, Pd), x, iters=30)
    print(f"stage1 chain packed-v2 {tp*1e3:7.3f} ms")


if __name__ == "__main__" and os.environ.get("CHAIN", "1") == "1":
    bench_chain_v2()


# ---------------------------------------------------------------------------
# Pallas VMEM-fused bottleneck chain vs the XLA packed per-conv loop
# (round-3 VERDICT next #3: the measured chain number)
# ---------------------------------------------------------------------------

def bench_pallas_chain():
    from yolo_re_tpu.ops.pallas.csp_chain_kernel import (
        bottleneck_chain,
        build_bottleneck_chain_weights,
    )

    rng = np.random.default_rng(0)
    hb = 32

    def leaf(k):
        return {
            "w": (rng.standard_normal((k, k, hb, hb)) * 0.1).astype(np.float32),
            "b": (rng.standard_normal((hb,)) * 0.05).astype(np.float32),
        }

    for n in (1, 2):
        fused = {"bottlenecks": [
            {"conv1": {"fused": leaf(3)}, "conv2": leaf(3)}
            for _ in range(n)]}
        ck = build_bottleneck_chain_weights(fused)

        # XLA packed reference segment (exactly ops/packed_elan.py's loop)
        bots = []
        for bot in fused["bottlenecks"]:
            bots.append({
                "rep": (jnp.asarray(pack_general(
                    bot["conv1"]["fused"]["w"], 4, hb, hb)),
                    jnp.asarray(np.tile(bot["conv1"]["fused"]["b"], 4))),
                "conv": (jnp.asarray(pack_general(bot["conv2"]["w"], 4, hb,
                                                  hb)),
                         jnp.asarray(np.tile(bot["conv2"]["b"], 4))),
            })

        def seg_xla(m):
            r = m
            for bot in bots:
                t = _pconv(r, *bot["rep"], 4, 3)
                t = _pconv(t, *bot["conv"], 4, 3)
                r = r + t
            return r

        def seg_chain(m):
            return bottleneck_chain(m, ck)

        # parity first at the production dtype (bf16; strict f32 parity is
        # pinned by the interpret-mode test — on-chip f32 dots run at
        # default bf16-operand precision, so f32 here only measures that)
        ms = jnp.asarray(rng.standard_normal((2, 16, 8, 128)), DT)
        err = float(jnp.max(jnp.abs(seg_xla(ms).astype(jnp.float32)
                                    - bottleneck_chain(ms, ck)
                                    .astype(jnp.float32))))
        print(f"n={n} chain-vs-xla max abs err (bf16): {err:.2e}")
        assert err < 2e-2

        m = jnp.asarray(rng.standard_normal((B, S, S // 4, 128)), DT)
        tx = device_timer(seg_xla, m, iters=200)
        tc = device_timer(seg_chain, m, iters=200)
        # useful FLOPs: 2n convs of 3x3 32->32 over S^2 pixels
        gf = 2 * n * 2 * B * S * S * hb * hb * 9 / 1e9
        print(f"n={n} bottleneck segment: xla {tx*1e3:7.3f} ms "
              f"({gf/tx/1e3:5.1f} TF/s useful)  pallas chain {tc*1e3:7.3f} ms "
              f"({gf/tc/1e3:5.1f} TF/s)  ({tx/tc:4.2f}x)")


if __name__ == "__main__" and os.environ.get("STAGE") == "pallas_chain":
    bench_pallas_chain()
