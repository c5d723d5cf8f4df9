"""Pallas TPU kernel: the BACKWARD of train-mode ADown from the packed
layout (the companion of adown_kernel.py's raw forward).

Forward (pre-BN, raw weights, avgpool /4 folded into the weights):

    S[a, p]   = x[a, p] + x[a+1, p] + x[a, p+1] + x[a+1, p+1]   (2x2 sums,
                a in [0, h-2], p in [0, w-2]; outside -> 0 / -inf)
    y1[i, o]  = sum_{kh, kw} S1[2i+kh-1, 2o+kw-1] @ w1q[kh, kw]   (w1q = W1/4)
    M[i, o]   = max_{kh, kw} S2[2i+kh-1, 2o+kw-1]
    y2[i, o]  = M[i, o] @ w2q                                     (w2q = W2/4)

This kernel computes, per (batch, row-block) grid step:

    dx   (B, H, Wp, 512)  — grads through both pooling paths and convs
    dWq1 (9, 128, 128)    — grad wrt w1q (per-tap), accumulated over steps
    dWq2 (128, 128)       — grad wrt w2q, accumulated over steps

Key reconstructions (all mirrored from the forward kernel's packed-layout
arithmetic — even pixels are in-column phase sums, odd pixels cross
columns):

- The maxpool backward recomputes the 9 window taps and routes dM = g2 @
  w2q^T to the FIRST maximum in row-major window order — exactly XLA's
  select_and_scatter tie semantics (verified empirically) — via running-OR
  priority masks.
- dS contributions are accumulated into four (row-parity x col-parity)
  planes; output row i writes avg rows 2i-1 (odd), 2i (even), 2i+1 (odd)
  and avg cols 2o-1 (odd), 2o (even), 2o+1 (odd), so each (kh, kw) tap is
  a row-pair interleave + column shift — no scatters anywhere.
- dx row r = dS[r-1] + dS[r] and packed phase q0/q1 of col c read
  (even col c, odd col c-1) / (even col c, odd col c): four adds.
- Each block DMAs x with a 3-row halo and g with a 1-row halo so its dx
  rows are complete locally; dW contributions are taken from the block's
  OWN output rows only (no double counting).

Weight-grad accumulation uses constant-index output blocks (legal on the
sequential TPU grid: initialized at step 0, accumulated after).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 256
HALF = C // 2


def _bwd_kernel(x_hbm, g_hbm, w1q_ref, w2q_ref,
                dx_ref, dw1_ref, dw2_ref,
                xs, gs, sem,
                *, to: int, wp: int, h: int, wp_true: int,
                c: int = C):
    half = c // 2
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nj = pl.num_programs(1)
    step = b * nj + j
    h_out = h // 2
    rows_x = 2 * to + 6       # x rows [2*to*j - 3, 2*to*j + 2*to + 2]
    ot = to + 2               # output rows [to*j - 1, to*j + to]

    # ---- double-buffered edge-clamped DMA for x and g ------------------
    def dma_x(slot, bb, jj, do):
        def run(src, dst):
            d = pltpu.make_async_copy(src, dst, sem.at[slot, 0])
            d.start() if do == "start" else d.wait()

        lo = 2 * to * jj - 3
        if nj == 1:
            run(x_hbm.at[bb, pl.ds(0, 2 * to)], xs.at[slot, pl.ds(3, 2 * to)])
            return
        first, last = jj == 0, jj == nj - 1

        @pl.when(first)
        def _():
            run(x_hbm.at[bb, pl.ds(0, rows_x - 3)],
                xs.at[slot, pl.ds(3, rows_x - 3)])

        @pl.when(last)
        def _():
            run(x_hbm.at[bb, pl.ds(lo, rows_x - 3)],
                xs.at[slot, pl.ds(0, rows_x - 3)])

        @pl.when((~first) & (~last))
        def _():
            run(x_hbm.at[bb, pl.ds(lo, rows_x)], xs.at[slot])

    def dma_g(slot, bb, jj, do):
        def run(src, dst):
            d = pltpu.make_async_copy(src, dst, sem.at[slot, 1])
            d.start() if do == "start" else d.wait()

        lo = to * jj - 1
        if nj == 1:
            run(g_hbm.at[bb, pl.ds(0, to)], gs.at[slot, pl.ds(1, to)])
            return
        first, last = jj == 0, jj == nj - 1

        @pl.when(first)
        def _():
            run(g_hbm.at[bb, pl.ds(0, ot - 1)], gs.at[slot, pl.ds(1, ot - 1)])

        @pl.when(last)
        def _():
            run(g_hbm.at[bb, pl.ds(lo, ot - 1)], gs.at[slot, pl.ds(0, ot - 1)])

        @pl.when((~first) & (~last))
        def _():
            run(g_hbm.at[bb, pl.ds(lo, ot)], gs.at[slot])

    def dma_all(slot, bb, jj, do):
        dma_x(slot, bb, jj, do)
        dma_g(slot, bb, jj, do)

    @pl.when(step == 0)
    def _():
        dma_all(0, b, j, "start")

    @pl.when(step + 1 < nb * nj)
    def _():
        s2 = step + 1
        b2 = s2 // nj
        j2 = s2 - b2 * nj
        dma_all(s2 % 2, b2, j2, "start")

    dma_all(step % 2, b, j, "wait")
    X = xs[step % 2]                  # (rows_x, wp, 2C)
    G = gs[step % 2]                  # (ot, wp, C)

    f32 = jnp.float32
    # zero invalid / garbage g rows (edge clamping leaves garbage)
    i_g = (jax.lax.broadcasted_iota(jnp.int32, (ot, 1, 1), 0) + to * j - 1)
    g_ok = (i_g >= 0) & (i_g <= h_out - 1)
    G = jnp.where(g_ok, G, 0)
    g1 = G[..., :half]
    g2 = G[..., half:]

    # ---- recompute window sums (mirror of the forward kernel) ----------
    q0, q1 = X[..., :c], X[..., c:]
    q0h = q0[:-1] + q0[1:]            # (rows_x - 1, wp, C)
    q1h = q1[:-1] + q1[1:]
    s_even = q0h + q1h                # window sum at even pixel 2c
    s_odd_body = q1h[:, :-1] + q0h[:, 1:]

    ga = (jax.lax.broadcasted_iota(jnp.int32, (rows_x - 1, 1, 1), 0)
          + 2 * to * j - 3)
    row_ok = (ga >= 0) & (ga <= h - 2)
    odd_ok = (jax.lax.broadcasted_iota(jnp.int32, (1, wp - 1, 1), 1)
              < wp_true - 1)

    # branch-1 taps (zero padding)
    zcol = jnp.zeros_like(s_even[:, :1, :half])
    ze = jnp.where(row_ok, s_even[..., :half], 0)
    zo = jnp.where(row_ok & odd_ok, s_odd_body[..., :half], 0)
    z_prev = jnp.concatenate([zcol, zo], axis=1)       # odd col o-1 (kw=0)
    z_cur = jnp.concatenate([zo, zcol], axis=1)        # odd col o   (kw=2)

    # branch-2 taps (-inf padding)
    neg = jnp.asarray(-jnp.inf, s_even.dtype)
    negcol = jnp.full_like(s_even[:, :1, half:], neg)
    be = jnp.where(row_ok, s_even[..., half:], neg)
    bo_body = jnp.where(row_ok & odd_ok, s_odd_body[..., half:], neg)
    b_prev = jnp.concatenate([negcol, bo_body], axis=1)
    b_cur = jnp.concatenate([bo_body, negcol], axis=1)

    def pairs(a):
        # avg row 2*i_local + kh selected as (pairs, 2) on the major dim;
        # a has rows_x - 1 = 2*to + 5 rows -> pad to 2*(to + 3)
        a = jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0)
        return a.reshape(to + 3, 2, wp, half)

    def sel(p, kh, n, off=0):
        # rows i_local in [off, off + n): avg row 2*i_local + kh
        if kh == 0:
            return p[off:off + n, 0]
        if kh == 1:
            return p[off:off + n, 1]
        return p[1 + off:1 + off + n, 0]

    pz = {0: pairs(z_prev), 1: pairs(ze), 2: pairs(z_cur)}
    pb = {0: pairs(b_prev), 1: pairs(be), 2: pairs(b_cur)}

    # ---- branch-2 max recompute over ALL ot output rows -----------------
    m = None
    for kh in range(3):
        for kw in range(3):
            t = sel(pb[kw], kh, ot)
            m = t if m is None else jnp.maximum(m, t)
    # Real-TPU Mosaic rejects cmpf on bf16 vectors ("Target does not
    # support this comparison"); the f32 widening is exact for bf16, so
    # the first-max tie routing below is unchanged. bf16 maximum is fine
    # (the inference kernel's maxpool uses it on-chip).
    m32 = m.astype(f32)

    dm = jax.lax.dot_general(
        g2.reshape(ot * wp, half), w2q_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=f32).reshape(ot, wp, half)

    # ---- weight grads over the block's OWN rows (i_local 1..to) --------
    @pl.when(step == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    g1f = g1[1:to + 1].reshape(to * wp, half)
    dw1_taps = []
    for kh in range(3):
        for kw in range(3):
            t = sel(pz[kw], kh, to, off=1).reshape(to * wp, half)
            dw1_taps.append(jax.lax.dot_general(
                t, g1f, (((0,), (0,)), ((), ())),
                preferred_element_type=f32))
    dw1_ref[:] += jnp.stack(dw1_taps)
    m_own = m[1:to + 1].reshape(to * wp, half)
    dw2_ref[:] += jax.lax.dot_general(
        m_own.astype(g1f.dtype), g2[1:to + 1].reshape(to * wp, half),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)

    # ---- dS accumulation: (row parity x col parity x branch) planes ----
    # plane shape (ot, wp, HALF): rows indexed by i_g = to*j - 1 + i_local;
    # 'E' plane row i <-> avg row 2*i_g, 'O' plane row i <-> 2*i_g + 1;
    # 'e' cols are even avg cols 2c, 'o' cols odd 2c+1. Plain value adds
    # only — no lane-offset updates (Mosaic-friendly).
    planes: dict = {}

    def add_plane(rp, cp, br, val):
        key = (rp, cp, br)
        planes[key] = val if key not in planes else planes[key] + val

    def col_route(contrib, kw, rp, br):
        if kw == 1:        # even col o
            add_plane(rp, "e", br, contrib)
        elif kw == 0:      # odd col o-1: plane col c takes contrib col c+1
            add_plane(rp, "o", br, jnp.concatenate(
                [contrib[:, 1:], jnp.zeros_like(contrib[:, :1])], axis=1))
        else:              # odd col o
            add_plane(rp, "o", br, contrib)

    def row_split(base, kh):
        """base (ot, wp, HALF) indexed by output row -> (row parity,
        plane add): kh=1 -> even avg row 2i; kh=0 -> odd row 2i-1 (odd
        plane row i-1, i.e. shift up); kh=2 -> odd row 2i+1."""
        if kh == 1:
            return "E", base
        if kh == 2:
            return "O", base
        return "O", jnp.concatenate([base[1:], jnp.zeros_like(base[:1])],
                                    axis=0)

    taken = None
    for kh in range(3):
        for kw in range(3):
            # branch 1: g1 @ w1q[kh, kw]^T (contract output channels)
            c1 = jax.lax.dot_general(
                g1.reshape(ot * wp, half), w1q_ref[kh, kw],
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32).reshape(ot, wp, half)
            # branch 2: first-max priority mask routes dm
            t2 = sel(pb[kw], kh, ot)
            elig = t2.astype(f32) == m32
            if taken is None:
                use, taken = elig, elig
            else:
                use = elig & (~taken)
                taken = taken | elig
            c2 = jnp.where(use, dm, 0.0)
            for br, contrib in ((0, c1), (1, c2)):
                rp, val = row_split(contrib, kh)
                col_route(val, kw, rp, br)

    # zero dS rows outside the valid avg domain
    e_ok = (i_g >= 0) & (i_g <= h_out - 1)      # even avg row 2*i_g
    o_ok = (i_g >= 0) & (i_g <= h_out - 2)      # odd avg row 2*i_g + 1
    # odd avg col 2c+1 only exists for c < wp_true - 1 (the kw=2 tap of
    # the last output col reads the zero/-inf pad, which carries no grad)
    oc_ok = (jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
             < wp_true - 1)
    masks = {("E", "e"): e_ok, ("E", "o"): e_ok & oc_ok,
             ("O", "e"): o_ok, ("O", "o"): o_ok & oc_ok}
    for (rp, cp, br), val in planes.items():
        planes[(rp, cp, br)] = jnp.where(masks[(rp, cp)], val, 0.0)

    # ---- dx assembly ----------------------------------------------------
    # x row 2*i_g   <- dS rows 2*i_g - 1 (odd plane i-1) + 2*i_g (even i)
    # x row 2*i_g+1 <- dS rows 2*i_g (even i) + 2*i_g + 1 (odd i)
    def rows(cp, br, odd_x):
        E, O = planes[("E", cp, br)], planes[("O", cp, br)]
        return E[1:to + 1] + (O[1:to + 1] if odd_x else O[0:to])

    def phases(re, ro):
        # q0 (pixel 2c): even col c + odd col c-1; q1: even col c + odd c
        ro_r = jnp.concatenate([jnp.zeros_like(ro[:, :1]), ro[:, :-1]],
                               axis=1)
        return re + ro_r, re + ro

    out_parts = []
    for odd_x in (False, True):      # even x rows, then odd x rows
        e_b1, o_b1 = rows("e", 0, odd_x), rows("o", 0, odd_x)
        e_b2, o_b2 = rows("e", 1, odd_x), rows("o", 1, odd_x)
        q0_b1, q1_b1 = phases(e_b1, o_b1)
        q0_b2, q1_b2 = phases(e_b2, o_b2)
        # packed lanes: [q0 branch1 | q0 branch2 | q1 branch1 | q1 branch2]
        out_parts.append(jnp.concatenate(
            [q0_b1, q0_b2, q1_b1, q1_b2], axis=-1))   # (to, wp, 2C)

    dx = jnp.stack(out_parts, axis=1).reshape(1, 2 * to, wp, 2 * c)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def adown_bwd_from_packed(xp: jax.Array, g: jax.Array, w1q: jax.Array,
                          w2q: jax.Array, *, interpret: bool = False):
    """Backward of the raw packed ADown forward.

    xp (B, H, Wp, 512) packed input; g (B, H/2, Wp, 256) cotangent of the
    pre-BN output; w1q (3, 3, 128, 128) = W1/4; w2q (128, 128) = W2[0,0]/4.
    Returns (dx (B, H, Wp, 512), dWq1 (9, 128, 128) f32, dWq2 (128, 128)
    f32) — dWq are grads wrt the SCALED weights (caller applies the /4
    chain factor).
    """
    import os

    B, h, wp_true, c2 = xp.shape
    c = c2 // 2
    half = c // 2
    assert c2 == 2 * c and c % 256 == 0, c2   # branch halves = full tiles
    h_out = h // 2
    # to = 1 would make the halo'd middle-block DMA read past the array;
    # callers gate on h_out % 2 == 0 (ops/adown_train.py). The default
    # row-block of 8 puts peak VMEM around ~11 MB at down1 shapes;
    # YOLO_TPU_ADOWN_BWD_TO=4 (trace-time read) halves it.
    env_to = os.environ.get("YOLO_TPU_ADOWN_BWD_TO")
    # An env value that is non-numeric, < 2, or does not divide h_out falls
    # back to the default chain (with a warning) instead of raising a bare
    # ValueError/StopIteration at trace time.
    cands = (8, 4, 2)
    if env_to:
        try:
            cands = (int(env_to),) + cands
        except ValueError:
            import warnings

            warnings.warn(
                f"ignoring non-integer YOLO_TPU_ADOWN_BWD_TO={env_to!r}")
    to = next(t for t in cands if t >= 2 and h_out % t == 0)
    if env_to and cands[0] != to and cands != (8, 4, 2):
        import warnings

        warnings.warn(
            f"YOLO_TPU_ADOWN_BWD_TO={env_to!r} is <2 or does not divide "
            f"h_out={h_out}; using to={to}")
    wp = (wp_true + 7) // 8 * 8
    if wp != wp_true:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp - wp_true), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, wp - wp_true), (0, 0)))

    dtype = xp.dtype
    kernel = partial(_bwd_kernel, to=to, wp=wp, h=h, wp_true=wp_true,
                     c=c)
    dx, dw1, dw2 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, h, wp, 2 * c), dtype),
            jax.ShapeDtypeStruct((9, half, half), jnp.float32),
            jax.ShapeDtypeStruct((half, half), jnp.float32),
        ),
        grid=(B, h_out // to),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),              # g (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w1q
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w2q
        ],
        out_specs=(
            pl.BlockSpec((1, 2 * to, wp, 2 * c), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, half, half), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half, half), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * to + 6, wp, 2 * c), dtype),
            pltpu.VMEM((2, to + 2, wp, c), g.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(xp, g, w1q.astype(dtype), w2q.astype(dtype))
    return (dx if wp == wp_true else dx[:, :, :wp_true]), dw1, dw2
