"""Train-step stage profile by program truncation (the train-side analogue
of scripts/profile_layers.py; round-1 VERDICT "Next" #1).

Times successively larger truncations of the donated train step, each as a
chained on-device fori_loop (data feedback defeats LICM; a value fetch ends
each timed region — block_until_ready lies through this environment's
tunnel, see CLAUDE.md):

    fwd            model.apply(train=True) alone (surrogate sum "loss")
    fwd_bwd        value_and_grad of the surrogate  -> model backward cost
    fwd_loss       forward + TAL loss, no grad      -> TAL forward cost
    fwd_loss_bwd   value_and_grad of the real objective
    full           + clip + grouped SGD + EMA       -> optimizer cost
    tal_only       TAL loss on precomputed fixed preds (cross-check)

Stage costs are deltas between consecutive rows; the TOTAL row matches
BENCH_MODE=train. Fusion moves work across truncation boundaries a little;
read adjacent pairs together.

Run on the TPU env:  python scripts/profile_train.py [--batch 32] [--remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gelan-c")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--gt", type=int, default=8,
                    help="padded GT boxes per image")
    ap.add_argument("--per-layer", action="store_true",
                    help="per-layer forward+backward attribution by plan "
                         "truncation (round-2 VERDICT Next #1); compiles "
                         "two programs per layer — slow cold")
    ap.add_argument("--from-layer", type=int, default=0,
                    help="with --per-layer: skip prefixes shorter than this")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_re_tpu.loss.tal import TALoss
    from yolo_re_tpu.models.yolo import YOLO, param_labels
    from yolo_re_tpu.train.ema import ema_update, init_ema
    from yolo_re_tpu.train.optimizer import (
        clip_by_global_norm,
        init_sgd_state,
        sgd_step,
    )

    model = YOLO.from_yaml(f"configs/models/{args.model}.yaml")
    params, stats = model.init(jax.random.key(0))
    loss_fn = TALoss(model.num_classes, 16, model.strides)
    labels = param_labels(params)
    bufs, ema = init_sgd_state(params), init_ema(params, stats)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((args.batch, args.size, args.size, 3), np.float32), dtype)
    targets = np.zeros((args.batch, args.gt, 5), np.float32)
    targets[:, :2] = [1, 0.5, 0.5, 0.3, 0.3]
    targets = jnp.asarray(targets)

    def surrogate(preds):
        return sum(p.astype(jnp.float32).sum()
                   for p in jax.tree_util.tree_leaves(preds))

    if args.per_layer:
        _per_layer(args, model, params, stats, images)
        return

    def make_loop(body_fn):
        @jax.jit
        def loop(params, stats, bufs, ema, x, targets):
            def body(i, carry):
                params, stats, bufs, ema, x = carry
                params, stats, bufs, ema, total = body_fn(
                    params, stats, bufs, ema, x, targets)
                x = x + (total * 1e-12).astype(x.dtype)
                return params, stats, bufs, ema, x
            out = jax.lax.fori_loop(
                0, args.iters, body, (params, stats, bufs, ema, x))
            return (out[0]["stem1"]["w"].astype(jnp.float32).sum()
                    + out[4].astype(jnp.float32).sum())
        return loop

    R = args.remat

    def b_fwd(params, stats, bufs, ema, x, targets):
        preds, ns = model.apply(params, stats, x, train=True, remat=R)
        return params, ns, bufs, ema, surrogate(preds)

    def grad_probe(grads):
        """Keep EVERY gradient leaf live. Probing only one leaf lets XLA
        dead-code-eliminate the other ~465 weight-gradient convs — that
        mistake once misattributed 66 ms of backward to the optimizer."""
        return sum(g.astype(jnp.float32).ravel()[0]
                   for g in jax.tree_util.tree_leaves(grads))

    def b_fwd_bwd(params, stats, bufs, ema, x, targets):
        def obj(p):
            preds, ns = model.apply(p, stats, x, train=True, remat=R)
            return surrogate(preds), ns
        (total, ns), grads = jax.value_and_grad(obj, has_aux=True)(params)
        return params, ns, bufs, ema, total + grad_probe(grads)

    def b_fwd_loss(params, stats, bufs, ema, x, targets):
        preds, ns = model.apply(params, stats, x, train=True, remat=R)
        total, _ = loss_fn(preds, targets)
        return params, ns, bufs, ema, total

    def b_fwd_loss_bwd(params, stats, bufs, ema, x, targets):
        def obj(p):
            preds, ns = model.apply(p, stats, x, train=True, remat=R)
            total, _ = loss_fn(preds, targets)
            return total, ns
        (total, ns), grads = jax.value_and_grad(obj, has_aux=True)(params)
        return params, ns, bufs, ema, total + grad_probe(grads)

    def b_full(params, stats, bufs, ema, x, targets):
        def obj(p):
            preds, ns = model.apply(p, stats, x, train=True, remat=R)
            total, _ = loss_fn(preds, targets)
            return total, ns
        (total, ns), grads = jax.value_and_grad(obj, has_aux=True)(params)
        grads, _ = clip_by_global_norm(grads, 10.0)
        params, bufs = sgd_step(params, grads, bufs, labels, lr=1e-4,
                                bias_lr=1e-4, momentum=0.937,
                                weight_decay=5e-4)
        ema = ema_update(ema, params, ns)
        return params, ns, bufs, ema, total

    variants = [("fwd", b_fwd), ("fwd_bwd", b_fwd_bwd),
                ("fwd_loss", b_fwd_loss), ("fwd_loss_bwd", b_fwd_loss_bwd),
                ("full", b_full)]

    times: dict[str, float] = {}
    for name, body in variants:
        loop = make_loop(body)
        float(loop(params, stats, bufs, ema, images, targets))  # compile
        t0 = time.perf_counter()
        float(loop(params, stats, bufs, ema, images, targets))
        times[name] = (time.perf_counter() - t0) / args.iters
        print(f"{name:14s} {times[name] * 1e3:8.2f} ms "
              f"({args.batch / times[name]:7.1f} img/s)", flush=True)

    # tal_only: loss on fixed precomputed preds (forward excluded)
    preds0, _ = jax.jit(
        lambda p, s, x: model.apply(p, s, x, train=True))(params, stats,
                                                          images)
    preds0 = jax.tree.map(lambda t: t.astype(jnp.float32), preds0)

    @jax.jit
    def tal_loop(preds, targets):
        def body(i, carry):
            acc, preds = carry
            total, _ = loss_fn(preds, targets)
            preds = jax.tree.map(
                lambda t: t + (total * 1e-12).astype(t.dtype), preds)
            return acc + total, preds
        acc, _ = jax.lax.fori_loop(0, args.iters, body,
                                   (jnp.float32(0), preds))
        return acc

    float(tal_loop(preds0, targets))
    t0 = time.perf_counter()
    float(tal_loop(preds0, targets))
    times["tal_only"] = (time.perf_counter() - t0) / args.iters
    print(f"{'tal_only':14s} {times['tal_only'] * 1e3:8.2f} ms", flush=True)

    print("\nstage deltas:")
    print(f"  model forward        {times['fwd'] * 1e3:8.2f} ms")
    print(f"  model backward       {(times['fwd_bwd'] - times['fwd']) * 1e3:8.2f} ms")
    print(f"  TAL loss forward     {(times['fwd_loss'] - times['fwd']) * 1e3:8.2f} ms"
          f"   (tal_only cross-check {times['tal_only'] * 1e3:.2f} ms)")
    print(f"  TAL fwd+bwd in-ctx   {(times['fwd_loss_bwd'] - times['fwd_bwd']) * 1e3:8.2f} ms")
    print(f"  clip + SGD + EMA     {(times['full'] - times['fwd_loss_bwd']) * 1e3:8.2f} ms")
    print(f"  TOTAL                {times['full'] * 1e3:8.2f} ms  "
          f"= {args.batch / times['full']:.1f} img/s")


def _per_layer(args, model, params, stats, images) -> None:
    """Per-layer forward and backward attribution, by cumulative plan
    truncation (the backward-side analogue of scripts/profile_layers.py).

    For prefix k: run train-mode steps[:k] with a surrogate sum over EVERY
    step output (anything unconsumed would be dead-code-eliminated —
    including whole branches saved for later concats), take grads of all
    prefix params and keep EVERY grad leaf live (see grad_probe note in
    main). Layer k's fwd+bwd cost = delta between prefixes; a second
    forward-only sweep splits out the backward share. Fusion moves a
    little work across boundaries — read adjacent pairs together; the
    TOTAL rows are exact.
    """
    import time

    import jax
    import jax.numpy as jnp

    from yolo_re_tpu.models.builder import INPUT
    from yolo_re_tpu.utils.profiling import device_timer

    steps = model.plan.steps
    R = args.remat

    def run_prefix(k, p, x):
        outputs = {INPUT: x}
        acc = jnp.zeros((), jnp.float32)
        for step in steps[:k]:
            if len(step.inputs) == 1 and step.type != "CBFuse":
                inp = outputs[step.inputs[0]]
            else:
                inp = [outputs[n] for n in step.inputs]
            if step.name == model.plan.detect_name \
                    and not isinstance(inp, list):
                inp = [inp]
            from functools import partial as _p
            apply_fn = _p(step.block.apply, step.cfg, train=True)
            if R is True or (R == "early" and 0 < step.scale <= 8):
                apply_fn = jax.checkpoint(apply_fn)
            out, _ = apply_fn(p.get(step.name, {}),
                              stats.get(step.name, {}), inp)
            outputs[step.name] = out
            acc += sum(leaf.astype(jnp.float32).sum()
                       for leaf in jax.tree_util.tree_leaves(out))
        return acc

    def fwd_fn(k):
        return lambda x, p: run_prefix(k, p, x)

    def bwd_fn(k):
        names = {s.name for s in steps[:k]}

        def fn(x, p):
            sub = {n: p[n] for n in p if n in names}
            val, grads = jax.value_and_grad(
                lambda q: run_prefix(k, {**p, **q}, x))(sub)
            return val + sum(g.astype(jnp.float32).ravel()[0]
                             for g in jax.tree_util.tree_leaves(grads))
        return fn

    print(f"{'layer':<12} {'type':<16} {'fwd ms':>8} {'bwd ms':>8} "
          f"{'f+b ms':>8}   % of total")
    rows = []
    prev_f = prev_fb = 0.0
    t_start = time.time()
    for k in range(1, len(steps) + 1):
        tf = device_timer(fwd_fn(k), images, params,
                          iters=args.iters) * 1000
        tfb = device_timer(bwd_fn(k), images, params,
                           iters=args.iters) * 1000
        if k > args.from_layer:
            s = steps[k - 1]
            rows.append((s.name, s.type, tf - prev_f,
                         (tfb - prev_fb) - (tf - prev_f), tfb - prev_fb))
        prev_f, prev_fb = tf, tfb
        print(f"  ...{k}/{len(steps)} ({time.time() - t_start:.0f}s)",
              end="\r", flush=True)

    total_f, total_fb = prev_f, prev_fb
    rows.sort(key=lambda r: -r[4])
    for name, type_, f, b, fb in rows:
        print(f"{name:<12} {type_:<16} {f:8.2f} {b:8.2f} {fb:8.2f}   "
              f"{100 * fb / total_fb:5.1f}%")
    print(f"{'TOTAL':<12} {'':<16} {total_f:8.2f} "
          f"{total_fb - total_f:8.2f} {total_fb:8.2f}   "
          f"(surrogate loss, batch {args.batch}, "
          f"bwd/fwd {total_fb / total_f - 1:.2f}x)")


if __name__ == "__main__":
    main()
