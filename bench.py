"""Benchmark: gelan-c 640x640 batched inference images/sec, incl. NMS.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); `vs_baseline` compares
against the torch reference measured on this host's CPU once and stored in
baseline_measurements.json (see scripts/measure_reference_baseline.py).
Falls back to vs_baseline = null when no measurement exists.

Pipeline measured: fused (BN+RepConv folded) bf16 forward + DFL decode +
class-aware fixed-shape NMS. The timed loop runs INSIDE one jit program
(`lax.fori_loop`), so the number reflects device throughput — this
environment reaches the chip through a network tunnel that adds ~40 ms per
dispatch, which a co-located production host does not pay (and which
pipelined serving hides anyway). Set BENCH_MODE=dispatch to measure with
per-call dispatch overhead included.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# BENCH_MESH force-flag MUST be set before ANY yolo_re_tpu import:
# spmd._FORCE_SHARD_MAP freezes at first spmd import, and the package
# import below pulls in most of the library — a future top-level spmd
# import anywhere in that closure would otherwise freeze the flag False
# while the metric still claims "[mesh shard_mapped]". Unconditional
# (not setdefault): a pre-set '0' must not silently measure the plain
# program under that label.
if os.environ.get("BENCH_MESH", "0") == "1":
    assert "yolo_re_tpu.parallel.spmd" not in sys.modules
    os.environ["YOLO_TPU_FORCE_SHARD_MAP"] = "1"

from yolo_re_tpu.utils.platform import select_platform  # noqa: E402

select_platform()

# Chip peak dense-matmul TFLOP/s by platform (bf16): MFU denominator.
_PEAK_TFLOPS = {"tpu": 197.0}  # TPU v5e (v5litepod), bf16


def _mfu(fn, args, images_per_sec, batch):
    """(tflops, mfu) achieved by `fn` at the measured rate.

    FLOPs come from XLA's compiled cost model for the SINGLE-step program
    (the same computation the timed fori_loop repeats), so the number
    covers everything actually executed — forward, NMS, and in train mode
    the backward/optimizer/EMA. The compile is cached across runs.
    """
    import jax
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        return None, None
    if flops <= 0:
        return None, None
    tflops = flops / batch * images_per_sec / 1e12
    peak = _PEAK_TFLOPS.get(jax.devices()[0].platform)
    mfu = round(tflops / peak, 4) if peak else None
    return round(tflops, 2), mfu


BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "640"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
MODEL = os.environ.get("BENCH_MODEL", "gelan-c")
# fused_loop | dispatch | train | serving | serving_exported | latency | eval
MODE = os.environ.get("BENCH_MODE", "fused_loop")
# eval mode = the mAP-eval stack: ALL-anchor NMS at the reference's
# validation thresholds (conf 0.001 / iou 0.6 — eval/evaluator.py), vs the
# serving thresholds' 512-candidate preselection. BENCH_NMS_BACKEND
# overrides the K-dependent backend choice for A/Bs at K = all anchors.
CONF = float(os.environ.get("BENCH_CONF",
                            "0.001" if MODE == "eval" else "0.25"))
IOU = float(os.environ.get("BENCH_IOU", "0.6" if MODE == "eval" else "0.45"))
NMS_BACKEND = os.environ.get("BENCH_NMS_BACKEND", "auto")
# Eval-mode NMS candidate-set controls (ops/nms.py):
#   BENCH_NMS_ADAPTIVE=0 forces the pre-round-5 single-K all-anchor
#     program (every scene pays the worst case — the 636.6 img/s number);
#     default (unset) keeps the K-bucket lax.switch dispatch.
#   BENCH_NMS_PRETOPK=K forces a fixed candidate count (adaptive off) —
#     measures one bucket branch's program directly.
_A = os.environ.get("BENCH_NMS_ADAPTIVE")
NMS_ADAPTIVE = None if _A in (None, "") else _A == "1"
# "0"/"" both mean unset (a forced candidate count of zero is never the
# intent; 0 would build a degenerate top_k(conf, 0) program).
_P = os.environ.get("BENCH_NMS_PRETOPK")
NMS_PRETOPK = int(_P) if _P and _P != "0" else None
# BENCH_MESH=1: run the fused-loop program as the MESH program — a 1-D
# data mesh over all local devices with the batch NamedSharding'd and
# every Pallas fast path shard_mapped (YOLO_TPU_FORCE_SHARD_MAP keeps the
# manual regions even on a 1-device mesh). On one real chip this is the
# round-3 VERDICT #1 "mesh(1) no-regression" proof: the sharded program
# must match the unsharded number.
# (YOLO_TPU_FORCE_SHARD_MAP is set at the very top of this file, before
# the first yolo_re_tpu import — see the comment there.)
MESH = os.environ.get("BENCH_MESH", "0") == "1"
_R = os.environ.get("BENCH_REMAT", "0")   # train: 1=full, early=selective
REMAT = "early" if _R == "early" else (_R == "1")


def bench_train() -> None:
    """Training throughput: full train step (fwd, TAL loss, bwd, grouped
    SGD, EMA, BN stats) in bf16 on synthetic device-resident batches.

    BENCH_MESH=1 runs the SHARDED train-step program — a 1-D data mesh
    over all local devices, batch NamedSharding'd, params replicated, and
    every Pallas train fast path shard_mapped at its call site (the train
    stem's custom VJP carries an explicit lax.psum on the weight-grad
    cotangents, parallel/spmd.py). On one real chip this is the train-mode
    half of the mesh(1) no-regression proof: the sharded train program is
    a DIFFERENT program from the unsharded one and must match its
    throughput (round-4 VERDICT next #1)."""
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

    model = YOLO.from_yaml(f"configs/models/{MODEL}.yaml")
    params, stats = model.init(jax.random.key(0))
    loss_fn = TALoss(model.num_classes, 16, model.strides)
    labels = param_labels(params)
    bufs, ema = init_sgd_state(params), init_ema(params, stats)

    mesh = None
    if MESH:
        from yolo_re_tpu.parallel.mesh import DATA_AXIS
        mesh = jax.sharding.Mesh(np.array(jax.devices()), (DATA_AXIS,))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, SIZE, SIZE, 3), np.float32),
                         jnp.bfloat16)
    targets = np.zeros((BATCH, 8, 5), np.float32)
    targets[:, :2] = [1, 0.5, 0.5, 0.3, 0.3]
    targets = jnp.asarray(targets)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from yolo_re_tpu.parallel.mesh import DATA_AXIS
        sh = NamedSharding(mesh, P(DATA_AXIS))
        rep = NamedSharding(mesh, P())
        images = jax.device_put(images, sh)
        targets = jax.device_put(targets, sh)
        params, stats, bufs, ema = (jax.device_put(t, rep)
                                    for t in (params, stats, bufs, ema))

    def step(params, stats, bufs, ema, x, targets):
        if mesh is not None:
            from yolo_re_tpu.parallel.spmd import use_mesh
            ctx = use_mesh(mesh)
        else:
            import contextlib
            ctx = contextlib.nullcontext()

        with ctx:
            def obj(p):
                preds, ns = model.apply(p, stats, x, train=True,
                                        remat=REMAT)
                total, _ = loss_fn(preds, targets)
                return total, ns

            (total, ns), grads = jax.value_and_grad(
                obj, has_aux=True)(params)
            grads, _ = clip_by_global_norm(grads, 10.0)
            params, bufs = sgd_step(params, grads, bufs, labels, lr=1e-4,
                                    bias_lr=1e-4, momentum=0.937,
                                    weight_decay=5e-4)
            ema = ema_update(ema, params, ns)
        return params, ns, bufs, ema, total

    @jax.jit
    def loop(params, stats, bufs, ema, images, targets):
        def body(i, carry):
            params, stats, bufs, ema, x = carry
            params, ns, bufs, ema, total = step(
                params, stats, bufs, ema, x, targets)
            # data feedback so the loop body cannot be hoisted (LICM)
            x = x + (total * 1e-12).astype(x.dtype)
            return params, ns, bufs, ema, x
        out = jax.lax.fori_loop(0, ITERS, body,
                                (params, stats, bufs, ema, images))
        # Return a scalar DERIVED from the final params: on this remote
        # backend only fetching a value truly synchronizes —
        # block_until_ready on a device tree can return before the chain
        # has executed, reporting absurd throughput.
        return out[0]["stem1"]["w"].astype(jnp.float32).sum()

    float(loop(params, stats, bufs, ema, images, targets))  # compile+run
    t0 = time.perf_counter()
    float(loop(params, stats, bufs, ema, images, targets))
    dt = time.perf_counter() - t0
    rate = BATCH * ITERS / dt
    tflops, mfu = _mfu(step, (params, stats, bufs, ema, images, targets),
                       rate, BATCH)
    mesh_tag = f" [mesh({mesh.size}) shard_mapped]" if mesh else ""
    print(json.dumps({
        "metric": f"{MODEL} {SIZE}x{SIZE} batch{BATCH} train step"
                  f"{f' remat={_R}' if REMAT else ''}{mesh_tag} "
                  f"({jax.devices()[0].platform})",
        "value": round(rate, 2),
        "unit": "images/sec",
        "vs_baseline": None,
        "tflops": tflops,
        "mfu": mfu,
    }))


def bench_serving(exported: bool = False) -> None:
    """Production serving path: raw uint8 frames -> device letterbox ->
    fused bf16 forward -> NMS (the whole `serving.Detector` program), timed
    as a fused on-device loop. Includes everything a deployment pays per
    batch except the host->device copy of the 4x-smaller uint8 frames.

    exported (BENCH_MODE=serving_exported): round-trip the pipeline
    through `Detector.export` -> `Detector.load_exported` (single-platform
    StableHLO artifact, Mosaic kernels retained) and time the LOADED
    callable — proves the deployable artifact performs like the
    in-process program (round-4 VERDICT next #5)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.serving import Detector

    model = YOLO.from_yaml(f"configs/models/{MODEL}.yaml")
    params, stats = model.init(jax.random.key(0))
    det = Detector(model, params, stats, img_size=SIZE)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (BATCH, SIZE, SIZE, 3)), jnp.uint8)
    params, stats = det.params, det.stats

    if exported:
        path = os.path.join(tempfile.mkdtemp(), "bench.stablehlo")
        det.export(path, batch=BATCH)
        run = Detector.load_exported(path)

        def pipeline(params, stats, f):
            return run(f)   # weights baked into the artifact
    else:
        pipeline = det._pipeline

    @jax.jit
    def loop(params, stats, frames):
        def body(i, carry):
            acc, f = carry
            out = pipeline(params, stats, f)
            s = out["scores"].sum()
            # data feedback so LICM cannot hoist the pipeline out
            f = (f + (s > jnp.float32(1e30)).astype(jnp.uint8))
            return acc + s, f
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), frames))
        return acc

    float(loop(params, stats, frames))
    t0 = time.perf_counter()
    float(loop(params, stats, frames))
    dt = time.perf_counter() - t0
    rate = BATCH * ITERS / dt
    tflops, mfu = _mfu(pipeline, (params, stats, frames), rate, BATCH)
    kind = "serving-exported artifact" if exported else "serving"
    print(json.dumps({
        "metric": f"{MODEL} {SIZE}x{SIZE} batch{BATCH} {kind} "
                  f"uint8->detections ({jax.devices()[0].platform})",
        "value": round(rate, 2),
        "unit": "images/sec",
        "vs_baseline": None,
        "tflops": tflops,
        "mfu": mfu,
    }))


def main() -> None:
    if MODE == "train":
        bench_train()
        return
    if MODE == "serving":
        bench_serving()
        return
    if MODE == "serving_exported":
        bench_serving(exported=True)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_re_tpu.models.yolo import YOLO
    from yolo_re_tpu.ops.nms import non_max_suppression

    model = YOLO.from_yaml(f"configs/models/{MODEL}.yaml")
    params, stats = model.init(jax.random.key(0))
    params, stats = model.fuse(params, stats)

    mesh = None
    if MESH:
        import numpy as _np

        from yolo_re_tpu.parallel.mesh import DATA_AXIS
        mesh = jax.sharding.Mesh(_np.array(jax.devices()), (DATA_AXIS,))

    def infer(params, stats, images):
        if mesh is not None:
            from yolo_re_tpu.parallel.spmd import use_mesh
            ctx = use_mesh(mesh)
        else:
            import contextlib
            ctx = contextlib.nullcontext()
        with ctx:
            (decoded, _), _ = model.apply(params, stats, images,
                                          train=False)
            if isinstance(decoded, dict):  # dual head: main branch
                decoded = decoded["main"]
            out = non_max_suppression(decoded, conf_thres=CONF,
                                      iou_thres=IOU, backend=NMS_BACKEND,
                                      pre_topk=NMS_PRETOPK,
                                      adaptive=NMS_ADAPTIVE, mesh=mesh)
        return out

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, SIZE, SIZE, 3), np.float32),
                         dtype=jnp.bfloat16)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from yolo_re_tpu.parallel.mesh import DATA_AXIS
        images = jax.device_put(images,
                                NamedSharding(mesh, P(DATA_AXIS)))
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        stats = jax.device_put(stats, rep)
    else:
        params = jax.device_put(params)
        stats = jax.device_put(stats)

    if MODE == "dispatch":
        step = jax.jit(infer)
        out = step(params, stats, images)
        float(out["scores"].sum())  # value fetch = true synchronization
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = step(params, stats, images)
        float(out["scores"].sum())
        dt = time.perf_counter() - t0
    else:
        @jax.jit
        def loop(params, stats, images):
            # Each iteration perturbs the input with the previous result so
            # XLA cannot hoist the loop-invariant forward pass (LICM) —
            # otherwise the "loop" runs the model once.
            def body(i, carry):
                acc, x = carry
                out = infer(params, stats, x)
                s = out["scores"].sum()
                x = x + (s * 1e-12).astype(x.dtype)
                return acc + s, x
            acc, _ = jax.lax.fori_loop(
                0, ITERS, body, (jnp.float32(0), images))
            return acc

        float(loop(params, stats, images))  # compile + first run
        t0 = time.perf_counter()
        float(loop(params, stats, images))  # value fetch = true sync
        dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt
    tflops, mfu = _mfu(infer, (params, stats, images), images_per_sec, BATCH)

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "baseline_measurements.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref = base.get("reference_images_per_sec")
        if ref:
            vs_baseline = images_per_sec / ref

    if MODE == "latency":
        print(json.dumps({
            "metric": f"{MODEL} {SIZE}x{SIZE} batch{BATCH} latency incl. "
                      f"NMS ({jax.devices()[0].platform})",
            "value": round(dt / ITERS * 1e3, 3),
            "unit": "ms/batch",
            "vs_baseline": None,
            "tflops": tflops,
            "mfu": mfu,
        }))
        return
    if MODE == "eval":
        if NMS_PRETOPK:
            nms_kind = f"NMS pre_topk={NMS_PRETOPK}"
        elif NMS_ADAPTIVE is False:
            nms_kind = "all-anchor NMS"
        else:
            nms_kind = "adaptive K-bucket NMS"
        kind = f"eval-stack ({nms_kind} conf {CONF:g})"
    else:
        kind = "inference"
    if MESH:
        kind += f" [mesh({mesh.size}) shard_mapped]"
    print(json.dumps({
        "metric": f"{MODEL} {SIZE}x{SIZE} batch{BATCH} {kind} incl. NMS "
                  f"({jax.devices()[0].platform})",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "tflops": tflops,
        "mfu": mfu,
    }))


if __name__ == "__main__":
    main()
