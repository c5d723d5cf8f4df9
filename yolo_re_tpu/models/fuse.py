"""Inference-time re-parameterization: fold BN into convs, merge RepConv.

The reference never fuses (SURVEY §2.4.8) — its RepConv runs both branches
at inference. Here `fuse_model` walks the plan and produces a new params
pytree where every Conv+BN collapses to conv+bias and every RepConv's
3x3+1x1 pair collapses to a single 3x3 conv. The fused model does strictly
less work per image and XLA fuses the bias+SiLU epilogue into each conv.

Parity note: fused numerics differ from unfused at float rounding level;
equivalence tests compare the unfused path (atol 1e-5 like the reference
harness, scripts/validate_equivalence.py) and separately bound the
fused-vs-unfused drift.
"""

from __future__ import annotations

from typing import Any

from yolo_re_tpu.models import blocks as B
from yolo_re_tpu.models.builder import Plan
from yolo_re_tpu.models.heads import (
    DetectDFL,
    DetectDFLConfig,
    DualDetectDFL,
    DualDetectDFLConfig,
    _tower_cfgs,
    head_widths,
)

Params = dict[str, Any]

# Fast-path weight markers this fuse pass can emit into the params tree.
# MOSAIC_MARKER_KEYS is the Mosaic-dependent cluster — weights whose
# consumers only lower on TPU (the Pallas stem/ADown/chain kernels) plus
# the keys structurally tied to a kernel's output layout (packed_rows:
# stem2 consuming the stem kernel's row-paired output; emit_packed: the
# producer marker ADown's kernel branch keys on). serving._strip_pallas
# drops exactly this set for portable (multi-platform) export.
# FASTPATH_MARKER_KEYS adds "packed" — the stage1 width-packed ELAN
# weights, which are a plain-XLA (portable) fast path and therefore NOT
# stripped; scripts/audit_kernel_engagement.py reports the full set.
MOSAIC_MARKER_KEYS = ("pallas", "emit_packed", "pallas_stem",
                      "packed_rows", "chain")
FASTPATH_MARKER_KEYS = MOSAIC_MARKER_KEYS + ("packed",)


def _fuse(block, cfg, params, stats) -> tuple[Params, Params]:
    if block is B.Conv:
        return B.Conv.fuse(cfg, params, stats)
    if block is B.RepConv:
        return B.RepConv.fuse(cfg, params, stats)
    if block in (B.CBLinear, B.CBFuse, B.Concat, B.Silence, B.Upsample):
        return params, stats

    if block is B.RepNBottleneck:
        c1, c2 = B.RepNBottleneck._sub(cfg)
        p1, _ = _fuse(B.RepConv, c1, params["conv1"], stats["conv1"])
        p2, _ = _fuse(B.Conv, c2, params["conv2"], stats["conv2"])
        return {"conv1": p1, "conv2": p2}, {"conv1": {}, "conv2": {}}

    if block is B.RepNCSP:
        c1, c2, c3, cb = B.RepNCSP._sub(cfg)
        out_p = {
            "conv1": _fuse(B.Conv, c1, params["conv1"], stats["conv1"])[0],
            "conv2": _fuse(B.Conv, c2, params["conv2"], stats["conv2"])[0],
            "conv3": _fuse(B.Conv, c3, params["conv3"], stats["conv3"])[0],
            "bottlenecks": [
                _fuse(B.RepNBottleneck, cb, p, s)[0]
                for p, s in zip(params["bottlenecks"], stats["bottlenecks"])
            ],
        }
        out_s = {"conv1": {}, "conv2": {}, "conv3": {},
                 "bottlenecks": [{"conv1": {}, "conv2": {}}
                                 for _ in params["bottlenecks"]]}
        return out_p, out_s

    if block is B.RepNCSPELAN4:
        cin, csp1, cv1, csp2, cv2, cout = B.RepNCSPELAN4._sub(cfg)
        sub = {"conv_in": (B.Conv, cin), "csp1": (B.RepNCSP, csp1),
               "conv1": (B.Conv, cv1), "csp2": (B.RepNCSP, csp2),
               "conv2": (B.Conv, cv2), "conv_out": (B.Conv, cout)}
        out_p, out_s = {}, {}
        for name, (cls, c) in sub.items():
            out_p[name], out_s[name] = _fuse(cls, c, params[name], stats[name])
        from yolo_re_tpu.ops import packed_elan
        if packed_elan.supports_packing(cfg):
            # Width-packed re-expression of the sub-128-lane stage1 graph
            # (1.40x on v5e; see ops/packed_elan.py). The regular fused
            # weights are kept as the fallback for widths not divisible
            # by 4; XLA prunes whichever set the traced program ignores.
            out_p["packed"] = packed_elan.build_packed_elan(out_p)
            out_s["packed"] = {}
        return out_p, out_s

    if block is B.SPPELAN:
        cin, cout = B.SPPELAN._sub(cfg)
        return ({
            "conv_in": _fuse(B.Conv, cin, params["conv_in"], stats["conv_in"])[0],
            "conv_out": _fuse(B.Conv, cout, params["conv_out"], stats["conv_out"])[0],
        }, {"conv_in": {}, "conv_out": {}})

    if block is B.ADown:
        cs, cp = B.ADown._sub(cfg)
        return ({
            "conv_stride": _fuse(B.Conv, cs, params["conv_stride"],
                                 stats["conv_stride"])[0],
            "conv_pool": _fuse(B.Conv, cp, params["conv_pool"],
                               stats["conv_pool"])[0],
        }, {"conv_stride": {}, "conv_pool": {}})

    if block is DetectDFL:
        assert isinstance(cfg, DetectDFLConfig)
        c2, c3 = head_widths(cfg.in_channels[0], cfg.num_classes, cfg.reg_max)
        towers, tstats = [], []
        for i, ch in enumerate(cfg.in_channels):
            towers.append(_fuse_tower(params["towers"][i], stats["towers"][i],
                                      ch, c2, c3, cfg))
            tstats.append({"box": [{}, {}, {}], "cls": [{}, {}, {}]})
        return {"towers": towers}, {"towers": tstats}

    if block is DualDetectDFL:
        assert isinstance(cfg, DualDetectDFLConfig)
        n = cfg.num_levels
        ch_aux, ch_main = cfg.in_channels[:n], cfg.in_channels[n:]
        c2, c3 = head_widths(ch_aux[0], cfg.num_classes, cfg.reg_max)
        c4, c5 = head_widths(ch_main[0], cfg.num_classes, cfg.reg_max)
        out_p = {"aux": [], "main": []}
        out_s = {"aux": [], "main": []}
        for i in range(n):
            out_p["aux"].append(_fuse_tower(params["aux"][i], stats["aux"][i],
                                            ch_aux[i], c2, c3, cfg))
            out_p["main"].append(_fuse_tower(params["main"][i], stats["main"][i],
                                             ch_main[i], c4, c5, cfg))
            empty = {"box": [{}, {}, {}], "cls": [{}, {}, {}]}
            out_s["aux"].append(empty)
            out_s["main"].append(dict(empty))
        return out_p, out_s

    raise ValueError(f"Don't know how to fuse block {block}")


def _expand_grouped(w, groups: int):
    """Bake the block-diagonal dense expansion into the fused weights (the
    ungrouped lowering is faster on v5e — measured: 3x3 64ch g=4 at 80x80
    batch 32: 0.87 -> 0.70 ms; 1x1: 0.79 -> 0.57 ms). conv2d does the same
    expansion on the fly for bf16 inputs; baking it here makes it free."""
    from yolo_re_tpu.ops.conv import _block_diag_expand

    return _block_diag_expand(w, groups)


def _fuse_tower(params, stats, ch, c2, c3, cfg):
    box_cfgs, cls_cfgs = _tower_cfgs(ch, c2, c3, cfg.num_classes, cfg.reg_max)
    out = {"box": [], "cls": []}
    for i, c in enumerate(box_cfgs):
        p = _fuse(B.Conv, c, params["box"][i], stats["box"][i])[0]
        if c.groups > 1:
            p = dict(p, w=_expand_grouped(p["w"], c.groups))
        out["box"].append(p)
    final = params["box"][2]  # final 1x1 already conv+bias; groups=4
    out["box"].append(dict(final, w=_expand_grouped(final["w"], 4)))
    for i, c in enumerate(cls_cfgs):
        out["cls"].append(_fuse(B.Conv, c, params["cls"][i], stats["cls"][i])[0])
    out["cls"].append(params["cls"][2])
    return out


def fuse_model(plan: Plan, params: Params, stats: Params) -> tuple[Params, Params]:
    """Fuse every layer in the plan; returns (fused_params, empty_stats)."""
    out_p, out_s = {}, {}
    for step in plan.steps:
        out_p[step.name], out_s[step.name] = _fuse(
            step.block, step.cfg, params.get(step.name, {}),
            stats.get(step.name, {}))

    # Post-pass: an ADown whose sole producer is a width-packed ELAN (and
    # is that ELAN's sole consumer) runs as one Pallas kernel over the
    # producer's packed layout — the ELAN skips its un-packing reshape
    # and the kernel fuses avgpool + both branches in VMEM
    # (ops/pallas/adown_kernel.py). Measured on v5e: 3.64 ms vs 3.76 ms
    # for the XLA graph PLUS the ~1.4 ms un-packing relayout the regular
    # path pays at this boundary. YOLO_TPU_PALLAS_ADOWN=0 disables.
    import os

    consumers_of: dict[str, list] = {}
    for step in plan.steps:
        for src in step.inputs:
            consumers_of.setdefault(src, []).append(step)

    # Post-pass: the 3-channel stem conv runs as a Pallas kernel emitting
    # a row-paired packed layout, and its sole consumer (the k3 s2 second
    # conv) reads that layout as a dense (2,3)-window conv
    # (ops/pallas/stem_kernel.py). Measured on v5e gelan-c/640 batch 32:
    # stem1 2.93 ms vs 4.18, stem2 2.68 ms vs 4.41 — the NHWC layouts
    # are T(8,128) lane-padded to 2x their size in HBM; the packed pair
    # is exactly tiled. YOLO_TPU_PALLAS_STEM=0 disables.
    if os.environ.get("YOLO_TPU_PALLAS_STEM", "1") == "1":
        from yolo_re_tpu.ops.pallas.stem_kernel import (
            build_stem_kernel_weights,
            pack_next_conv_weights,
        )
        for step in plan.steps:
            if not (step.block is B.Conv and step.cfg.in_channels == 3
                    and step.cfg.kernel_size == 3 and step.cfg.stride == 2
                    and step.cfg.dilation == 1 and step.cfg.groups == 1
                    and step.cfg.padding in (None, 1)
                    and step.cfg.activation == "silu"):
                continue
            cons = consumers_of.get(step.name, [])
            if len(cons) != 1:
                continue
            nxt = cons[0]
            if not (nxt.block is B.Conv and len(nxt.inputs) == 1
                    and nxt.cfg.kernel_size == 3 and nxt.cfg.stride == 2
                    and nxt.cfg.dilation == 1 and nxt.cfg.groups == 1
                    and nxt.cfg.padding in (None, 1)
                    and nxt.cfg.in_channels == step.cfg.out_channels):
                continue
            out_p[step.name]["pallas_stem"] = build_stem_kernel_weights(
                out_p[step.name])
            out_p[nxt.name]["packed_rows"] = pack_next_conv_weights(
                out_p[nxt.name])

    if os.environ.get("YOLO_TPU_PALLAS_ADOWN", "1") != "1":
        return out_p, out_s
    from yolo_re_tpu.ops.pallas.adown_kernel import (
        C as ADOWN_C,
        build_adown_kernel_weights,
    )
    consumers: dict[str, int] = {}
    for step in plan.steps:
        for src in step.inputs:
            consumers[src] = consumers.get(src, 0) + 1
    by_name = {s.name: s for s in plan.steps}
    for step in plan.steps:
        if (step.block is B.ADown and len(step.inputs) == 1
                and step.cfg.in_channels == ADOWN_C):
            prod = by_name.get(step.inputs[0])
            if (prod is not None and "packed" in out_p.get(prod.name, {})
                    and consumers.get(prod.name) == 1):
                out_p[step.name]["pallas"] = build_adown_kernel_weights(
                    out_p[step.name])
                out_s[step.name]["pallas"] = {}
                out_p[prod.name]["packed"]["emit_packed"] = {}
    return out_p, out_s
