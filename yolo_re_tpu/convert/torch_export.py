"""(params, stats) pytree -> torch-reference state_dict converter.

Inverse of `torch_import.convert_state_dict`: walks the model plan and
emits a flat {key: numpy array} dict in the reference's torch naming
(reference: src/yolo/blocks/*.py, src/yolo/heads/detect.py), so weights
trained here load straight into the reference with
`ref_model.load_state_dict({k: torch.from_numpy(v)})`.

Transforms mirror the importer: conv kernels HWIO -> OIHW; BN scale ->
bn.weight, bias -> bn.bias, mean/var -> running stats, plus the
`num_batches_tracked` counter torch BN layers carry. The fixed DFL
projection convs (`dfl.conv.weight`, reference heads/dfl.py:31-34) are
derived here — this framework does not store them as parameters.

Torch is never imported; the output is plain numpy.
"""

from __future__ import annotations

import numpy as np

from yolo_re_tpu.models import blocks as B
from yolo_re_tpu.models.builder import Plan
from yolo_re_tpu.models.heads import DetectDFL, DualDetectDFL

Array = np.ndarray
SD = dict[str, Array]


def _t(w) -> Array:
    """Conv kernel HWIO -> OIHW."""
    return np.ascontiguousarray(
        np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1)))


def _v(x) -> Array:
    return np.asarray(x, np.float32)


def _conv(out: SD, p: str, params: dict, stats: dict) -> None:
    out[p + "conv.weight"] = _t(params["w"])
    out[p + "bn.weight"] = _v(params["scale"])
    out[p + "bn.bias"] = _v(params["bias"])
    out[p + "bn.running_mean"] = _v(stats["mean"])
    out[p + "bn.running_var"] = _v(stats["var"])
    out[p + "bn.num_batches_tracked"] = np.asarray(0, np.int64)


def _repconv(out: SD, p: str, params: dict, stats: dict) -> None:
    _conv(out, p + "conv1.", params["conv1"], stats["conv1"])
    _conv(out, p + "conv2.", params["conv2"], stats["conv2"])


def _bottleneck(out: SD, p: str, params: dict, stats: dict) -> None:
    _repconv(out, p + "conv1.", params["conv1"], stats["conv1"])
    _conv(out, p + "conv2.", params["conv2"], stats["conv2"])


def _repncsp(out: SD, p: str, params: dict, stats: dict) -> None:
    for name in ("conv1", "conv2", "conv3"):
        _conv(out, f"{p}{name}.", params[name], stats[name])
    for i, (bp, bs) in enumerate(zip(params["bottlenecks"],
                                     stats["bottlenecks"])):
        _bottleneck(out, f"{p}bottlenecks.{i}.", bp, bs)


def _elan(out: SD, p: str, params: dict, stats: dict) -> None:
    _conv(out, p + "conv_in.", params["conv_in"], stats["conv_in"])
    _repncsp(out, p + "block1.0.", params["csp1"], stats["csp1"])
    _conv(out, p + "block1.1.", params["conv1"], stats["conv1"])
    _repncsp(out, p + "block2.0.", params["csp2"], stats["csp2"])
    _conv(out, p + "block2.1.", params["conv2"], stats["conv2"])
    _conv(out, p + "conv_out.", params["conv_out"], stats["conv_out"])


def _sppelan(out: SD, p: str, params: dict, stats: dict) -> None:
    _conv(out, p + "conv_in.", params["conv_in"], stats["conv_in"])
    _conv(out, p + "conv_out.", params["conv_out"], stats["conv_out"])


def _adown(out: SD, p: str, params: dict, stats: dict) -> None:
    _conv(out, p + "conv_stride.", params["conv_stride"], stats["conv_stride"])
    _conv(out, p + "conv_pool.", params["conv_pool"], stats["conv_pool"])


def _cblinear(out: SD, p: str, params: dict) -> None:
    out[p + "conv.weight"] = _t(params["w"])
    out[p + "conv.bias"] = _v(params["b"])


def _tower(out: SD, box_prefix: str, cls_prefix: str,
           params: dict, stats: dict) -> None:
    for prefix, kind in ((box_prefix, "box"), (cls_prefix, "cls")):
        for j in (0, 1):
            _conv(out, f"{prefix}{j}.", params[kind][j], stats[kind][j])
        out[f"{prefix}2.weight"] = _t(params[kind][2]["w"])
        out[f"{prefix}2.bias"] = _v(params[kind][2]["b"])


def _dfl_weight(reg_max: int = 16) -> Array:
    return np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1)


def _detect(out: SD, p: str, params: dict, stats: dict) -> None:
    for i, (tp, ts) in enumerate(zip(params["towers"], stats["towers"])):
        _tower(out, f"{p}box_convs.{i}.", f"{p}cls_convs.{i}.", tp, ts)
    out[p + "dfl.conv.weight"] = _dfl_weight()


def _dual_detect(out: SD, p: str, params: dict, stats: dict) -> None:
    for i in range(len(params["aux"])):
        _tower(out, f"{p}aux_box_convs.{i}.", f"{p}aux_cls_convs.{i}.",
               params["aux"][i], stats["aux"][i])
        _tower(out, f"{p}main_box_convs.{i}.", f"{p}main_cls_convs.{i}.",
               params["main"][i], stats["main"][i])
    out[p + "dfl.conv.weight"] = _dfl_weight()
    out[p + "dfl2.conv.weight"] = _dfl_weight()


def export_state_dict(plan: Plan, params: dict, stats: dict) -> SD:
    """Convert (params, stats) into a reference-format torch state_dict."""
    out: SD = {}
    for step in plan.steps:
        p = f"layers.{step.name}."
        blk = step.block
        lp, ls = params[step.name], stats[step.name]
        if blk is B.Conv:
            _conv(out, p, lp, ls)
        elif blk is B.RepConv:
            _repconv(out, p, lp, ls)
        elif blk is B.RepNCSPELAN4:
            _elan(out, p, lp, ls)
        elif blk is B.SPPELAN:
            _sppelan(out, p, lp, ls)
        elif blk is B.ADown:
            _adown(out, p, lp, ls)
        elif blk is B.CBLinear:
            _cblinear(out, p, lp)
        elif blk is DetectDFL:
            _detect(out, p, lp, ls)
        elif blk is DualDetectDFL:
            _dual_detect(out, p, lp, ls)
        # parameter-free blocks (Concat, Silence, Upsample, CBFuse): no keys
    return out


def save_torch_checkpoint(path: str, plan: Plan, params: dict,
                          stats: dict) -> None:
    """Write a `.pt` the reference's scripts/detect.py can load directly."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(plan, params, stats).items()}
    torch.save(sd, path)
