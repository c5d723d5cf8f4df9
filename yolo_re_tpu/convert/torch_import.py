"""Torch state_dict -> (params, stats) pytree converter.

The reference ships `scripts/convert_weights.py` to map upstream yolov9
checkpoints into its own naming; here we map the *reference's* naming
(torch, NCHW/OIHW) into this framework's pytrees (NHWC/HWIO). Key layout of
the reference (reference: src/yolo/blocks/*.py, src/yolo/heads/detect.py):

    layers.<name>.conv.weight / bn.{weight,bias,running_mean,running_var}
    layers.<name>.block1.0.* (RepNCSP) / block1.1.* (Conv) ...
    layers.<name>.box_convs.<i>.{0,1}.* / .2.{weight,bias}

Transforms: conv kernels OIHW -> HWIO; BN weight->scale, bias->bias,
running_mean->mean, running_var->var. The DFL fixed-weight conv is derived,
not loaded.

Works on a plain {key: numpy array} dict, so torch is only needed by the
optional `.pt` loader.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from yolo_re_tpu.models import blocks as B
from yolo_re_tpu.models.builder import Plan
from yolo_re_tpu.models.heads import DetectDFL, DualDetectDFL

Array = np.ndarray
SD = dict[str, Array]


def _t(sd: SD, key: str) -> Array:
    """Fetch a conv kernel and convert OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(sd[key], (2, 3, 1, 0))).astype(np.float32)


def _v(sd: SD, key: str) -> Array:
    return np.asarray(sd[key]).astype(np.float32)


def _conv(sd: SD, p: str):
    params = {"w": _t(sd, p + "conv.weight"),
              "scale": _v(sd, p + "bn.weight"),
              "bias": _v(sd, p + "bn.bias")}
    stats = {"mean": _v(sd, p + "bn.running_mean"),
             "var": _v(sd, p + "bn.running_var")}
    return params, stats


def _repconv(sd: SD, p: str):
    p1, s1 = _conv(sd, p + "conv1.")
    p2, s2 = _conv(sd, p + "conv2.")
    return {"conv1": p1, "conv2": p2}, {"conv1": s1, "conv2": s2}


def _bottleneck(sd: SD, p: str):
    p1, s1 = _repconv(sd, p + "conv1.")
    p2, s2 = _conv(sd, p + "conv2.")
    return {"conv1": p1, "conv2": p2}, {"conv1": s1, "conv2": s2}


def _repncsp(sd: SD, p: str, num_repeats: int):
    params, stats = {}, {}
    for name in ("conv1", "conv2", "conv3"):
        params[name], stats[name] = _conv(sd, f"{p}{name}.")
    params["bottlenecks"], stats["bottlenecks"] = [], []
    for i in range(num_repeats):
        bp, bs = _bottleneck(sd, f"{p}bottlenecks.{i}.")
        params["bottlenecks"].append(bp)
        stats["bottlenecks"].append(bs)
    return params, stats


def _elan(sd: SD, p: str, cfg: B.RepNCSPELAN4Config):
    params, stats = {}, {}
    params["conv_in"], stats["conv_in"] = _conv(sd, p + "conv_in.")
    params["csp1"], stats["csp1"] = _repncsp(sd, p + "block1.0.", cfg.num_repeats)
    params["conv1"], stats["conv1"] = _conv(sd, p + "block1.1.")
    params["csp2"], stats["csp2"] = _repncsp(sd, p + "block2.0.", cfg.num_repeats)
    params["conv2"], stats["conv2"] = _conv(sd, p + "block2.1.")
    params["conv_out"], stats["conv_out"] = _conv(sd, p + "conv_out.")
    return params, stats


def _sppelan(sd: SD, p: str):
    pi, si = _conv(sd, p + "conv_in.")
    po, so = _conv(sd, p + "conv_out.")
    return {"conv_in": pi, "conv_out": po}, {"conv_in": si, "conv_out": so}


def _adown(sd: SD, p: str):
    ps, ss = _conv(sd, p + "conv_stride.")
    pp, sp = _conv(sd, p + "conv_pool.")
    return ({"conv_stride": ps, "conv_pool": pp},
            {"conv_stride": ss, "conv_pool": sp})


def _cblinear(sd: SD, p: str):
    return ({"w": _t(sd, p + "conv.weight"), "b": _v(sd, p + "conv.bias")}, {})


def _tower(sd: SD, box_prefix: str, cls_prefix: str):
    params = {"box": [], "cls": []}
    stats = {"box": [], "cls": []}
    for prefix, kind in ((box_prefix, "box"), (cls_prefix, "cls")):
        for j in (0, 1):
            cp, cs = _conv(sd, f"{prefix}{j}.")
            params[kind].append(cp)
            stats[kind].append(cs)
        params[kind].append({"w": _t(sd, f"{prefix}2.weight"),
                             "b": _v(sd, f"{prefix}2.bias")})
        stats[kind].append({})
    return params, stats


def _detect(sd: SD, p: str, num_levels: int):
    towers, tstats = [], []
    for i in range(num_levels):
        tp, ts = _tower(sd, f"{p}box_convs.{i}.", f"{p}cls_convs.{i}.")
        towers.append(tp)
        tstats.append(ts)
    return {"towers": towers}, {"towers": tstats}


def _dual_detect(sd: SD, p: str, num_levels: int):
    params = {"aux": [], "main": []}
    stats = {"aux": [], "main": []}
    for i in range(num_levels):
        tp, ts = _tower(sd, f"{p}aux_box_convs.{i}.", f"{p}aux_cls_convs.{i}.")
        params["aux"].append(tp)
        stats["aux"].append(ts)
        tp, ts = _tower(sd, f"{p}main_box_convs.{i}.", f"{p}main_cls_convs.{i}.")
        params["main"].append(tp)
        stats["main"].append(ts)
    return params, stats


def convert_state_dict(plan: Plan, sd: SD) -> tuple[dict, dict]:
    """Convert a reference-format torch state_dict into (params, stats)."""
    params, stats = {}, {}
    for step in plan.steps:
        p = f"layers.{step.name}."
        blk, cfg = step.block, step.cfg
        if blk is B.Conv:
            params[step.name], stats[step.name] = _conv(sd, p)
        elif blk is B.RepConv:
            params[step.name], stats[step.name] = _repconv(sd, p)
        elif blk is B.RepNCSPELAN4:
            params[step.name], stats[step.name] = _elan(sd, p, cfg)
        elif blk is B.SPPELAN:
            params[step.name], stats[step.name] = _sppelan(sd, p)
        elif blk is B.ADown:
            params[step.name], stats[step.name] = _adown(sd, p)
        elif blk is B.CBLinear:
            params[step.name], stats[step.name] = _cblinear(sd, p)
        elif blk is DetectDFL:
            params[step.name], stats[step.name] = _detect(
                sd, p, len(cfg.in_channels))
        elif blk is DualDetectDFL:
            params[step.name], stats[step.name] = _dual_detect(
                sd, p, cfg.num_levels)
        else:  # parameter-free: Concat, Silence, Upsample, CBFuse
            params[step.name], stats[step.name] = {}, {}
    return params, stats


# ---------------------------------------------------------------------------
# Upstream WongKinYiu/yolov9 schema -> reference schema (one-hop ingestion)
# ---------------------------------------------------------------------------

# Upstream layer index -> (reference layer name, block type). These are the
# reference's hardcoded maps (reference: scripts/convert_weights.py:23-47
# gelan-c, :51-95 yolov9-c); indices without weights (Upsample, Concat,
# Silence, CBFuse) are absent. yolov9-c index 0 is Silence, so it starts at 1.
UPSTREAM_GELAN_C_LAYERS: dict[int, tuple[str, str]] = {
    0: ("stem1", "Conv"), 1: ("stem2", "Conv"),
    2: ("stage1", "RepNCSPELAN4"), 3: ("down1", "ADown"),
    4: ("stage2", "RepNCSPELAN4"), 5: ("down2", "ADown"),
    6: ("stage3", "RepNCSPELAN4"), 7: ("down3", "ADown"),
    8: ("stage4", "RepNCSPELAN4"), 9: ("spp", "SPPELAN"),
    12: ("fpn1", "RepNCSPELAN4"), 15: ("fpn2", "RepNCSPELAN4"),
    16: ("pan_down1", "ADown"), 18: ("pan1", "RepNCSPELAN4"),
    19: ("pan_down2", "ADown"), 21: ("pan2", "RepNCSPELAN4"),
    22: ("detect", "DetectDFL"),
}

UPSTREAM_YOLOV9_C_LAYERS: dict[int, tuple[str, str]] = {
    1: ("stem1", "Conv"), 2: ("stem2", "Conv"),
    3: ("stage1", "RepNCSPELAN4"), 4: ("down1", "ADown"),
    5: ("stage2", "RepNCSPELAN4"), 6: ("down2", "ADown"),
    7: ("stage3", "RepNCSPELAN4"), 8: ("down3", "ADown"),
    9: ("stage4", "RepNCSPELAN4"), 10: ("spp", "SPPELAN"),
    13: ("fpn1", "RepNCSPELAN4"), 16: ("fpn2", "RepNCSPELAN4"),
    17: ("pan_down1", "ADown"), 19: ("pan1", "RepNCSPELAN4"),
    20: ("pan_down2", "ADown"), 22: ("pan2", "RepNCSPELAN4"),
    23: ("cb_route1", "CBLinear"), 24: ("cb_route2", "CBLinear"),
    25: ("cb_route3", "CBLinear"),
    26: ("aux_stem1", "Conv"), 27: ("aux_stem2", "Conv"),
    28: ("aux_stage1", "RepNCSPELAN4"), 29: ("aux_down1", "ADown"),
    31: ("aux_stage2", "RepNCSPELAN4"), 32: ("aux_down2", "ADown"),
    34: ("aux_stage3", "RepNCSPELAN4"), 35: ("aux_down3", "ADown"),
    37: ("aux_stage4", "RepNCSPELAN4"),
    38: ("detect", "DualDetectDFL"),
}

UPSTREAM_LAYER_MAPS = {
    "gelan-c": UPSTREAM_GELAN_C_LAYERS,
    "yolov9-c": UPSTREAM_YOLOV9_C_LAYERS,
}


def _up_elan_rest(rest: str) -> str:
    """RepNCSPELAN4 upstream submodule names -> reference names
    (reference: scripts/convert_weights.py:123-176). Upstream layout:
    cv1 | cv2/cv3 = Sequential(RepNCSP, Conv) | cv4; RepNCSP holds
    cv1/cv2/cv3 + m.<i> RepNBottlenecks whose cv1 is a RepConvN
    (already named conv1/conv2 inside)."""
    if rest.startswith("cv1."):
        return "conv_in." + rest[4:]
    if rest.startswith("cv4."):
        return "conv_out." + rest[4:]
    if rest.startswith("cv2."):
        rest = "block1." + rest[4:]
    elif rest.startswith("cv3."):
        rest = "block2." + rest[4:]
    for bp in ("block1.0.", "block2.0."):
        if rest.startswith(bp):
            suffix = rest[len(bp):]
            if suffix.startswith("m."):
                suffix = "bottlenecks." + suffix[2:]
                suffix = suffix.replace(".cv1.", ".conv1.")
                suffix = suffix.replace(".cv2.", ".conv2.")
            elif suffix.startswith("cv1."):
                suffix = "conv1." + suffix[4:]
            elif suffix.startswith("cv2."):
                suffix = "conv2." + suffix[4:]
            elif suffix.startswith("cv3."):
                suffix = "conv3." + suffix[4:]
            return bp + suffix
    return rest


_UPSTREAM_REST_MAPPERS: dict[str, Callable[[str], str]] = {
    "Conv": lambda rest: rest,
    "CBLinear": lambda rest: rest,
    "ADown": lambda rest: rest.replace("cv1.", "conv_stride.")
                              .replace("cv2.", "conv_pool."),
    "SPPELAN": lambda rest: rest.replace("cv1.", "conv_in.")
                                .replace("cv5.", "conv_out."),
    "RepNCSPELAN4": _up_elan_rest,
    "DetectDFL": lambda rest: rest.replace("cv2.", "box_convs.")
                                  .replace("cv3.", "cls_convs."),
    "DualDetectDFL": lambda rest: rest.replace("cv2.", "aux_box_convs.")
                                      .replace("cv3.", "aux_cls_convs.")
                                      .replace("cv4.", "main_box_convs.")
                                      .replace("cv5.", "main_cls_convs."),
}


def _seg_swap(rest: str, table: dict[str, str]) -> str:
    """Rename only the FIRST dotted segment of `rest` via `table`."""
    head, _, tail = rest.partition(".")
    return f"{table.get(head, head)}.{tail}" if tail else table.get(head, head)


def _down_elan_rest(rest: str) -> str:
    """Inverse of `_up_elan_rest`, segment-based so the RepConv-internal
    conv1/conv2 names are never touched."""
    segs = rest.split(".")
    top = {"conv_in": "cv1", "conv_out": "cv4", "block1": "cv2",
           "block2": "cv3"}
    segs[0] = top.get(segs[0], segs[0])
    if len(segs) > 2 and segs[0] in ("cv2", "cv3") and segs[1] == "0":
        if segs[2] == "bottlenecks":
            segs[2] = "m"
            if len(segs) > 4:
                segs[4] = {"conv1": "cv1", "conv2": "cv2"}.get(segs[4],
                                                               segs[4])
        else:
            segs[2] = {"conv1": "cv1", "conv2": "cv2",
                       "conv3": "cv3"}.get(segs[2], segs[2])
    return ".".join(segs)


_DOWNSTREAM_REST_MAPPERS: dict[str, Callable[[str], str]] = {
    "Conv": lambda rest: rest,
    "CBLinear": lambda rest: rest,
    "ADown": lambda rest: _seg_swap(rest, {"conv_stride": "cv1",
                                           "conv_pool": "cv2"}),
    "SPPELAN": lambda rest: _seg_swap(rest, {"conv_in": "cv1",
                                             "conv_out": "cv5"}),
    "RepNCSPELAN4": _down_elan_rest,
    "DetectDFL": lambda rest: _seg_swap(rest, {"box_convs": "cv2",
                                               "cls_convs": "cv3"}),
    "DualDetectDFL": lambda rest: _seg_swap(
        rest, {"aux_box_convs": "cv2", "aux_cls_convs": "cv3",
               "main_box_convs": "cv4", "main_cls_convs": "cv5"}),
}


def reference_to_upstream_sd(sd: SD, model_name: str) -> SD:
    """Rename a reference-format state_dict into the upstream
    WongKinYiu/yolov9 key schema (inverse of `upstream_to_reference_sd`),
    including the fixed DFL projection conv(s) upstream checkpoints carry.
    With `torch_export.export_state_dict` this makes weights trained here
    loadable by the upstream yolov9 ecosystem."""
    mapping = UPSTREAM_LAYER_MAPS[model_name]
    name_to_idx = {name: (idx, btype) for idx, (name, btype)
                   in mapping.items()}
    out: SD = {}
    detect_type = None
    detect_idx = None
    for key, tensor in sd.items():
        if not key.startswith("layers."):
            continue
        _, name, rest = key.split(".", 2)
        if name not in name_to_idx:
            raise KeyError(f"layer {name!r} not in the {model_name} map")
        idx, btype = name_to_idx[name]
        if btype in ("DetectDFL", "DualDetectDFL"):
            detect_type, detect_idx = btype, idx
            if rest.startswith("dfl"):
                continue  # re-derived below with upstream's exact key
        out[f"model.{idx}.{_DOWNSTREAM_REST_MAPPERS[btype](rest)}"] = tensor
    if detect_type is not None:
        from yolo_re_tpu.convert.torch_export import _dfl_weight

        out[f"model.{detect_idx}.dfl.conv.weight"] = _dfl_weight()
        if detect_type == "DualDetectDFL":
            out[f"model.{detect_idx}.dfl2.conv.weight"] = _dfl_weight()
    return out


def is_upstream_state_dict(sd: SD) -> bool:
    """Upstream yolov9 names layers by integer index: model.<i>.<rest>."""
    for k in sd:
        if k.startswith("model."):
            idx = k.split(".", 2)[1]
            return idx.isdigit()
    return False


def upstream_to_reference_sd(sd: SD, model_name: str, *,
                             strict: bool = True) -> SD:
    """Rewrite an upstream WongKinYiu/yolov9 state_dict's keys into the
    reference's naming, so `convert_state_dict` ingests real pretrained
    checkpoints one-hop (reference: scripts/convert_weights.py:204-249).

    Derived-not-loaded keys (anchors/strides buffers) are dropped
    silently (BN num_batches_tracked counters are KEPT — the reference
    schema carries them and the convert CLI accounts for them); a DFL
    projection
    conv (`model.N.dfl*.conv.weight`) is VERIFIED against the arange
    projection this framework derives and raises on mismatch rather than
    silently replacing a non-standard value. Under `strict` (default),
    any other key the layer map cannot place raises KeyError naming it —
    a misread of upstream semantics (an unanticipated buffer, a fused
    RepConv layout) fails loudly instead of silently dropping weights."""
    if model_name not in UPSTREAM_LAYER_MAPS:
        raise ValueError(
            f"No upstream layer map for {model_name!r}; "
            f"have {sorted(UPSTREAM_LAYER_MAPS)}")
    mapping = UPSTREAM_LAYER_MAPS[model_name]
    out: SD = {}
    unplaced: list[str] = []
    for key, tensor in sd.items():
        parts = key.split(".", 2)
        if (key.startswith("model.") and len(parts) == 3
                and parts[1].isdigit()):
            idx, rest = int(parts[1]), parts[2]
        else:
            idx, rest = None, key
        tail = rest.rsplit(".", 1)[-1]
        if tail in ("anchors", "strides"):
            continue  # derived / not loaded
        # num_batches_tracked counters flow through the key map like any
        # other BN buffer: the reference's own converter keeps them, the
        # pytree ingestion never reads them, and the convert CLI's
        # consumed-key accounting expects them (export_state_dict emits
        # them for strict=True reference loads).
        if rest.startswith("dfl") and rest.endswith("conv.weight"):
            w = np.asarray(tensor, np.float32).reshape(-1)
            if not np.allclose(w, np.arange(w.size, dtype=np.float32)):
                raise ValueError(
                    f"{key}: DFL projection conv is not arange({w.size}) — "
                    "this framework derives it and refuses to drop a "
                    "non-standard value")
            continue
        if idx is None or idx not in mapping:
            unplaced.append(key)
            continue
        name, block_type = mapping[idx]
        out[f"layers.{name}.{_UPSTREAM_REST_MAPPERS[block_type](rest)}"] = \
            tensor
    if strict and unplaced:
        raise KeyError(
            f"{len(unplaced)} upstream key(s) not covered by the "
            f"{model_name} layer map: {sorted(unplaced)[:8]}"
            f"{' ...' if len(unplaced) > 8 else ''} "
            "(pass strict=False to drop them)")
    return out


def load_torch_checkpoint(path: str) -> SD:
    """Load a .pt state_dict (or full checkpoint container) to f32 numpy.

    Containers: upstream yolov9 training checkpoints carry both `ema`
    and `model` entries; like upstream's own `attempt_load`
    (yolov9/models/experimental.py), the EMA weights are preferred when
    present. fp16 checkpoints (upstream releases ship half precision)
    are widened to f32, matching the reference loader's `.float()`
    (reference: scripts/convert_weights.py:252-267)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and ("ema" in obj or "model" in obj):
        picked = obj.get("ema")
        if picked is None:
            picked = obj["model"]
        obj = picked
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    out: SD = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu()
            if v.is_floating_point():
                v = v.float()  # fp16 -> f32; integer counters untouched
            v = v.numpy()
        out[k] = np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# Pytree (de)serialization: flat npz with '/'-joined keys
# ---------------------------------------------------------------------------

# Sentinels keep empty containers (parameter-free layers, padding entries
# inside lists) through the flat-npz round trip — without them the tree
# structure shrinks on load and no longer lines up with the model plan.
_EMPTY_DICT = "__empty_dict__"
_EMPTY_LIST = "__empty_list__"


def flatten_tree(tree: Any, prefix: str = "") -> dict[str, Array]:
    out: dict[str, Array] = {}
    if isinstance(tree, dict):
        if not tree:
            out[f"{prefix}{_EMPTY_DICT}"] = np.zeros(0, np.uint8)
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            out[f"{prefix}{_EMPTY_LIST}"] = np.zeros(0, np.uint8)
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict[str, Array]) -> Any:
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        if parts[-1] == _EMPTY_DICT:
            continue  # navigation already created the empty dict
        if parts[-1] == _EMPTY_LIST:
            node[_EMPTY_LIST] = True
            continue
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node.get(_EMPTY_LIST) is True and len(node) == 1:
            return []
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, params: dict, stats: dict) -> None:
    flat = {f"params/{k}": v for k, v in flatten_tree(params).items()}
    flat.update({f"stats/{k}": v for k, v in flatten_tree(stats).items()})
    np.savez(path, **flat)


def load_params(path: str) -> tuple[dict, dict]:
    data = np.load(path)
    if any(k.startswith("ema_params/") for k in data.files):
        # Full training checkpoint (save_checkpoint) — it shares the
        # params/stats prefixes, so loading it here would silently return
        # the raw last-step weights instead of the EMA weights that
        # validation ran on. Force callers through load_checkpoint.
        raise ValueError(
            f"{path} is a full training checkpoint, not a bare params file;"
            " use yolo_re_tpu.train.checkpoint.load_checkpoint (EMA weights"
            " are in ckpt['ema'])")
    params_flat, stats_flat = {}, {}
    for k in data.files:
        if k.startswith("params/"):
            params_flat[k[len("params/"):]] = data[k]
        elif k.startswith("stats/"):
            stats_flat[k[len("stats/"):]] = data[k]
    return unflatten_tree(params_flat), unflatten_tree(stats_flat)
