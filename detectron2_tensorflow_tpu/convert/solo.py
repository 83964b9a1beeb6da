"""mmdetection SOLOv2 checkpoint converter.

Parity target: /root/reference/lib/convert_models/convert_solo.py:4-82.
Source names (mmdet): torchvision-style ``backbone.*``, ``neck.lateral_convs
/fpn_convs``, ``bbox_head.{cate,kernel}_convs.{i}.{conv,gn}`` + ``solo_cate/
solo_kernel``, ``mask_feat_head.convs_all_levels.{i}.conv{k}`` +
``conv_pred``. Destinations follow this framework's SOLOv2Head module tree
(models/single_stage/solov2.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import numpy as np

from .torchvision import convert_torchvision_backbone


def convert_solo_weights(sd: Dict[str, np.ndarray], cfg) -> Tuple[Dict, list]:
    """mmdet SOLOv2 state dict -> {"params", "frozen"} variables tree."""
    sd = {
        k: np.asarray(v)
        for k, v in sd.items()
        if not k.endswith("num_batches_tracked")
    }
    out, bb_left = convert_torchvision_backbone(sd, prefix="backbone.")
    params = out["params"]
    frozen = out["frozen"]
    used = {k for k in sd if k.startswith("backbone.") and k not in bb_left}

    def set_in(tree, path, v):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def conv(src, dst_path):
        used.add(src + ".weight")
        set_in(params, dst_path + ["conv", "kernel"],
               sd[src + ".weight"].transpose(2, 3, 1, 0))
        if src + ".bias" in sd:
            used.add(src + ".bias")
            set_in(params, dst_path + ["conv", "bias"], sd[src + ".bias"])

    def gn(src, dst_path):
        used.update({src + ".weight", src + ".bias"})
        set_in(params, dst_path + ["GroupNorm_0", "GroupNorm_0", "scale"],
               sd[src + ".weight"])
        set_in(params, dst_path + ["GroupNorm_0", "GroupNorm_0", "bias"],
               sd[src + ".bias"])

    # FPN neck.
    for lvl in range(2, 6):
        conv(f"neck.lateral_convs.{lvl - 2}.conv", ["neck", f"fpn_lateral{lvl}"])
        conv(f"neck.fpn_convs.{lvl - 2}.conv", ["neck", f"fpn_output{lvl}"])

    # Category / kernel towers (shared across levels).
    for i in range(cfg.MODEL.SOLO.MASK_KERNEL_NUM_CONVS):
        conv(f"bbox_head.cate_convs.{i}.conv", ["head", f"cate_tower_{i}"])
        gn(f"bbox_head.cate_convs.{i}.gn", ["head", f"cate_tower_{i}"])
        conv(f"bbox_head.kernel_convs.{i}.conv", ["head", f"kernel_tower_{i}"])
        gn(f"bbox_head.kernel_convs.{i}.gn", ["head", f"kernel_tower_{i}"])
    conv("bbox_head.solo_cate", ["head", "cate_pred"])
    conv("bbox_head.solo_kernel", ["head", "kernel_pred"])

    # Mask feature branch chains per in-feature.
    common = int(math.log2(cfg.MODEL.SOLO.MASK_FEATURE_COMMON_STRIDE))
    for i, f in enumerate(cfg.MODEL.SOLO.MASK_FEATURE_IN_FEATURES):
        head_length = max(1, int(i + 2 - common))
        for k in range(head_length):
            conv(
                f"mask_feat_head.convs_all_levels.{i}.conv{k}.conv",
                ["head", f"mask_{f}_{k}"],
            )
            gn(
                f"mask_feat_head.convs_all_levels.{i}.conv{k}.gn",
                ["head", f"mask_{f}_{k}"],
            )
    conv("mask_feat_head.conv_pred.0.conv", ["head", "mask_pred"])
    gn("mask_feat_head.conv_pred.0.gn", ["head", "mask_pred"])

    leftovers = [
        k for k in sd
        if k not in used and not k.startswith(("fc.", "backbone.fc"))
    ]
    return {"params": params, "frozen": frozen}, leftovers
