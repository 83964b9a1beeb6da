"""torchvision / mmdet-style ResNet backbone converter.

Covers the remaining pretrained-backbone source format beyond D2 pickles and
caffe2 blobs: torch state dicts with ``conv1.weight / bn1.* / layer{1..4}.
{b}.conv{1..3} / downsample`` names (torchvision ResNets and mmdet
``backbone.*`` checkpoints — the naming convention mmdet's SOLOv2 release
uses, reference convert_solo.py territory).

Note torchvision ResNets put the stride on the 3x3 (STRIDE_IN_1X1=False) and
expect RGB with ImageNet mean/std — set MODEL.RESNETS.STRIDE_IN_1X1=False,
MODEL.INPUT_FORMAT=RGB, MODEL.PIXEL_STD=[58.395, 57.120, 57.375] when using
these weights.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def convert_torchvision_backbone(
    sd: Dict[str, np.ndarray], prefix: str = ""
) -> Tuple[Dict[str, Any], list]:
    """-> ({"params", "frozen"} under 'backbone', leftover keys).

    ``prefix``: e.g. "backbone." for mmdet full-model checkpoints.
    """
    params: Dict[str, Any] = {}
    frozen: Dict[str, Any] = {}
    used = set()

    def get(name):
        used.add(prefix + name)
        return np.asarray(sd[prefix + name])

    def has(name):
        return prefix + name in sd

    def set_in(tree, path, v):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def conv_bn(src_conv, src_bn, dst):
        set_in(params, dst + ["conv", "kernel"], get(src_conv + ".weight").transpose(2, 3, 1, 0))
        fbn = dst + ["FrozenBatchNorm_0"]
        set_in(frozen, fbn + ["scale"], get(src_bn + ".weight"))
        set_in(frozen, fbn + ["bias"], get(src_bn + ".bias"))
        set_in(frozen, fbn + ["mean"], get(src_bn + ".running_mean"))
        set_in(frozen, fbn + ["var"], get(src_bn + ".running_var"))

    conv_bn("conv1", "bn1", ["backbone", "stem", "conv1"])
    for layer in range(1, 5):
        b = 0
        while has(f"layer{layer}.{b}.conv1.weight"):
            dst_stage = f"res{layer + 1}"
            for ci in (1, 2, 3):
                if has(f"layer{layer}.{b}.conv{ci}.weight"):
                    conv_bn(
                        f"layer{layer}.{b}.conv{ci}",
                        f"layer{layer}.{b}.bn{ci}",
                        ["backbone", dst_stage, str(b), f"conv{ci}"],
                    )
            if has(f"layer{layer}.{b}.downsample.0.weight"):
                conv_bn(
                    f"layer{layer}.{b}.downsample.0",
                    f"layer{layer}.{b}.downsample.1",
                    ["backbone", dst_stage, str(b), "shortcut"],
                )
            b += 1

    leftovers = [
        k
        for k in sd
        if k not in used
        and not k.endswith("num_batches_tracked")
        and not k.startswith(("fc.", prefix + "fc."))
    ]
    return {"params": params, "frozen": frozen}, leftovers
