"""caffe2/MSRA backbone-only checkpoint converter (PRETRAINS.BACKBONE path).

Parity target: /root/reference/lib/convert_models/convert_backbone.py.
Detectron/caffe2 ResNet pickles use names like ``res2_0_branch2a_w`` with
BN affine absorbed (``_bn_s``/``_bn_b``, no running stats — caffe2 folded
mean/var into scale/bias at release time). Mapping:

    branch2a -> conv1, branch2b -> conv2, branch2c -> conv3,
    branch1 -> shortcut, conv1 -> stem.conv1
    _w -> conv/kernel (OIHW->HWIO), _bn_s -> FrozenBN scale, _bn_b -> bias
    (FrozenBN mean := 0, var := 1, matching the absorbed statistics)
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict, Tuple

import numpy as np


def load_caffe2_pickle(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("blobs", data)
    return {k: np.asarray(v) for k, v in blobs.items() if not k.endswith("_momentum")}


def convert_caffe2_backbone(blobs: Dict[str, np.ndarray]) -> Tuple[Dict, list]:
    """-> ({"params": {...}, "frozen": {...}} under the 'backbone' subtree,
    leftover key list)."""
    params: Dict[str, Any] = {}
    frozen: Dict[str, Any] = {}

    def set_in(tree, path, v):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def put(dst_path, w=None, bn_s=None, bn_b=None):
        if w is not None:
            set_in(params, dst_path + ["conv", "kernel"], w.transpose(2, 3, 1, 0))
        if bn_s is not None:
            fbn = dst_path + ["FrozenBatchNorm_0"]
            set_in(frozen, fbn + ["scale"], bn_s)
            set_in(frozen, fbn + ["bias"], bn_b)
            set_in(frozen, fbn + ["mean"], np.zeros_like(bn_s))
            set_in(frozen, fbn + ["var"], np.ones_like(bn_s) - 1e-5)

    used = set()

    def take(name):
        used.add(name)
        return blobs.get(name)

    # Stem.
    put(
        ["backbone", "stem", "conv1"],
        take("conv1_w"),
        take("res_conv1_bn_s"),
        take("res_conv1_bn_b"),
    )

    branch_map = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3",
                  "branch1": "shortcut"}
    pat = re.compile(r"^res(\d)_(\d+)_(branch\w+)_w$")
    for name in list(blobs):
        m = pat.match(name)
        if not m:
            continue
        stage, block, branch = m.group(1), m.group(2), m.group(3)
        cname = branch_map[branch]
        base = f"res{stage}_{block}_{branch}"
        put(
            ["backbone", f"res{stage}", block, cname],
            take(base + "_w"),
            take(base + "_bn_s"),
            take(base + "_bn_b"),
        )

    leftovers = [
        k for k in blobs
        if k not in used and not k.startswith(("fc1000", "pred"))
    ]
    return {"params": params, "frozen": frozen}, leftovers
