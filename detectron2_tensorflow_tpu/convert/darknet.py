"""Darknet .weights importer (YOLOv4), manifest-driven.

Parity target: /root/reference/lib/convert_models/convert_yolov4.py:6-74.
Like the reference, the binary is interpreted through a JSON manifest listing
conv nodes in file order::

    {"nodes": [{"name": "backbone/stem", "in_channels": 3,
                "out_channels": 32, "size": 3}, ...],
     "norm": {"backbone/stem": "bn", ...}}

Per node the darknet layout is: bias[out] (beta when normed), then for BN:
gamma[out], mean[out], var[out], then weights (OIHW -> transposed to HWIO).
Node names are slash-joined paths into this framework's variables tree; a
conv node maps to ``params/<path>/conv/kernel`` (+ ``bias`` or BN stats).
No x/y channel permutation is needed for the pred layers: this framework is
xyxy like darknet itself (the reference permutes because it is yxyx).

``emit_manifest_nodes`` generates the node skeleton from a built model so
the manifest order can be aligned with an official .weights file.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Tuple

import numpy as np

HEADER_INTS = 5  # major, minor, revision (int32) + seen (int64 = 2 slots)


def read_darknet_blob(path: str, skip_header: bool = True) -> np.ndarray:
    with open(path, "rb") as f:
        data = np.fromfile(f, dtype=np.float32)
    return data[HEADER_INTS:] if skip_header else data


def convert_darknet_weights(
    blob: np.ndarray, manifest: Dict
) -> Tuple[Dict[str, Any], int]:
    """(variables tree {"params", "batch_stats", "frozen"...}, floats consumed).

    Per-node ``norm`` values:
      * ``"bn"``     -> trainable BN: beta/gamma to ``params/<p>/BatchNorm_0``
        (outer wrapper + inner flax BatchNorm share the auto-name), running
        mean/var to ``batch_stats``;
      * ``"frozen"`` -> FrozenBN (the default backbone norm): all four
        tensors to ``frozen/<p>/FrozenBatchNorm_0``;
      * absent       -> plain conv bias.
    The darknet binary layout is identical for both BN flavors (beta, gamma,
    rolling_mean, rolling_var, then OIHW weights) — the flavor only decides
    WHERE the tensors land in this framework's tree.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    frozen: Dict[str, Any] = {}

    def set_in(tree, path, v):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    start = 0

    def take(n):
        nonlocal start
        v = blob[start : start + n]
        assert len(v) == n, (
            f"darknet blob exhausted at {start} (+{n} of {len(blob)})"
        )
        start += n
        return np.asarray(v, np.float32)

    for node in manifest["nodes"]:
        path = node["name"].split("/")
        cin, cout, k = node["in_channels"], node["out_channels"], node["size"]
        bias = take(cout)
        norm = manifest.get("norm", {}).get(node["name"])
        if norm == "bn":
            gamma = take(cout)
            mean = take(cout)
            var = take(cout)
            # Wrapper BatchNorm module + inner flax nn.BatchNorm — both
            # auto-named, so the tree nests <p>/BatchNorm_0/BatchNorm_0
            # (same doubling as GroupNorm in convert/solo.py).
            bn_path = path + ["BatchNorm_0", "BatchNorm_0"]
            set_in(params, bn_path + ["bias"], bias)
            set_in(params, bn_path + ["scale"], gamma)
            set_in(batch_stats, bn_path + ["mean"], mean)
            set_in(batch_stats, bn_path + ["var"], var)
        elif norm == "frozen":
            gamma = take(cout)
            mean = take(cout)
            var = take(cout)
            fb_path = path + ["FrozenBatchNorm_0"]
            set_in(frozen, fb_path + ["bias"], bias)
            set_in(frozen, fb_path + ["scale"], gamma)
            set_in(frozen, fb_path + ["mean"], mean)
            set_in(frozen, fb_path + ["var"], var)
        elif norm:
            raise ValueError(f"unknown manifest norm '{norm}' at {node['name']}")
        else:
            set_in(params, path + ["conv", "bias"], bias)
        w = take(cin * cout * k * k).reshape(cout, cin, k, k)
        set_in(params, path + ["conv", "kernel"], w.transpose(2, 3, 1, 0))

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    if frozen:
        out["frozen"] = frozen
    return out, start


def emit_manifest_nodes(variables: Dict) -> List[Dict]:
    """Walk a built model's variables and emit conv-node entries (in tree
    order — reorder to the .weights file order before use)."""
    nodes = []

    def walk(tree, path):
        if "conv" in tree and isinstance(tree["conv"], dict) and "kernel" in tree["conv"]:
            kh, kw, cin, cout = tree["conv"]["kernel"].shape
            nodes.append(
                {
                    "name": "/".join(path),
                    "in_channels": int(cin),
                    "out_channels": int(cout),
                    "size": int(kh),
                }
            )
        for k, v in tree.items():
            if isinstance(v, dict) and k != "conv":
                walk(v, path + [k])

    walk(variables["params"], [])
    return nodes


def emit_manifest(variables: Dict) -> Dict:
    """Full manifest skeleton from a built model: conv nodes in tree order
    PLUS the per-node norm map derived from the model's own collections
    ("bn" where the node declares a trainable BatchNorm in params, "frozen"
    where FrozenBN tensors live in the frozen collection) — so hand-written
    manifests cannot mis-route BN stats."""

    def subtree(tree, path):
        for k in path:
            tree = tree.get(k, {}) if isinstance(tree, dict) else {}
        return tree if isinstance(tree, dict) else {}

    nodes = emit_manifest_nodes(variables)
    norm = {}
    frozen = variables.get("frozen", {})
    for n in nodes:
        path = n["name"].split("/")
        if "BatchNorm_0" in subtree(variables["params"], path):
            norm[n["name"]] = "bn"
        elif "FrozenBatchNorm_0" in subtree(frozen, path):
            norm[n["name"]] = "frozen"
    return {"nodes": nodes, "norm": norm}
