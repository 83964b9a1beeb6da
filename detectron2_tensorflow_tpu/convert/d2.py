"""Detectron2 checkpoint -> framework variables converter.

The AP-parity contract (reference: /root/reference/lib/convert_models/
convert_d2.py:4-187): converted weights must reproduce D2's published COCO
numbers. Because this framework keeps D2's xyxy box order, NO delta
permutation or box-coordinate reordering is needed (the reference, being
yxyx, permutes bbox_pred rows at convert_d2.py:66-100) — conversion is pure
renaming plus layout transposes:

  * conv:   torch OIHW           -> HWIO           (transpose 2,3,1,0)
  * fc:     torch (out, in)      -> (in, out)      (transpose)
  * fc1 after pooling: rows reordered CHW -> HWC (D2 flattens NCHW pooled
    features, we flatten NHWC; reference does the same at :134-146)
  * deconv: torch (in,out,kh,kw) -> flipped HWIO' (transpose(2,3,0,1)[::-1,::-1];
    verified exact against torch.nn.functional.conv_transpose2d)
  * BN stats -> the ``frozen`` collection (FrozenBatchNorm)

Supports D2 .pkl model zoo files ({"model": {name: ndarray}}) and torch
.pth state dicts.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Tuple

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a D2 pickle or torch checkpoint into {name: np.ndarray}."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
        return {k: np.asarray(v) for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data.get("state_dict", data))
    return {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in sd.items()
        if not k.endswith("num_batches_tracked")
    }


class _TreeWriter:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.frozen: Dict[str, Any] = {}

    @staticmethod
    def _set(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv(self, sd, src, dst_path, transpose=True):
        """Copy a conv (+ optional attached norm / deform offsets) from D2
        name ``src``."""
        w = sd.pop(src + ".weight")
        if transpose:
            w = w.transpose(2, 3, 1, 0)
        if src + "_offset.weight" in sd:
            # Deformable conv: main kernel is a bare param; offset conv nested;
            # the trailing norm lives beside the conv as "<name>_norm".
            self._set(self.params, dst_path + ["kernel"], w)
            self._set(
                self.params,
                dst_path + ["conv_offset", "kernel"],
                sd.pop(src + "_offset.weight").transpose(2, 3, 1, 0),
            )
            self._set(
                self.params,
                dst_path + ["conv_offset", "bias"],
                sd.pop(src + "_offset.bias"),
            )
            norm_dst = dst_path[:-1] + [dst_path[-1] + "_norm"]
            if src + ".norm.running_var" in sd:
                self._set(self.frozen, norm_dst + ["scale"], sd.pop(src + ".norm.weight"))
                self._set(self.frozen, norm_dst + ["bias"], sd.pop(src + ".norm.bias"))
                self._set(self.frozen, norm_dst + ["mean"], sd.pop(src + ".norm.running_mean"))
                self._set(self.frozen, norm_dst + ["var"], sd.pop(src + ".norm.running_var"))
            return
        self._set(self.params, dst_path + ["conv", "kernel"], w)
        if src + ".bias" in sd:
            self._set(self.params, dst_path + ["conv", "bias"], sd.pop(src + ".bias"))
        if src + ".norm.weight" in sd:
            if src + ".norm.running_var" in sd:  # FrozenBN
                self._set(self.frozen, dst_path + ["FrozenBatchNorm_0", "scale"], sd.pop(src + ".norm.weight"))
                self._set(self.frozen, dst_path + ["FrozenBatchNorm_0", "bias"], sd.pop(src + ".norm.bias"))
                self._set(self.frozen, dst_path + ["FrozenBatchNorm_0", "mean"], sd.pop(src + ".norm.running_mean"))
                self._set(self.frozen, dst_path + ["FrozenBatchNorm_0", "var"], sd.pop(src + ".norm.running_var"))
            else:  # GroupNorm
                self._set(self.params, dst_path + ["GroupNorm_0", "GroupNorm_0", "scale"], sd.pop(src + ".norm.weight"))
                self._set(self.params, dst_path + ["GroupNorm_0", "GroupNorm_0", "bias"], sd.pop(src + ".norm.bias"))

    def fc(self, sd, src, dst_path, pooled_shape: Tuple[int, int, int] | None = None):
        w = sd.pop(src + ".weight")  # (out, in)
        if pooled_shape is not None:
            c, h, ww = pooled_shape
            w = w.reshape(-1, c, h, ww).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        self._set(self.params, dst_path + ["kernel"], w.transpose())
        self._set(self.params, dst_path + ["bias"], sd.pop(src + ".bias"))

    def deconv(self, sd, src, dst_path):
        w = sd.pop(src + ".weight")  # (in, out, kh, kw)
        w = w.transpose(2, 3, 0, 1)[::-1, ::-1]
        self._set(self.params, dst_path + ["deconv", "kernel"], np.ascontiguousarray(w))
        if src + ".bias" in sd:
            self._set(self.params, dst_path + ["deconv", "bias"], sd.pop(src + ".bias"))


def convert_d2_weights(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Map a D2 state dict onto this framework's variables tree.

    Returns {"params": ..., "frozen": ...} with numpy leaves. Raises if any
    expected key is missing; warns (returns leftovers) via the second value.
    """
    sd = dict(sd)
    w = _TreeWriter()
    has_fpn = cfg.MODEL.NECK.NAME == "FPN"
    is_retina = cfg.MODEL.META_ARCHITECTURE == "SingleStageDetector"
    use_res5_heads = cfg.MODEL.ROI_HEADS.NAME == "Res5ROIHeads"

    bb = "backbone.bottom_up." if has_fpn else "backbone."
    blocks = {18: (2,2,2,2), 34: (3,4,6,3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[
        cfg.MODEL.RESNETS.DEPTH
    ]
    w.conv(sd, bb + "stem.conv1", ["backbone", "stem", "conv1"])
    num_stages = 3 if (use_res5_heads and not has_fpn) else 4
    for g in range(num_stages):
        src_prefix = bb
        dst_head = "backbone"
        for b in range(blocks[g]):
            for cname in ("conv1", "conv2", "conv3"):
                if src_prefix + f"res{g + 2}.{b}.{cname}.weight" in sd:
                    w.conv(
                        sd,
                        src_prefix + f"res{g + 2}.{b}.{cname}",
                        [dst_head, f"res{g + 2}", str(b), cname],
                    )
            if src_prefix + f"res{g + 2}.{b}.shortcut.weight" in sd:
                w.conv(
                    sd,
                    src_prefix + f"res{g + 2}.{b}.shortcut",
                    [dst_head, f"res{g + 2}", str(b), "shortcut"],
                )
    if use_res5_heads:
        # C4 models keep res5 inside the ROI heads (shared transform).
        for b in range(blocks[3]):
            for cname in ("conv1", "conv2", "conv3"):
                if f"roi_heads.res5.{b}.{cname}.weight" in sd:
                    w.conv(sd, f"roi_heads.res5.{b}.{cname}", ["res5", str(b), cname])
            if f"roi_heads.res5.{b}.shortcut.weight" in sd:
                w.conv(sd, f"roi_heads.res5.{b}.shortcut", ["res5", str(b), "shortcut"])

    if has_fpn:
        stages = sorted(
            int(k.split("fpn_lateral")[1].split(".")[0])
            for k in sd
            if k.startswith("backbone.fpn_lateral") and k.endswith(".weight")
        )
        for lvl in stages:
            w.conv(sd, f"backbone.fpn_lateral{lvl}", ["neck", f"fpn_lateral{lvl}"])
            w.conv(sd, f"backbone.fpn_output{lvl}", ["neck", f"fpn_output{lvl}"])
        for lvl in (6, 7):
            if f"backbone.top_block.p{lvl}.weight" in sd:
                w.conv(sd, f"backbone.top_block.p{lvl}", ["neck", f"top_block_p{lvl}"])

    if is_retina:
        n_convs = cfg.MODEL.RETINANET.NUM_CONVS
        for i in range(n_convs):
            w.conv(sd, f"head.cls_subnet.{2 * i}", ["head", f"cls_subnet_{i}"])
            w.conv(sd, f"head.bbox_subnet.{2 * i}", ["head", f"bbox_subnet_{i}"])
        w.conv(sd, "head.cls_score", ["head", "cls_score"])
        w.conv(sd, "head.bbox_pred", ["head", "bbox_pred"])
    else:
        # RPN
        rpn = "proposal_generator.rpn_head."
        w.conv(sd, rpn + "conv", ["rpn_head", "conv"])
        w.conv(sd, rpn + "objectness_logits", ["rpn_head", "objectness_logits"])
        w.conv(sd, rpn + "anchor_deltas", ["rpn_head", "anchor_deltas"])
        # Box head: convs then FCs; fc1 needs the CHW->HWC row relayout.
        bh_res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
        conv_dim = cfg.MODEL.ROI_BOX_HEAD.CONV_DIM
        in_ch = cfg.MODEL.NECK.OUT_CHANNELS if has_fpn else None
        for i in range(cfg.MODEL.ROI_BOX_HEAD.NUM_CONV):
            w.conv(sd, f"roi_heads.box_head.conv{i + 1}", ["box_heads_0", f"conv{i + 1}"])
        first_fc_ch = conv_dim if cfg.MODEL.ROI_BOX_HEAD.NUM_CONV > 0 else in_ch
        if cfg.MODEL.ROI_HEADS.NAME == "CascadeROIHeads":
            # D2 cascade: roi_heads.box_head.{k}.fcN / box_predictor.{k}.*
            num_stages = len(cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS)
            for k in range(num_stages):
                for i in range(cfg.MODEL.ROI_BOX_HEAD.NUM_FC):
                    pooled = (first_fc_ch, bh_res, bh_res) if i == 0 else None
                    w.fc(
                        sd, f"roi_heads.box_head.{k}.fc{i + 1}",
                        [f"box_heads_{k}", f"fc{i + 1}"], pooled,
                    )
                w.fc(
                    sd, f"roi_heads.box_predictor.{k}.cls_score",
                    [f"box_predictors_{k}", "cls_score"],
                )
                w.fc(
                    sd, f"roi_heads.box_predictor.{k}.bbox_pred",
                    [f"box_predictors_{k}", "bbox_pred"],
                )
        else:
            for i in range(cfg.MODEL.ROI_BOX_HEAD.NUM_FC):
                pooled = (first_fc_ch, bh_res, bh_res) if i == 0 else None
                w.fc(
                    sd, f"roi_heads.box_head.fc{i + 1}",
                    ["box_heads_0", f"fc{i + 1}"], pooled,
                )
            w.fc(sd, "roi_heads.box_predictor.cls_score", ["box_predictors_0", "cls_score"])
            w.fc(sd, "roi_heads.box_predictor.bbox_pred", ["box_predictors_0", "bbox_pred"])
        if cfg.MODEL.MASK_ON:
            for i in range(cfg.MODEL.ROI_MASK_HEAD.NUM_CONV):
                w.conv(
                    sd, f"roi_heads.mask_head.mask_fcn{i + 1}", ["mask_head", f"mask_fcn{i + 1}"]
                )
            w.deconv(sd, "roi_heads.mask_head.deconv", ["mask_head", "deconv"])
            w.conv(sd, "roi_heads.mask_head.predictor", ["mask_head", "predictor"])
        if cfg.MODEL.KEYPOINT_ON:
            for i in range(len(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS)):
                w.conv(
                    sd,
                    f"roi_heads.keypoint_head.conv_fcn{i + 1}",
                    ["keypoint_head", f"conv_fcn{i + 1}"],
                )
            w.deconv(
                sd, "roi_heads.keypoint_head.score_lowres",
                ["keypoint_head", "score_lowres"],
            )

    leftovers = [k for k in sd if "cell_anchors" not in k and "anchor_generator" not in k and "pixel_" not in k]
    out = {"params": w.params, "frozen": w.frozen}
    return out, leftovers


def apply_converted(variables, converted) -> Dict[str, Any]:
    """Merge converted numpy leaves into an initialized variables tree,
    checking shapes. Returns the updated tree."""
    import jax
    import jax.numpy as jnp

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    raise KeyError(f"converted subtree {path}/{k} not in model")
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                if k not in dst:
                    raise KeyError(f"converted leaf {path}/{k} not in model")
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: model {dst[k].shape} vs "
                        f"checkpoint {v.shape}"
                    )
                out[k] = jnp.asarray(v, dst[k].dtype)
        return out

    out = dict(variables)
    for coll in ("params", "frozen"):
        if converted.get(coll):
            out[coll] = merge(variables[coll], converted[coll], coll)
    return out
