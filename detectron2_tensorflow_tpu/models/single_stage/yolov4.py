"""YOLOv4 head: towers, anchor-shape matching, CIoU/conf/cls losses, inference.

Parity targets: /root/reference/lib/modeling/single_stage_heads/yolov4.py:
108-170 (tower) and yolov4_outputs.py:59-390 (matching, losses, inference),
plus the YOLOMatcher (matcher.py:176-267). TPU-native rewrite: the per-image
tf.map_fn + SparseTensor scatter becomes vmap + fixed-capacity ``.at[]``
scatters with mode="drop" for padded GT slots.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import nms_fixed
from ...structures import Instances, boxes as box_ops
from ..anchors import YOLOAnchorGenerator
from ..layers import Conv2D
from ..losses import sigmoid_cross_entropy


class YOLOV4Head(nn.Module):
    """Per level: 3x3 conv (2^i * conv_dims) + 1x1 predictor A*(5+K)."""

    num_classes: int
    in_features: Sequence[str]
    num_anchors: int = 3
    conv_dims: int = 256
    norm: str = "BN"
    activation: str = "leaky_relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        out = []
        for i, f in enumerate(self.in_features):
            x = Conv2D(
                (2**i) * self.conv_dims, 3, norm=self.norm,
                activation=self.activation, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.01), name=f"conv{i + 1}",
            )(features[f], train=train)
            x = Conv2D(
                self.num_anchors * (5 + self.num_classes), 1, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.01), name=f"pred{i + 1}",
            )(x, train=train)
            out.append(x)
        return out


class YOLOv4:
    """Pure driver."""

    def __init__(self, cfg, feature_shapes: Dict):
        h = cfg.MODEL.SINGLE_STAGE_HEAD
        y = cfg.MODEL.YOLOV4
        self.num_classes = h.NUM_CLASSES
        self.in_features = list(h.IN_FEATURES)
        shapes = [feature_shapes[f] for f in self.in_features]
        self.strides = [s.stride for s in shapes]
        self.anchor_generator = YOLOAnchorGenerator(
            sizes=cfg.MODEL.ANCHOR_GENERATOR.SIZES, strides=self.strides
        )
        a = self.anchor_generator.num_anchors_per_location
        assert len(set(a)) == 1
        self.num_anchors = a[0]
        self.scale_yx = list(y.SCALE_YX)
        self.cls_normalizer = y.CLS_NORMALIZER
        self.iou_normalizer = y.IOU_NORMALIZER
        self.ignore_thresh = h.IOU_THRESHOLDS[0]
        self.score_thresh = y.SCORE_THRESH_TEST
        self.nms_thresh = y.NMS_THRESH_TEST
        self.detections_per_image = cfg.TEST.DETECTIONS_PER_IMAGE
        self.topk_pre_nms = 1000
        self.cfg = cfg

    def head_module(self, cfg, dtype) -> YOLOV4Head:
        return YOLOV4Head(
            num_classes=self.num_classes,
            in_features=tuple(self.in_features),
            num_anchors=self.num_anchors,
            conv_dims=cfg.MODEL.YOLOV4.CONV_DIMS,
            norm=cfg.MODEL.YOLOV4.NORM,
            activation=cfg.MODEL.YOLOV4.ACTIVATION,
            dtype=dtype,
            name="head",
        )

    # -- decode ----------------------------------------------------------------
    def decode(self, preds: List[jnp.ndarray]):
        """Per-level raw maps -> flat (boxes [B,R,4], conf_logits [B,R],
        cls_logits [B,R,K], confs [B,R], probs [B,R,K])."""
        boxes_all, conf_all, cls_all = [], [], []
        for level, p in enumerate(preds):
            b, hh, ww, _ = p.shape
            stride = self.strides[level]
            p = p.reshape(b, hh, ww, self.num_anchors, 5 + self.num_classes)
            txy = p[..., 0:2]
            twh = p[..., 2:4]
            tconf = p[..., 4]
            tcls = p[..., 5:]
            s = self.scale_yx[level]
            gx = jnp.arange(ww, dtype=jnp.float32)[None, None, :, None]
            gy = jnp.arange(hh, dtype=jnp.float32)[None, :, None, None]
            # center = (cell_index + scaled-sigmoid offset) * stride
            dxy = s * jax.nn.sigmoid(txy) - 0.5 * (s - 1)
            cx = (gx + dxy[..., 0]) * stride
            cy = (gy + dxy[..., 1]) * stride
            # anchor shapes in pixels
            cell = jnp.asarray(self.anchor_generator.cell_anchors[level])
            wh_anchor = cell[:, 2:] - cell[:, :2]  # [A, 2] (w, h)
            pw = jnp.exp(twh[..., 0]) * wh_anchor[None, None, None, :, 0]
            ph = jnp.exp(twh[..., 1]) * wh_anchor[None, None, None, :, 1]
            box = jnp.stack(
                [cx - pw / 2, cy - ph / 2, cx + pw / 2, cy + ph / 2], axis=-1
            )
            boxes_all.append(box.reshape(b, -1, 4))
            conf_all.append(tconf.reshape(b, -1))
            cls_all.append(tcls.reshape(b, -1, self.num_classes))
        return (
            jnp.concatenate(boxes_all, 1),
            jnp.concatenate(conf_all, 1),
            jnp.concatenate(cls_all, 1),
        )

    # -- GT assignment + losses ---------------------------------------------------
    def losses(self, preds: List[jnp.ndarray], gt: Dict) -> Dict[str, jnp.ndarray]:
        preds32 = [p.astype(jnp.float32) for p in preds]
        pred_boxes, conf_logits, cls_logits = self.decode(preds32)
        b, r = conf_logits.shape
        grid_hw = [(p.shape[1], p.shape[2]) for p in preds]
        level_offsets = []
        off = 0
        for (hh, ww) in grid_hw:
            level_offsets.append(off)
            off += hh * ww * self.num_anchors
        image_area = float(
            (grid_hw[0][0] * self.strides[0]) * (grid_hw[0][1] * self.strides[0])
        )

        # Shape-IoU of each GT against the 9 cell anchors (levels x anchors).
        cell_wh = jnp.concatenate(
            [
                jnp.asarray(c[:, 2:] - c[:, :2])
                for c in self.anchor_generator.cell_anchors
            ],
            axis=0,
        )  # [L*A, 2]

        def per_image(gt_boxes, gt_classes, gt_valid, is_crowd, p_boxes):
            usable = gt_valid & ~is_crowd
            w = gt_boxes[:, 2] - gt_boxes[:, 0]
            h = gt_boxes[:, 3] - gt_boxes[:, 1]
            inter = jnp.minimum(w[:, None], cell_wh[None, :, 0]) * jnp.minimum(
                h[:, None], cell_wh[None, :, 1]
            )
            union = w[:, None] * h[:, None] + cell_wh[None, :, 0] * cell_wh[None, :, 1] - inter
            shape_iou = inter / jnp.maximum(union, 1e-6)
            best = jnp.argmax(shape_iou, axis=1)  # [G]
            level = best // self.num_anchors
            anchor = best % self.num_anchors

            cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
            cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
            stride_per_gt = jnp.take(jnp.asarray(self.strides, jnp.float32), level)
            gxs = jnp.floor(cx / stride_per_gt).astype(jnp.int32)
            gys = jnp.floor(cy / stride_per_gt).astype(jnp.int32)
            widths = jnp.take(
                jnp.asarray([wwl for (_, wwl) in grid_hw], jnp.int32), level
            )
            offs = jnp.take(jnp.asarray(level_offsets, jnp.int32), level)
            flat_idx = offs + (gys * widths + gxs) * self.num_anchors + anchor
            flat_idx = jnp.where(usable, flat_idx, r)  # dropped by mode="drop"

            respond = jnp.zeros((r,), jnp.float32).at[flat_idx].set(
                1.0, mode="drop"
            )
            tgt_boxes = jnp.zeros((r, 4), jnp.float32).at[flat_idx].set(
                gt_boxes, mode="drop"
            )
            cls_onehot = jax.nn.one_hot(gt_classes, self.num_classes)
            tgt_cls = jnp.zeros((r, self.num_classes), jnp.float32).at[flat_idx].set(
                cls_onehot, mode="drop"
            )
            # Background = prediction far (CIoU) from every usable/crowd GT.
            ciou = jax.vmap(
                lambda g: box_ops.matched_ciou(
                    jnp.broadcast_to(g, p_boxes.shape), p_boxes
                )
            )(gt_boxes)  # [G, R]
            relevant = gt_valid
            max_iou = jnp.max(
                jnp.where(relevant[:, None], ciou, -1.0), axis=0
            )
            bgd = (max_iou < self.ignore_thresh).astype(jnp.float32) * (1.0 - respond)
            return respond, bgd, tgt_boxes, tgt_cls

        gt_is_crowd = gt.get("gt_is_crowd")
        if gt_is_crowd is None:
            gt_is_crowd = jnp.zeros(gt["gt_boxes"].shape[:2], bool)
        respond, bgd, tgt_boxes, tgt_cls = jax.vmap(per_image)(
            gt["gt_boxes"], gt["gt_classes"], gt["gt_valid"], gt_is_crowd,
            pred_boxes,
        )

        num_images = float(b)
        # Box: CIoU on positives, scaled by (2 - relative area).
        ciou = box_ops.matched_ciou(pred_boxes, tgt_boxes)
        area = (tgt_boxes[..., 2] - tgt_boxes[..., 0]) * (
            tgt_boxes[..., 3] - tgt_boxes[..., 1]
        )
        scale = 2.0 - area / image_area
        box_loss = (
            jnp.sum((1.0 - ciou) * scale * respond)
            * self.iou_normalizer
            / num_images
        )
        # Conf: focal-weighted BCE on positives + background.
        confs = jax.nn.sigmoid(conf_logits)
        conf_focal = (respond - confs) ** 2
        conf_ce = sigmoid_cross_entropy(conf_logits, respond)
        conf_loss = (
            jnp.sum(conf_focal * conf_ce * (respond + bgd)) / num_images
        )
        # Cls: BCE on positives.
        cls_ce = sigmoid_cross_entropy(cls_logits, tgt_cls).sum(-1)
        cls_loss = jnp.sum(cls_ce * respond) * self.cls_normalizer / num_images
        return {
            "box_loss": box_loss,
            "conf_loss": conf_loss,
            "cls_loss": cls_loss,
        }

    # -- inference ------------------------------------------------------------------
    def inference(self, preds: List[jnp.ndarray], image_sizes) -> Instances:
        preds32 = [p.astype(jnp.float32) for p in preds]
        pred_boxes, conf_logits, cls_logits = self.decode(preds32)
        probs = jax.nn.sigmoid(conf_logits)[..., None] * jax.nn.sigmoid(cls_logits)

        def per_image(boxes, p, image_size):
            score = jnp.max(p, axis=-1)
            cls = jnp.argmax(p, axis=-1)
            k = min(self.topk_pre_nms, score.shape[0])
            top_scores, idx = jax.lax.top_k(score, k)
            top_boxes = box_ops.clip(jnp.take(boxes, idx, axis=0), image_size)
            top_cls = jnp.take(cls, idx)
            valid = top_scores > self.score_thresh
            ob, os_, oi, ov = nms_fixed(
                top_boxes, top_scores, self.nms_thresh,
                self.detections_per_image, valid=valid,
                presorted=True,  # top_k output is descending
            )
            return Instances(
                boxes=ob,
                scores=jnp.where(ov, os_, 0.0),
                pred_classes=jnp.where(ov, jnp.take(top_cls, oi), -1),
                is_valid=ov,
            )

        return jax.vmap(per_image)(pred_boxes, probs, image_sizes)
