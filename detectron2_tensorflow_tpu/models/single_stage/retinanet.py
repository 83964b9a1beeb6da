"""RetinaNet head: shared conv towers + focal-loss training + dense inference.

Capability parity with the reference head (/root/reference/lib/modeling/
single_stage_heads/retinanet.py:94-451): 4-conv cls/box towers with
prior-prob bias on the classifier, anchor matching with
Matcher([0.4, 0.5], [0, -1, 1], low-quality recovery), sigmoid focal +
smooth-L1 losses normalized by an EMA foreground counter, and per-level
topk -> score filter -> class-aware NMS inference.

TPU-native re-derivation: per-image processing is ``vmap``, not tf.map_fn;
candidate selection is fixed-k ``lax.top_k`` with validity masks instead of
boolean_mask; anchors are trace-time constants.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import class_aware_nms
from ...ops.topk import spatial_top_k
from ...structures import Instances, boxes as box_ops
from ...utils import Registry
from ..anchors import build_anchor_generator
from ..box_regression import Box2BoxTransform
from ..layers import Conv2D
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from ..matcher import Matcher

SINGLE_STAGE_HEAD_REGISTRY = Registry("SINGLE_STAGE_HEAD")


@SINGLE_STAGE_HEAD_REGISTRY.register()
class RetinaNetHead(nn.Module):
    num_classes: int = 80
    in_features: Sequence[str] = ("p3", "p4", "p5", "p6", "p7")
    num_convs: int = 4
    conv_channels: int = 256
    num_anchors: int = 9
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        """Returns (logits, deltas): per level [B, H, W, A*K] / [B, H, W, A*4]."""
        logits, deltas = [], []
        cls_towers = [
            Conv2D(
                self.conv_channels, 3, activation="relu", dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.01),
                name=f"cls_subnet_{i}",
            )
            for i in range(self.num_convs)
        ]
        box_towers = [
            Conv2D(
                self.conv_channels, 3, activation="relu", dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.01),
                name=f"bbox_subnet_{i}",
            )
            for i in range(self.num_convs)
        ]
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_score = Conv2D(
            self.num_anchors * self.num_classes, 3, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_value),
            name="cls_score",
        )
        bbox_pred = Conv2D(
            self.num_anchors * 4, 3, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="bbox_pred",
        )
        for f in self.in_features:
            x = features[f]
            c = x
            for conv in cls_towers:
                c = conv(c, train=train)
            logits.append(cls_score(c, train=train))
            b = x
            for conv in box_towers:
                b = conv(b, train=train)
            deltas.append(bbox_pred(b, train=train))
        return logits, deltas


class RetinaNet:
    """Pure-function driver around the head: GT assignment, losses, inference.

    Holds only static config; all tensor work happens in jit-traceable
    methods. The EMA loss normalizer travels explicitly through the train
    state (``loss_normalizer`` in, updated value out) instead of hiding in a
    framework variable — functional JAX style.
    """

    def __init__(self, cfg, feature_shapes: Dict):
        h = cfg.MODEL.SINGLE_STAGE_HEAD
        self.in_features = list(h.IN_FEATURES)
        self.num_classes = h.NUM_CLASSES
        shapes = [feature_shapes[f] for f in self.in_features]
        self.anchor_generator = build_anchor_generator(cfg, shapes)
        self.strides = [s.stride for s in shapes]
        self.box2box = Box2BoxTransform(cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS)
        self.matcher = Matcher(
            h.IOU_THRESHOLDS, h.IOU_LABELS, allow_low_quality_matches=True
        )
        r = cfg.MODEL.RETINANET
        self.focal_alpha = r.FOCAL_LOSS_ALPHA
        self.focal_gamma = r.FOCAL_LOSS_GAMMA
        self.smooth_l1_beta = r.SMOOTH_L1_LOSS_BETA
        self.score_thresh = r.SCORE_THRESH_TEST
        self.topk_candidates = r.TOPK_CANDIDATES_TEST
        self.nms_thresh = r.NMS_THRESH_TEST
        self.nms_class_agnostic = r.NMS_CLS_AGNOSTIC
        self.detections_per_image = cfg.TEST.DETECTIONS_PER_IMAGE
        self.loss_normalizer_momentum = 0.9

    def head_module(self, cfg, dtype) -> RetinaNetHead:
        a = self.anchor_generator.num_anchors_per_location
        assert len(set(a)) == 1, "RetinaNet needs equal anchors per level"
        return RetinaNetHead(
            num_classes=self.num_classes,
            in_features=tuple(self.in_features),
            num_convs=cfg.MODEL.RETINANET.NUM_CONVS,
            conv_channels=256,
            num_anchors=a[0],
            prior_prob=cfg.MODEL.RETINANET.PRIOR_PROB,
            dtype=dtype,
            name="head",
        )

    # -- shared --------------------------------------------------------------
    def _flatten_outputs(self, logits: List, deltas: List):
        """Per-level NHWC maps -> [B, R_total, K] / [B, R_total, 4], anchor-major
        ordering (y, x, anchor) per level then levels concatenated."""
        b = logits[0].shape[0]
        flat_logits = [l.reshape(b, -1, self.num_classes) for l in logits]
        flat_deltas = [d.reshape(b, -1, 4) for d in deltas]
        return jnp.concatenate(flat_logits, 1), jnp.concatenate(flat_deltas, 1)

    def _anchors(self, feature_shapes) -> jnp.ndarray:
        grid_sizes = [(f[1], f[2]) for f in feature_shapes]
        return jnp.concatenate(self.anchor_generator(grid_sizes), axis=0)

    # -- training -------------------------------------------------------------
    def losses(self, logits: List, deltas: List, gt: Dict, loss_normalizer):
        """gt: gt_boxes [B,G,4], gt_classes [B,G], gt_valid [B,G].

        Returns (loss dict, new_loss_normalizer).
        """
        anchors = self._anchors([l.shape for l in logits])  # [R, 4]
        pred_logits, pred_deltas = self._flatten_outputs(logits, deltas)

        def assign_one(gt_boxes, gt_classes, gt_valid):
            # Dense assignment — see the measured-dead-end note on the
            # chunked alternative in models/rpn.py losses.
            quality = box_ops.pairwise_iou(gt_boxes, anchors)  # [G, R]
            matched_idx, labels = self.matcher(quality, gt_valid)
            matched_boxes = jnp.take(gt_boxes, matched_idx, axis=0)
            matched_classes = jnp.take(gt_classes, matched_idx, axis=0)
            return matched_boxes, matched_classes, labels

        matched_boxes, matched_classes, labels = jax.vmap(assign_one)(
            gt["gt_boxes"], gt["gt_classes"], gt["gt_valid"]
        )
        pos = labels == 1
        valid = labels != -1

        # Classification: one-hot foreground targets over all valid anchors.
        target = jax.nn.one_hot(
            jnp.where(pos, matched_classes, self.num_classes),
            self.num_classes,
            dtype=pred_logits.dtype,
        )
        cls_loss = sigmoid_focal_loss(
            pred_logits, target, self.focal_alpha, self.focal_gamma
        ).sum(-1)
        cls_loss = jnp.sum(cls_loss * valid)

        # Regression on positives only.
        gt_deltas = self.box2box.get_deltas(anchors[None], matched_boxes)
        reg_loss = smooth_l1_loss(pred_deltas, gt_deltas, self.smooth_l1_beta).sum(-1)
        reg_loss = jnp.sum(reg_loss * pos)

        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        m = self.loss_normalizer_momentum
        new_norm = m * loss_normalizer + (1.0 - m) * num_pos
        return (
            {"loss_cls": cls_loss / new_norm, "loss_box_reg": reg_loss / new_norm},
            new_norm,
        )

    # -- inference ------------------------------------------------------------
    def inference(self, logits: List, deltas: List, image_sizes) -> Instances:
        """Fixed-shape dense inference -> batched Instances (leading dim B)."""
        level_anchors = self.anchor_generator(
            [(l.shape[1], l.shape[2]) for l in logits]
        )

        def per_image(per_level_logits, per_level_deltas, image_size):
            cand_boxes, cand_scores, cand_classes, cand_valid = [], [], [], []
            for logit, delta, anchors in zip(
                per_level_logits, per_level_deltas, level_anchors
            ):
                # Exact two-stage top-k: a (pos, class) pair in the global
                # top-k implies its position ranks in the top-k by
                # max-over-classes (else k positions would each contribute a
                # higher pair). Preselecting k positions then re-top-k'ing
                # their k*K class scores is therefore equivalent to one
                # top-k over HWA*K — but ~K times cheaper (12M -> 150k
                # element scans at p3).
                per_pos = logit.reshape(-1, self.num_classes)  # [HWA, K]
                k = min(self.topk_candidates, per_pos.shape[0] * self.num_classes)
                kpos = min(k, per_pos.shape[0])
                pos_max = jnp.max(per_pos, axis=1)
                # The position scan itself uses the 2x2-window preselect
                # (ops/topk.py) — also exact, ~2.5x cheaper at p3 scale.
                hh, ww = logit.shape[0], logit.shape[1]
                na = per_pos.shape[0] // (hh * ww)
                _, pos_idx = spatial_top_k(pos_max.reshape(hh, ww, na), kpos)
                sel = jax.nn.sigmoid(jnp.take(per_pos, pos_idx, axis=0))
                top_scores, flat_idx = jax.lax.top_k(sel.reshape(-1), k)
                anchor_idx = jnp.take(pos_idx, flat_idx // self.num_classes)
                cls = flat_idx % self.num_classes
                sel_deltas = jnp.take(delta.reshape(-1, 4), anchor_idx, axis=0)
                sel_anchors = jnp.take(anchors, anchor_idx, axis=0)
                boxes = self.box2box.apply_deltas(sel_deltas, sel_anchors)
                boxes = box_ops.clip(boxes, image_size)
                cand_boxes.append(boxes)
                cand_scores.append(top_scores)
                cand_classes.append(cls)
                cand_valid.append(top_scores > self.score_thresh)
            boxes = jnp.concatenate(cand_boxes, 0)
            scores = jnp.concatenate(cand_scores, 0)
            classes = jnp.concatenate(cand_classes, 0)
            valid = jnp.concatenate(cand_valid, 0)
            out_boxes, out_scores, out_idx, out_valid = class_aware_nms(
                boxes,
                scores,
                classes,
                self.nms_thresh,
                self.detections_per_image,
                valid=valid,
                class_agnostic=self.nms_class_agnostic,
            )
            out_classes = jnp.take(classes, out_idx)
            return Instances(
                boxes=out_boxes,
                scores=jnp.where(out_valid, out_scores, 0.0),
                pred_classes=jnp.where(out_valid, out_classes, -1),
                is_valid=out_valid,
            )

        b = logits[0].shape[0]
        per_level_logits = [l for l in logits]
        per_level_deltas = [d for d in deltas]
        return jax.vmap(per_image, in_axes=(0, 0, 0))(
            per_level_logits, per_level_deltas, image_sizes
        )
