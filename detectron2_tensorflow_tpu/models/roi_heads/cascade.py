"""Cascade R-CNN ROI heads driver (3-stage IoU refinement).

Parity target: /root/reference/lib/modeling/roi_heads/cascade_rcnn.py:14-273.
Per stage k: its own box head/predictor, Box2BoxTransform weights and
matcher IoU; stage k consumes the decoded boxes of stage k-1 (no
re-sampling after stage 0 — D2 semantics). Shared-feature gradients are
scaled by 1/num_stages. Inference averages class scores across stages and
keeps the final stage's boxes.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ...structures import Instances, boxes as box_ops
from ..box_regression import Box2BoxTransform
from ..matcher import Matcher
from .fast_rcnn import fast_rcnn_inference, fast_rcnn_losses
from .roi_heads import SampledProposals, StandardROIHeads


def scale_gradient(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Identity forward, gradient scaled by ``scale``."""
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


class CascadeROIHeads(StandardROIHeads):
    def __init__(self, cfg, feature_shapes: Dict):
        super().__init__(cfg, feature_shapes)
        ch = cfg.MODEL.ROI_BOX_CASCADE_HEAD
        self.num_stages = len(ch.IOUS)
        self.stage_transforms = [Box2BoxTransform(w) for w in ch.BBOX_REG_WEIGHTS]
        # Stage 0 reuses the base matcher; later stages match at higher IoU
        # without low-quality recovery.
        self.stage_matchers = [self.matcher] + [
            Matcher([iou], [0, 1]) for iou in ch.IOUS[1:]
        ]
        assert cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG, (
            "Cascade R-CNN requires class-agnostic box regression"
        )

    # -- training ---------------------------------------------------------------
    def _rematch(self, stage: int, boxes, gt) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Match current [B, S, 4] boxes to GT at this stage's IoU. Returns
        (gt_classes [B, S] with bg=K, matched gt boxes [B, S, 4], matched idx)."""
        matcher = self.stage_matchers[stage]

        def one(b, gt_boxes, gt_classes, gt_valid, is_crowd):
            noncrowd = gt_valid & ~is_crowd
            quality = box_ops.pairwise_iou(gt_boxes, b)
            midx, labels = matcher(quality, noncrowd)
            cls = jnp.where(
                labels == 1, jnp.take(gt_classes, midx), self.num_classes
            )
            return cls, jnp.take(gt_boxes, midx, axis=0), midx

        gt_is_crowd = gt.get("gt_is_crowd")
        if gt_is_crowd is None:
            gt_is_crowd = jnp.zeros(gt["gt_boxes"].shape[:2], bool)
        return jax.vmap(one)(
            boxes, gt["gt_boxes"], gt["gt_classes"], gt["gt_valid"], gt_is_crowd
        )

    def stage_losses(
        self,
        stage: int,
        class_logits: jnp.ndarray,  # [B*S, K+1]
        deltas: jnp.ndarray,  # [B*S, 4]
        boxes: jnp.ndarray,  # [B, S, 4]
        gt_classes: jnp.ndarray,  # [B, S]
        gt_boxes: jnp.ndarray,  # [B, S, 4]
        valid: jnp.ndarray,  # [B, S]
    ) -> Dict[str, jnp.ndarray]:
        gt_deltas = self.stage_transforms[stage].get_deltas(boxes, gt_boxes)
        losses = fast_rcnn_losses(
            class_logits,
            deltas,
            gt_classes.reshape(-1),
            gt_deltas.reshape(-1, 4),
            valid.reshape(-1),
            self.smooth_l1_beta,
            self.num_classes,
            cls_agnostic=True,
        )
        return {f"{k}_stage{stage}": v for k, v in losses.items()}

    def refine_boxes(
        self, stage: int, deltas: jnp.ndarray, boxes: jnp.ndarray, image_sizes
    ) -> jnp.ndarray:
        """Decode stage outputs into the next stage's input boxes [B, S, 4]."""
        b, s = boxes.shape[:2]
        decoded = self.stage_transforms[stage].apply_deltas(
            deltas.reshape(b, s, 4), boxes
        )
        decoded = jax.vmap(box_ops.clip)(decoded, image_sizes)
        return jax.lax.stop_gradient(decoded)

    # -- inference ---------------------------------------------------------------
    def cascade_inference(
        self,
        stage_scores: List[jnp.ndarray],  # per stage [B*P, K+1]
        final_deltas: jnp.ndarray,  # [B*P, 4] (last stage)
        final_boxes: jnp.ndarray,  # [B, P, 4] input boxes of the last stage
        proposal_valid: jnp.ndarray,
        image_sizes: jnp.ndarray,
    ) -> Instances:
        mean_scores = sum(jax.nn.softmax(s, axis=-1) for s in stage_scores) / len(
            stage_scores
        )
        # fast_rcnn_inference applies softmax internally; feed log-probs.
        log_scores = jnp.log(jnp.maximum(mean_scores, 1e-12))
        b, p = final_boxes.shape[:2]
        return fast_rcnn_inference(
            log_scores.reshape(b, p, -1),
            final_deltas.reshape(b, p, -1),
            final_boxes,
            proposal_valid,
            image_sizes,
            self.stage_transforms[-1],
            self.score_thresh,
            self.nms_thresh,
            self.detections_per_image,
            self.num_classes,
            cls_agnostic=True,
            nms_class_agnostic=self.nms_class_agnostic,
        )
