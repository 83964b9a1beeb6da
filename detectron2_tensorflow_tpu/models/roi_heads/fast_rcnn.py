"""Fast R-CNN output layers, losses, and fixed-shape inference.

Parity target: /root/reference/lib/modeling/roi_heads/fast_rcnn.py:28-435.
Differences by design: per-image tf.map_fn NMS becomes vmap over fixed-
capacity candidates (a static top-k cap replaces the dynamic score filter —
the score threshold survives as a validity mask).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import class_aware_nms
from ...ops.topk import flat_top_k
from ...structures import Instances, boxes as box_ops
from ..box_regression import Box2BoxTransform
from ..losses import smooth_l1_loss, softmax_cross_entropy


class FastRCNNOutputLayers(nn.Module):
    """Two linear heads: (K+1)-way classification + 4K (or 4) box deltas."""

    num_classes: int
    cls_agnostic_bbox_reg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        scores = nn.Dense(
            self.num_classes + 1, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="cls_score",
        )(x)
        num_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * 4, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001), name="bbox_pred",
        )(x)
        return scores, deltas


def fast_rcnn_losses(
    class_logits: jnp.ndarray,  # [N, K+1]
    deltas: jnp.ndarray,  # [N, K*4 or 4]
    gt_classes: jnp.ndarray,  # [N] in [0, K]; K = background
    gt_proposal_deltas: jnp.ndarray,  # [N, 4]
    valid: jnp.ndarray,  # [N]
    smooth_l1_beta: float,
    num_classes: int,
    cls_agnostic: bool,
) -> Dict[str, jnp.ndarray]:
    """Softmax CE + class-specific smooth-L1, normalized by total sampled
    count (fast_rcnn.py:269-345 semantics)."""
    n = class_logits.shape[0]
    ce = softmax_cross_entropy(class_logits, gt_classes)
    loss_cls = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    fg = valid & (gt_classes < num_classes)
    if cls_agnostic:
        fg_deltas = deltas
    else:
        d = deltas.reshape(n, num_classes, 4)
        cls_idx = jnp.clip(gt_classes, 0, num_classes - 1)
        fg_deltas = jnp.take_along_axis(d, cls_idx[:, None, None], axis=1)[:, 0]
    reg = smooth_l1_loss(fg_deltas, gt_proposal_deltas, smooth_l1_beta).sum(-1)
    # D2 normalizes box loss by the total sampled count, not the fg count.
    loss_reg = jnp.sum(reg * fg) / jnp.maximum(jnp.sum(valid), 1.0)
    return {"loss_cls": loss_cls, "loss_box_reg": loss_reg}


def fast_rcnn_inference(
    class_logits: jnp.ndarray,  # [B, P, K+1]
    deltas: jnp.ndarray,  # [B, P, K*4 or 4]
    proposal_boxes: jnp.ndarray,  # [B, P, 4]
    proposal_valid: jnp.ndarray,  # [B, P]
    image_sizes: jnp.ndarray,  # [B, 2]
    box2box: Box2BoxTransform,
    score_thresh: float,
    nms_thresh: float,
    detections_per_image: int,
    num_classes: int,
    cls_agnostic: bool,
    nms_class_agnostic: bool = False,
    pre_nms_topk: int = 2000,
) -> Instances:
    """Decode -> score filter -> class-aware NMS -> fixed top-k detections."""

    def per_image(logits, d, boxes, valid, image_size):
        p = logits.shape[0]
        scores = jax.nn.softmax(logits, axis=-1)[:, :num_classes]  # [P, K]
        if cls_agnostic:
            decoded = box2box.apply_deltas(d, boxes)  # [P, 4]
            decoded = jnp.broadcast_to(decoded[:, None, :], (p, num_classes, 4))
        else:
            decoded = box2box.apply_deltas(
                d, boxes
            ).reshape(p, num_classes, 4)
        decoded = box_ops.clip(decoded, image_size)

        flat_scores = jnp.where(
            valid[:, None], scores, 0.0
        ).reshape(-1)  # [P*K]
        k = min(pre_nms_topk, flat_scores.shape[0])
        top_scores, top_idx = flat_top_k(flat_scores, k)
        cls = top_idx % num_classes
        box_idx = top_idx // num_classes
        cand_boxes = decoded.reshape(-1, 4)[top_idx]
        cand_valid = top_scores > score_thresh
        out_boxes, out_scores, out_i, out_valid = class_aware_nms(
            cand_boxes, top_scores, cls, nms_thresh,
            detections_per_image, valid=cand_valid,
            class_agnostic=nms_class_agnostic,
            presorted=True,  # flat-top_k output is descending
        )
        return Instances(
            boxes=out_boxes,
            scores=jnp.where(out_valid, out_scores, 0.0),
            pred_classes=jnp.where(out_valid, jnp.take(cls, out_i), -1),
            is_valid=out_valid,
        )

    return jax.vmap(per_image)(
        class_logits, deltas, proposal_boxes, proposal_valid, image_sizes
    )
