"""Detection losses, mirroring the reference inventory (lib/layers/loss.py:9-196).

All functions are elementwise/unreduced unless noted; callers apply validity
masks and normalizers (the fixed-shape discipline: reductions always run over
padded tensors with explicit masks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Huber-style loss; ``beta=0`` degenerates to pure L1 (reference default)."""
    diff = jnp.abs(pred - target)
    if beta <= 0.0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Focal loss on sigmoid logits (Lin et al. 2017). ``targets`` in {0,1}."""
    p = jax.nn.sigmoid(logits)
    ce = _sigmoid_ce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def _sigmoid_ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid cross-entropy."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


sigmoid_cross_entropy = _sigmoid_ce


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """CE with integer labels over the last axis; labels clipped into range
    (invalid rows are masked by callers)."""
    labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-instance dice loss over [N, ...] sigmoid probabilities."""
    n = pred.shape[0]
    p = pred.reshape(n, -1)
    t = target.reshape(n, -1)
    inter = jnp.sum(p * t, axis=1)
    denom = jnp.sum(p * p, axis=1) + jnp.sum(t * t, axis=1)
    return 1.0 - (2.0 * inter + eps) / (denom + eps)


def iou_loss(
    pred_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    mode: str = "giou",
) -> jnp.ndarray:
    """IoU-family regression losses over aligned xyxy boxes.

    Modes: iou (=-log iou), linear_iou (1-iou), giou, diou, ciou — the set
    the reference exposes (loss.py + box_list_ops matched variants).
    """
    if mode == "iou":
        iou = box_ops.matched_iou(pred_boxes, target_boxes)
        return -jnp.log(jnp.clip(iou, 1e-6, 1.0))
    if mode == "linear_iou":
        return 1.0 - box_ops.matched_iou(pred_boxes, target_boxes)
    if mode == "giou":
        return 1.0 - box_ops.matched_giou(pred_boxes, target_boxes)
    if mode == "diou":
        return 1.0 - box_ops.matched_diou(pred_boxes, target_boxes)
    if mode == "ciou":
        return 1.0 - box_ops.matched_ciou(pred_boxes, target_boxes)
    raise ValueError(f"unknown iou loss mode '{mode}'")
