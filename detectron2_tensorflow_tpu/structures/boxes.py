"""Box operations on dense ``[..., 4]`` XYXY arrays.

Design notes (vs. the reference's BoxList, /root/reference/lib/structures/
box_list_ops.py:31-904):

  * Boxes are plain jnp arrays in ``(x0, y0, x1, y1)`` absolute-pixel order —
    the upstream-Detectron2 convention — rather than the reference's
    ``(ymin, xmin, ymax, xmax)``. Weight conversion from D2 pickles is then
    layout-identity (no delta permutation needed).
  * No BoxList/SparseBoxList class pair: JAX has no ragged tensors, and the
    reference itself always round-trips through dense padded tensors with an
    ``is_valid`` mask. We keep only the dense-padded representation; validity
    masks travel alongside in `Instances`.
  * All functions are pure, shape-polymorphic over leading batch dims, and
    differentiable where meaningful (the IoU family backs the IoU losses).

The GIoU math here fixes a latent reference bug (box_list_ops.py:344 uses
convex_heights * intersect_widths for the enclosing area).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Areas of ``[..., 4]`` xyxy boxes -> ``[...]``."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas of all pairs: ``[N,4] x [M,4] -> [N,M]``."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU of all pairs: ``[N,4] x [M,4] -> [N,M]``. Empty pairs give 0."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[..., :, None]
    a2 = area(boxes2)[..., None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, EPS), 0.0)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection-over-area-of-boxes2 for all pairs -> ``[N,M]``.

    Used for crowd-region ignoring (a box mostly inside a crowd region is
    ignored regardless of the crowd's total size).
    """
    inter = pairwise_intersection(boxes1, boxes2)
    a2 = area(boxes2)[..., None, :]
    return jnp.where(a2 > 0, inter / jnp.maximum(a2, EPS), 0.0)


def matched_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of aligned box arrays ``[...,4] x [...,4] -> [...]``."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, EPS), 0.0)


def _enclosing_box(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    return lt, rb


def matched_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Generalized IoU of aligned boxes (Rezatofighi et al., 2019)."""
    iou = matched_iou(boxes1, boxes2)
    lt, rb = _enclosing_box(boxes1, boxes2)
    wh = jnp.maximum(rb - lt, 0.0)
    convex = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    inter_rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    inter_wh = jnp.maximum(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return iou - (convex - union) / jnp.maximum(convex, EPS)


def _center_distance_sq(boxes1, boxes2):
    c1 = (boxes1[..., :2] + boxes1[..., 2:]) * 0.5
    c2 = (boxes2[..., :2] + boxes2[..., 2:]) * 0.5
    d = c1 - c2
    return d[..., 0] ** 2 + d[..., 1] ** 2


def matched_diou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Distance IoU of aligned boxes (Zheng et al., 2020)."""
    iou = matched_iou(boxes1, boxes2)
    lt, rb = _enclosing_box(boxes1, boxes2)
    wh = jnp.maximum(rb - lt, 0.0)
    diag_sq = wh[..., 0] ** 2 + wh[..., 1] ** 2
    return iou - _center_distance_sq(boxes1, boxes2) / jnp.maximum(diag_sq, EPS)


def matched_ciou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU of aligned boxes: DIoU plus an aspect-ratio penalty."""
    iou = matched_iou(boxes1, boxes2)
    diou = matched_diou(boxes1, boxes2)
    w1 = jnp.maximum(boxes1[..., 2] - boxes1[..., 0], EPS)
    h1 = jnp.maximum(boxes1[..., 3] - boxes1[..., 1], EPS)
    w2 = jnp.maximum(boxes2[..., 2] - boxes2[..., 0], EPS)
    h2 = jnp.maximum(boxes2[..., 3] - boxes2[..., 1], EPS)
    v = (4.0 / (jnp.pi**2)) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = v / jnp.maximum(1.0 - iou + v, EPS)
    # The trade-off coefficient alpha is treated as a constant in the CIoU
    # paper's gradient; stop_gradient mirrors that.
    import jax

    alpha = jax.lax.stop_gradient(alpha)
    return diou - alpha * v


def clip(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    """Clip ``[..., 4]`` boxes to ``image_size=(h, w)`` (arrays or ints)."""
    h, w = image_size[0], image_size[1]
    x0 = jnp.clip(boxes[..., 0], 0, w)
    y0 = jnp.clip(boxes[..., 1], 0, h)
    x1 = jnp.clip(boxes[..., 2], 0, w)
    y1 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Mask of boxes with both sides strictly greater than ``threshold``."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def inside_image(boxes: jnp.ndarray, image_size, boundary_thresh: float = 0.0) -> jnp.ndarray:
    """Mask of boxes within the image, tolerating ``boundary_thresh`` pixels."""
    h, w = image_size[0], image_size[1]
    return (
        (boxes[..., 0] >= -boundary_thresh)
        & (boxes[..., 1] >= -boundary_thresh)
        & (boxes[..., 2] <= w + boundary_thresh)
        & (boxes[..., 3] <= h + boundary_thresh)
    )


def scale(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    """Scale box coordinates by per-axis factors."""
    return boxes * jnp.stack(
        [
            jnp.asarray(scale_x, boxes.dtype),
            jnp.asarray(scale_y, boxes.dtype),
            jnp.asarray(scale_x, boxes.dtype),
            jnp.asarray(scale_y, boxes.dtype),
        ]
    )


def to_normalized(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    h, w = image_size[0], image_size[1]
    return boxes / jnp.stack(
        [jnp.asarray(w), jnp.asarray(h), jnp.asarray(w), jnp.asarray(h)]
    ).astype(boxes.dtype)


def to_absolute(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    h, w = image_size[0], image_size[1]
    return boxes * jnp.stack(
        [jnp.asarray(w), jnp.asarray(h), jnp.asarray(w), jnp.asarray(h)]
    ).astype(boxes.dtype)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """COCO (x, y, w, h) -> (x0, y0, x1, y1)."""
    return jnp.concatenate([boxes[..., :2], boxes[..., :2] + boxes[..., 2:]], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    wh = boxes[..., 2:] - boxes[..., :2]
    c = (boxes[..., :2] + boxes[..., 2:]) * 0.5
    return jnp.concatenate([c, wh], axis=-1)
