"""Box delta encode/decode (the (dx, dy, dw, dh) parameterization).

Functional equivalent of the reference Box2BoxTransform
(/root/reference/lib/modeling/box_regression.py:16-123) in xyxy order (our
box convention matches upstream D2, so converted weights decode without the
reference's yxyx permutation). Log-space sizes are clamped at
log(1000/16) exactly as D2 does.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

SCALE_CLAMP = math.log(1000.0 / 16.0)


class Box2BoxTransform:
    """Weights are (wx, wy, ww, wh); D2 defaults (10, 10, 5, 5) for ROI heads."""

    def __init__(self, weights: Sequence[float], scale_clamp: float = SCALE_CLAMP):
        self.weights = tuple(float(w) for w in weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        """Encode targets relative to sources: ``[..., 4] -> [..., 4]``."""
        src_w = src_boxes[..., 2] - src_boxes[..., 0]
        src_h = src_boxes[..., 3] - src_boxes[..., 1]
        src_cx = src_boxes[..., 0] + 0.5 * src_w
        src_cy = src_boxes[..., 1] + 0.5 * src_h

        tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
        tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
        tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
        tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

        wx, wy, ww, wh = self.weights
        eps = 1e-6
        src_w = jnp.maximum(src_w, eps)
        src_h = jnp.maximum(src_h, eps)
        dx = wx * (tgt_cx - src_cx) / src_w
        dy = wy * (tgt_cy - src_cy) / src_h
        dw = ww * jnp.log(jnp.maximum(tgt_w, eps) / src_w)
        dh = wh * jnp.log(jnp.maximum(tgt_h, eps) / src_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Decode: deltas ``[..., k*4]`` applied to boxes ``[..., 4]`` ->
        ``[..., k*4]`` (k classes share the source box)."""
        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        cx = boxes[..., 0] + 0.5 * widths
        cy = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        shape = deltas.shape
        d = deltas.reshape(shape[:-1] + (-1, 4))
        dx = d[..., 0] / wx
        dy = d[..., 1] / wy
        dw = jnp.minimum(d[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(d[..., 3] / wh, self.scale_clamp)

        pred_cx = dx * widths[..., None] + cx[..., None]
        pred_cy = dy * heights[..., None] + cy[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]

        out = jnp.stack(
            [
                pred_cx - 0.5 * pred_w,
                pred_cy - 0.5 * pred_h,
                pred_cx + 0.5 * pred_w,
                pred_cy + 0.5 * pred_h,
            ],
            axis=-1,
        )
        return out.reshape(shape)
