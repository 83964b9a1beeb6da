"""Semantic segmentation FPN head + panoptic fusion.

Parity targets: /root/reference/lib/modeling/meta_arch/semantic_seg.py:
115-221 (SemSegFPNHead) and panoptic_fpn.py:160-296 (fusion). The reference's
fusion is a Python-ish loop of tf ops over 100 instances; here it is a
``lax.fori_loop`` over fixed-capacity instance slots updating a pixel-id map
— one compiled program, no host sync.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..structures import Instances, paste_masks_in_image
from ..utils import Registry
from .layers import Conv2D
from .necks.fpn import upsample_nearest_2x

SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")


def upsample_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(
        x, (b, h * factor, w * factor, c), method="bilinear"
    )


@SEM_SEG_HEADS_REGISTRY.register()
class SemSegFPNHead(nn.Module):
    """Per-level conv(+GN+relu)+2x-up chains to a common stride, summed,
    1x1 predictor, upsampled to input resolution."""

    in_features: Sequence[str]
    strides: Sequence[int]
    num_classes: int
    convs_dim: int = 128
    common_stride: int = 4
    norm: str = "GN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        total = None
        for f, stride in zip(self.in_features, self.strides):
            x = features[f]
            n_ups = max(1, int(math.log2(stride) - math.log2(self.common_stride)))
            head_length = n_ups if stride > self.common_stride else 1
            for i in range(head_length):
                x = Conv2D(
                    self.convs_dim, 3, norm=self.norm, activation="relu",
                    dtype=self.dtype, name=f"{f}_{i}",
                )(x, train=train)
                if stride > self.common_stride:
                    x = upsample_bilinear(x, 2)
                    stride //= 2
            total = x if total is None else total + x
        logits = Conv2D(
            self.num_classes, 1, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001), name="predictor",
        )(total, train=train)
        return upsample_bilinear(logits, self.common_stride)


def build_sem_seg_head(cfg, feature_shapes: Dict, dtype=jnp.float32):
    h = cfg.MODEL.SEM_SEG_HEAD
    cls = SEM_SEG_HEADS_REGISTRY.get(h.NAME)
    return cls(
        in_features=tuple(h.IN_FEATURES),
        strides=tuple(feature_shapes[f].stride for f in h.IN_FEATURES),
        num_classes=h.NUM_CLASSES,
        convs_dim=h.CONVS_DIM,
        common_stride=h.COMMON_STRIDE,
        norm=h.NORM,
        dtype=dtype,
        name="sem_seg_head",
    )


def sem_seg_loss(logits: jnp.ndarray, gt: jnp.ndarray, ignore_value: int,
                 loss_weight: float = 1.0) -> jnp.ndarray:
    """Masked CE at input resolution; gt [B, H, W] int with ignore_value."""
    valid = gt != ignore_value
    labels = jnp.clip(gt, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return loss_weight * jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def combine_semantic_and_instance_outputs(
    detections: Instances,
    sem_seg: jnp.ndarray,  # [H, W] int stuff-class map (single image)
    overlap_threshold: float = 0.5,
    stuff_area_limit: int = 4096,
    instances_confidence_threshold: float = 0.5,
    num_stuff_classes: int = 54,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Panoptic fusion for ONE image (vmap over the batch).

    Returns (panoptic_map [H, W] int32 segment ids, segment info arrays of
    fixed capacity D + num_stuff: category_id, is_thing, score, valid).
    Segment id 0 = void.
    """
    h, w = sem_seg.shape
    d = detections.boxes.shape[0]
    masks = detections.pred_masks  # [D, M, M] probabilities
    pasted = paste_masks_in_image(
        masks, detections.boxes, (h, w), threshold=0.5
    )  # [D, H, W] bool
    order_scores = jnp.where(detections.is_valid, detections.scores, -1.0)
    order = jnp.argsort(-order_scores)  # high score first

    def add_instance(i, state):
        pixel_map, next_id, seg_cat, seg_thing, seg_score, seg_valid = state
        det = order[i]
        mask = pasted[det]
        score = order_scores[det]
        mask_area = jnp.sum(mask)
        free = mask & (pixel_map == 0)
        free_area = jnp.sum(free)
        ok = (
            (score >= instances_confidence_threshold)
            & (mask_area > 0)
            & (free_area.astype(jnp.float32) / jnp.maximum(mask_area, 1) > 1 - overlap_threshold)
        )
        sid = next_id
        pixel_map = jnp.where(ok & free, sid, pixel_map)
        seg_cat = seg_cat.at[sid].set(
            jnp.where(ok, detections.pred_classes[det], seg_cat[sid])
        )
        seg_thing = seg_thing.at[sid].set(jnp.where(ok, True, seg_thing[sid]))
        seg_score = seg_score.at[sid].set(jnp.where(ok, score, seg_score[sid]))
        seg_valid = seg_valid.at[sid].set(jnp.where(ok, True, seg_valid[sid]))
        next_id = jnp.where(ok, next_id + 1, next_id)
        return pixel_map, next_id, seg_cat, seg_thing, seg_score, seg_valid

    cap = d + num_stuff_classes + 1
    state = (
        jnp.zeros((h, w), jnp.int32),
        jnp.int32(1),
        jnp.full((cap,), -1, jnp.int32),
        jnp.zeros((cap,), bool),
        jnp.zeros((cap,), jnp.float32),
        jnp.zeros((cap,), bool),
    )
    state = jax.lax.fori_loop(0, d, add_instance, state)
    pixel_map, next_id, seg_cat, seg_thing, seg_score, seg_valid = state

    def add_stuff(c, state):
        pixel_map, next_id, seg_cat, seg_thing, seg_score, seg_valid = state
        region = (sem_seg == c) & (pixel_map == 0)
        ok = jnp.sum(region) >= stuff_area_limit
        sid = next_id
        pixel_map = jnp.where(ok & region, sid, pixel_map)
        seg_cat = seg_cat.at[sid].set(jnp.where(ok, c, seg_cat[sid]))
        seg_thing = seg_thing.at[sid].set(jnp.where(ok, False, seg_thing[sid]))
        seg_valid = seg_valid.at[sid].set(jnp.where(ok, True, seg_valid[sid]))
        next_id = jnp.where(ok, next_id + 1, next_id)
        return pixel_map, next_id, seg_cat, seg_thing, seg_score, seg_valid

    # Stuff label 0 is the merged "thing" class in panoptic-FPN semseg GT —
    # skipped (reference panoptic_fpn.py fusion skips semantic label 0).
    state = jax.lax.fori_loop(
        1, num_stuff_classes, add_stuff,
        (pixel_map, next_id, seg_cat, seg_thing, seg_score, seg_valid),
    )
    pixel_map, _, seg_cat, seg_thing, seg_score, seg_valid = state
    info = {
        "category_id": seg_cat,
        "is_thing": seg_thing,
        "score": seg_score,
        "valid": seg_valid,
    }
    return pixel_map, info
