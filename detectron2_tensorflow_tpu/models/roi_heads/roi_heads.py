"""ROI heads driver: proposal labeling/sampling, pooling, losses, inference.

Parity target: /root/reference/lib/modeling/roi_heads/roi_heads.py:65-605.
The reference's per-image tf.map_fn with dynamic boolean masks becomes vmap
with fixed capacities: every image samples exactly BATCH_SIZE_PER_IMAGE
proposal slots (positives compacted to the front, invalid slots masked), and
the mask branch consumes the first ``mask_slots`` slots (>= the positive cap,
so no positive is ever dropped).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ...structures import Instances, boxes as box_ops
from ...utils import Registry
from ..box_regression import Box2BoxTransform
from ..matcher import Matcher
from ..poolers import ROIPooler
from ..sampling import subsample_labels
from .fast_rcnn import fast_rcnn_inference, fast_rcnn_losses
from ..losses import sigmoid_cross_entropy

ROI_HEADS_REGISTRY = Registry("ROI_HEADS")


@dataclasses.dataclass
class SampledProposals:
    """Fixed-capacity training sample for the ROI heads (all [B, S, ...])."""

    boxes: jnp.ndarray  # [B, S, 4] proposal boxes
    gt_classes: jnp.ndarray  # [B, S] in [0, K]; K = background
    gt_boxes: jnp.ndarray  # [B, S, 4] matched GT boxes (fg slots meaningful)
    matched_idx: jnp.ndarray  # [B, S] index into the image's GT arrays
    is_fg: jnp.ndarray  # [B, S]
    valid: jnp.ndarray  # [B, S]


class StandardROIHeads:
    """FPN-style two-branch ROI heads (separate box and mask branches)."""

    def __init__(self, cfg, feature_shapes: Dict):
        rh = cfg.MODEL.ROI_HEADS
        self.in_features = list(rh.IN_FEATURES)
        shapes = [feature_shapes[f] for f in self.in_features]
        strides = [s.stride for s in shapes]
        self.num_classes = rh.NUM_CLASSES
        self.batch_size_per_image = rh.BATCH_SIZE_PER_IMAGE
        self.positive_fraction = rh.POSITIVE_FRACTION
        self.proposal_append_gt = rh.PROPOSAL_APPEND_GT
        self.matcher = Matcher(rh.IOU_THRESHOLDS, rh.IOU_LABELS)
        self.score_thresh = rh.SCORE_THRESH_TEST
        self.nms_thresh = rh.NMS_THRESH_TEST
        self.nms_class_agnostic = rh.NMS_CLS_AGNOSTIC
        self.detections_per_image = cfg.TEST.DETECTIONS_PER_IMAGE

        bh = cfg.MODEL.ROI_BOX_HEAD
        self.box2box = Box2BoxTransform(bh.BBOX_REG_WEIGHTS)
        self.smooth_l1_beta = bh.SMOOTH_L1_BETA
        self.cls_agnostic_bbox_reg = bh.CLS_AGNOSTIC_BBOX_REG
        max_img = max(cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN,
                      cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST)
        self.box_pooler = ROIPooler(
            bh.POOLER_RESOLUTION, strides, bh.POOLER_SAMPLING_RATIO, bh.POOLER_TYPE,
            max_image_size=max_img,
        )

        self.keypoint_on = cfg.MODEL.KEYPOINT_ON
        if self.keypoint_on:
            kh = cfg.MODEL.ROI_KEYPOINT_HEAD
            self.keypoint_pooler = ROIPooler(
                kh.POOLER_RESOLUTION, strides, kh.POOLER_SAMPLING_RATIO,
                kh.POOLER_TYPE, max_image_size=max_img,
            )
        self.mask_on = cfg.MODEL.MASK_ON
        if self.mask_on or self.keypoint_on:
            mh = cfg.MODEL.ROI_MASK_HEAD
            if self.mask_on:
                self.mask_pooler = ROIPooler(
                    mh.POOLER_RESOLUTION, strides, mh.POOLER_SAMPLING_RATIO,
                    mh.POOLER_TYPE, max_image_size=max_img,
                )
            if self.mask_on:
                self.cls_agnostic_mask = mh.CLS_AGNOSTIC_MASK
            # Positive cap = S * positive_fraction; the mask/keypoint
            # branches see exactly that many slots (positives are compacted
            # to the front).
            self.mask_slots = int(
                self.batch_size_per_image * self.positive_fraction
            )

    # -- training sampling -----------------------------------------------------
    def label_and_sample_proposals(
        self, rng: jax.Array, proposals: Instances, gt: Dict
    ) -> SampledProposals:
        gt_is_crowd = gt.get("gt_is_crowd")
        if gt_is_crowd is None:
            gt_is_crowd = jnp.zeros(gt["gt_boxes"].shape[:2], bool)

        def sample_one(key, boxes, prop_valid, gt_boxes, gt_classes, gt_valid, is_crowd):
            noncrowd = gt_valid & ~is_crowd
            quality = box_ops.pairwise_iou(gt_boxes, boxes)  # [G, P]
            matched_idx, labels = self.matcher(quality, noncrowd)
            labels = jnp.where(prop_valid, labels, jnp.int8(-1))
            # Proposals lying mostly inside crowd regions are ignored.
            crowd_valid = gt_valid & is_crowd
            ioa = box_ops.pairwise_ioa(gt_boxes, boxes)
            in_crowd = jnp.any(
                ioa * crowd_valid[:, None].astype(ioa.dtype) > 0.5, axis=0
            )
            labels = jnp.where(in_crowd, jnp.int8(-1), labels)

            idx, is_pos, valid = subsample_labels(
                key,
                labels.astype(jnp.int32),
                self.batch_size_per_image,
                self.positive_fraction,
            )
            sel_boxes = jnp.take(boxes, idx, axis=0)
            sel_matched = jnp.take(matched_idx, idx)
            sel_gt_boxes = jnp.take(gt_boxes, sel_matched, axis=0)
            sel_classes = jnp.take(gt_classes, sel_matched)
            sel_classes = jnp.where(is_pos, sel_classes, self.num_classes)
            return sel_boxes, sel_classes, sel_gt_boxes, sel_matched, is_pos, valid

        b = proposals.proposal_boxes.shape[0]
        keys = jax.random.split(rng, b)
        out = jax.vmap(sample_one)(
            keys,
            proposals.proposal_boxes,
            proposals.is_valid,
            gt["gt_boxes"],
            gt["gt_classes"],
            gt["gt_valid"],
            gt_is_crowd,
        )
        return SampledProposals(*out)

    # -- pooling ----------------------------------------------------------------
    def pooling_storage(self, features: Dict):
        """Build the (batched) pooling storage plane ONCE per image — the
        box / mask / keypoint poolers share identical layouts, so the row
        concatenation and avgpool extent-tier aliases are computed a single
        time instead of once per pooler. Returns (storage [B, Htot, Wm, C],
        meta); single-level (C4/DC5) builds a one-level plane + extent-tier
        aliases (the exact-XLA roi_align fallback OOMed at serving shapes —
        see ROIPooler.__call__)."""
        feats = [features[f] for f in self.in_features]
        meta_box = [None]

        def one(per_image_feats):
            st, meta = self.box_pooler.build_storage(per_image_feats)
            meta_box[0] = meta
            return st

        storage = jax.vmap(one)([f for f in feats])
        return storage, meta_box[0]

    def _pool(self, pooler, features: Dict, boxes, storage_pack, valid=None):
        feats = [features[f] for f in self.in_features]
        if storage_pack is None:
            if valid is None:
                pooled = jax.vmap(
                    lambda per_image_feats, b: pooler(per_image_feats, b)
                )([f for f in feats], boxes)
            else:
                pooled = jax.vmap(
                    lambda per_image_feats, b, v: pooler(per_image_feats, b, v)
                )([f for f in feats], boxes, valid)
        else:
            storage, meta = storage_pack
            # Batched natively — the Pallas kernels take the batch as a grid
            # dimension; jax.vmap here would fall back to a sequential
            # lax.map (see ops/pallas/roi_patch.py).
            pooled = pooler.pool(storage, meta, boxes, valid)
        return pooled.reshape((-1,) + pooled.shape[2:])

    def pool_multi(self, requests, storage_pack):
        """Pool several ROI sets from the shared storage with ONE fused-
        backward op (see poolers.pool_multi_from_storage — deletes a
        full-plane f32 zeros + add per extra set in the train step).

        ``requests``: (pooler, boxes [B, N, 4], valid [B, N]) triples.
        Returns one [B*N, S, S, C] array per request.
        """
        from ..poolers import pool_multi_from_storage

        storage, meta = storage_pack
        reqs = [
            dict(
                boxes=b, valid=v, output_size=p.output_size,
                sampling_ratio=p.sampling_ratio,
                canonical_box_size=p.canonical_box_size,
                canonical_level=p.canonical_level,
            )
            for (p, b, v) in requests
        ]
        outs = pool_multi_from_storage(storage, meta, reqs)
        return [o.reshape((-1,) + o.shape[2:]) for o in outs]

    def pool_box_features(self, features: Dict, boxes: jnp.ndarray,
                          storage_pack=None, valid=None) -> jnp.ndarray:
        """features: dict of [B, H, W, C]; boxes [B, N, 4] -> [B*N, S, S, C].

        ``valid`` [B, N] (optional): invalid slots skip their patch DMA in
        the Pallas kernels and pool exact zeros — every consumer masks
        them, and the per-ROI DMA issue cost dominates the pooler."""
        return self._pool(self.box_pooler, features, boxes, storage_pack, valid)

    def pool_mask_features(self, features: Dict, boxes: jnp.ndarray,
                           storage_pack=None, valid=None) -> jnp.ndarray:
        return self._pool(self.mask_pooler, features, boxes, storage_pack, valid)

    def pool_keypoint_features(self, features: Dict, boxes: jnp.ndarray,
                               storage_pack=None, valid=None) -> jnp.ndarray:
        return self._pool(
            self.keypoint_pooler, features, boxes, storage_pack, valid
        )

    # -- losses -------------------------------------------------------------------
    def box_losses(
        self, class_logits: jnp.ndarray, deltas: jnp.ndarray, sampled: SampledProposals
    ) -> Dict[str, jnp.ndarray]:
        """class_logits/deltas: [B*S, ...] in sampled-slot order."""
        b, s = sampled.gt_classes.shape
        gt_deltas = self.box2box.get_deltas(sampled.boxes, sampled.gt_boxes)
        return fast_rcnn_losses(
            class_logits,
            deltas,
            sampled.gt_classes.reshape(-1),
            gt_deltas.reshape(-1, 4),
            sampled.valid.reshape(-1),
            self.smooth_l1_beta,
            self.num_classes,
            self.cls_agnostic_bbox_reg,
        )

    def mask_loss(
        self,
        mask_logits: jnp.ndarray,  # [B*M, 2S, 2S, K]
        sampled: SampledProposals,
        gt: Dict,
    ) -> jnp.ndarray:
        """Sigmoid CE at the GT class channel vs GT masks cropped to the
        proposal boxes (mini-mask aware, reference mask_head.py:37-48)."""
        m = self.mask_slots
        b = sampled.gt_classes.shape[0]
        out_size = mask_logits.shape[1]
        fg = (sampled.is_fg & sampled.valid)[:, :m]  # [B, M]

        def crop_one_image(mini_masks, gt_boxes_all, matched, prop_boxes):
            """mini_masks [G, Mm, Mm] in gt-box frame -> [M, out, out] targets."""
            sel_masks = jnp.take(mini_masks, matched, axis=0)  # [M, Mm, Mm]
            sel_gt_boxes = jnp.take(gt_boxes_all, matched, axis=0)  # [M, 4]
            mm = sel_masks.shape[-1]

            def crop_one(mask, gbox, pbox, out=out_size):
                # proposal-box pixel centers mapped into gt-box mini-mask coords
                gx0, gy0, gx1, gy1 = gbox[0], gbox[1], gbox[2], gbox[3]
                px0, py0, px1, py1 = pbox[0], pbox[1], pbox[2], pbox[3]
                ey = jnp.maximum(gy1 - gy0, 1e-4)
                ex = jnp.maximum(gx1 - gx0, 1e-4)
                ys = py0 + (jnp.arange(out, dtype=jnp.float32) + 0.5) / out * (py1 - py0)
                xs = px0 + (jnp.arange(out, dtype=jnp.float32) + 0.5) / out * (px1 - px0)
                uy = (ys - gy0) / ey * mm - 0.5
                ux = (xs - gx0) / ex * mm - 0.5
                cells = jnp.arange(mm, dtype=jnp.float32)
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy[:, None] - cells[None, :]))
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux[:, None] - cells[None, :]))
                hi = jax.lax.Precision.HIGHEST
                return jnp.matmul(
                    jnp.matmul(wy, mask.astype(jnp.float32), precision=hi),
                    wx.T,
                    precision=hi,
                )

            return jax.vmap(crop_one)(sel_masks, sel_gt_boxes, prop_boxes)

        targets = jax.vmap(crop_one_image)(
            gt["gt_masks"],
            gt["gt_boxes"],
            sampled.matched_idx[:, :m],
            sampled.boxes[:, :m],
        )  # [B, M, out, out]
        targets = (targets > 0.5).astype(jnp.float32)

        # Gather the class channel on the FLAT [N, out, out, K] logits and
        # reshape the small selected tensor afterwards: reshaping the full
        # 5-D logits first puts the backward's scatter behind a reshape
        # whose transpose materializes a [B, M, out, out, K] relayout copy
        # (measured 0.17 ms/img at eff 0.23 in the train audit) — the
        # flat-gather form scatters straight into the head's native layout.
        if self.cls_agnostic_mask:
            sel_flat = mask_logits[..., 0]
        else:
            cls_flat = jnp.clip(
                sampled.gt_classes[:, :m], 0, self.num_classes - 1
            ).reshape(-1)
            sel_flat = jnp.take_along_axis(
                mask_logits, cls_flat[:, None, None, None], axis=-1
            )[..., 0]
        sel = sel_flat.reshape(b, m, out_size, out_size)
        # Gather in the head's native dtype, THEN cast: the transpose of
        # this cast+gather is a scatter of the per-ROI grads into a zeros
        # tensor of the full [N, out, out, K] logits — in bf16 instead
        # of f32 it moves half the bytes, and scattering casts equals
        # casting the scatter (placement only).
        ce = sigmoid_cross_entropy(sel.astype(jnp.float32), targets)
        num = jnp.sum(ce * fg[:, :, None, None])
        den = jnp.maximum(jnp.sum(fg) * out_size * out_size, 1.0)
        return num / den

    def keypoint_loss(
        self,
        kp_logits: jnp.ndarray,  # [B*M, S, S, K]
        sampled: SampledProposals,
        gt: Dict,
        normalize_by_visible: bool = True,
        loss_weight: float = 1.0,
    ) -> jnp.ndarray:
        """Softmax CE over heatmap positions at each visible GT keypoint
        (upstream keypoint-RCNN loss; head is config-only in the reference)."""
        m = self.mask_slots
        b = sampled.gt_classes.shape[0]
        s = kp_logits.shape[1]
        k = kp_logits.shape[-1]
        logits = kp_logits.reshape(b, m, s * s, k)
        fg = (sampled.is_fg & sampled.valid)[:, :m]  # [B, M]

        kp = jnp.take_along_axis(
            gt["gt_keypoints"], sampled.matched_idx[:, :m, None, None], axis=1
        )  # [B, M, K, 3]
        boxes = sampled.boxes[:, :m]
        px0, py0 = boxes[..., 0:1], boxes[..., 1:2]
        pw = jnp.maximum(boxes[..., 2:3] - boxes[..., 0:1], 1e-4)
        ph = jnp.maximum(boxes[..., 3:4] - boxes[..., 1:2], 1e-4)
        x_hm = (kp[..., 0] - px0) / pw * s
        y_hm = (kp[..., 1] - py0) / ph * s
        xi = jnp.floor(x_hm).astype(jnp.int32)
        yi = jnp.floor(y_hm).astype(jnp.int32)
        inside = (xi >= 0) & (xi < s) & (yi >= 0) & (yi < s)
        visible = (kp[..., 2] > 0) & inside & fg[..., None]  # [B, M, K]
        target = jnp.clip(yi, 0, s - 1) * s + jnp.clip(xi, 0, s - 1)

        logp = jax.nn.log_softmax(logits, axis=2)  # over positions
        picked = jnp.take_along_axis(
            logp, target[:, :, None, :], axis=2
        )[:, :, 0, :]  # [B, M, K]
        num_vis = jnp.sum(visible)
        denom = (
            jnp.maximum(num_vis, 1.0)
            if normalize_by_visible
            else jnp.maximum(jnp.sum(fg) * k, 1.0)
        )
        return -loss_weight * jnp.sum(picked * visible) / denom

    def keypoint_inference(
        self, kp_logits: jnp.ndarray, detections: Instances
    ) -> Instances:
        """Heatmap argmax -> image-space (x, y, score) per keypoint."""
        b, d = detections.pred_classes.shape
        s = kp_logits.shape[1]
        k = kp_logits.shape[-1]
        logits = kp_logits.reshape(b, d, s * s, k)
        probs = jax.nn.softmax(logits, axis=2)
        idx = jnp.argmax(probs, axis=2)  # [B, D, K]
        score = jnp.max(probs, axis=2)
        yi = (idx // s).astype(jnp.float32) + 0.5
        xi = (idx % s).astype(jnp.float32) + 0.5
        boxes = detections.boxes
        px0, py0 = boxes[..., 0:1], boxes[..., 1:2]
        pw = boxes[..., 2:3] - boxes[..., 0:1]
        ph = boxes[..., 3:4] - boxes[..., 1:2]
        x = px0 + xi / s * pw
        y = py0 + yi / s * ph
        return detections.replace(
            pred_keypoints=jnp.stack([x, y, score], axis=-1)
        )

    # -- inference ------------------------------------------------------------------
    def box_inference(
        self,
        class_logits: jnp.ndarray,  # [B*P, K+1]
        deltas: jnp.ndarray,
        proposals: Instances,
        image_sizes: jnp.ndarray,
    ) -> Instances:
        b, p = proposals.proposal_boxes.shape[:2]
        return fast_rcnn_inference(
            class_logits.reshape(b, p, -1),
            deltas.reshape(b, p, -1),
            proposals.proposal_boxes,
            proposals.is_valid,
            image_sizes,
            self.box2box,
            self.score_thresh,
            self.nms_thresh,
            self.detections_per_image,
            self.num_classes,
            self.cls_agnostic_bbox_reg,
            self.nms_class_agnostic,
        )

    def mask_inference(
        self, mask_logits: jnp.ndarray, detections: Instances
    ) -> Instances:
        """Gather each detection's class channel -> pred_masks [B, D, 2S, 2S].

        Takes the head's RAW-dtype logits ([B*D, 2S, 2S, K], typically bf16)
        and gathers the class channel BEFORE widening to f32: casting first
        materialized the full K-channel tensor in f32 (at serving shape
        [32*100, 28, 28, 80] that is 802 MB — its reshape + layout copy alone
        measured 0.20 ms/img, ~3% of inference)."""
        b, d = detections.pred_classes.shape
        if self.cls_agnostic_mask:
            sel = mask_logits[..., 0]
        else:
            cls = jnp.clip(detections.pred_classes, 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                mask_logits, cls.reshape(-1)[:, None, None, None], axis=-1
            )[..., 0]
        sel = sel.reshape((b, d) + mask_logits.shape[1:3]).astype(jnp.float32)
        return detections.replace(pred_masks=jax.nn.sigmoid(sel))
