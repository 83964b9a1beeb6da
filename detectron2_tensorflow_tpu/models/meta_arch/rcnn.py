"""GeneralizedRCNN family: Faster/Mask R-CNN (FPN, C4/DC5, Cascade),
ProposalNetwork, SemanticSegmentor, PanopticFPN.

Parity targets: /root/reference/lib/modeling/meta_arch/rcnn.py:16-225,
semantic_seg.py:25-221, panoptic_fpn.py:16-296 and the ROI-heads variants
(roi_heads.py:261-605, cascade_rcnn.py:14-273). One flax module owns every
parameterized piece behind named apply-methods; pure drivers (RPN, ROI
heads, fusion) orchestrate. All control flow is static: ROI-head topology is
selected at build time, per-image work is vmap, rng is threaded explicitly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...structures import Instances
from ..backbones.resnet import ResNetStage, build_resnet_backbone
from ..necks.fpn import build_neck
from ..roi_heads.cascade import CascadeROIHeads, scale_gradient
from ..roi_heads.fast_rcnn import FastRCNNOutputLayers
from ..roi_heads.heads import (
    FastRCNNConvFCHead,
    KRCNNConvDeconvUpsampleHead,
    MaskRCNNConvUpsampleHead,
)
from ..roi_heads.roi_heads import StandardROIHeads
from ..rpn import RPN, add_ground_truth_to_proposals
from ..sem_seg import (
    build_sem_seg_head,
    combine_semantic_and_instance_outputs,
    sem_seg_loss,
)
from .build import META_ARCH_REGISTRY
from .common import DetectorModel, StatsTape, preprocess_images


class GeneralizedRCNNModule(nn.Module):
    """Parameter container for every R-CNN topology.

    * FPN Standard heads: box_heads=(head,), box_predictors=(pred,)
    * C4 (Res5ROIHeads):  box_heads=(), res5 set; predictor on pooled mean
    * Cascade:            3 box_heads + 3 box_predictors
    """

    backbone: nn.Module
    neck: nn.Module
    rpn_head: Optional[nn.Module] = None
    box_heads: Tuple[nn.Module, ...] = ()
    box_predictors: Tuple[nn.Module, ...] = ()
    res5: Optional[nn.Module] = None
    mask_head: Optional[nn.Module] = None
    keypoint_head: Optional[nn.Module] = None
    sem_seg_head: Optional[nn.Module] = None
    box_head_takes_boxes: bool = False  # RelationBoxHead needs ROI geometry
    # Learned NMS (Relation Networks duplicate removal; consumes the
    # reference's orphan ROI_BOX_RELATION_HEAD.DUPLICATE_REMOVAL_IOU /
    # RANK_EMBEDDING_DIM / NMS_NUM_GROUP keys).
    duplicate_removal: Optional[nn.Module] = None

    def compute_features(self, images, train: bool = False):
        return self.neck(self.backbone(images, train=train), train=train)

    def rpn(self, feature_list, train: bool = False):
        return self.rpn_head(feature_list, train=train)

    def box(self, pooled, stage: int = 0, train: bool = False,
            boxes=None, boxes_valid=None):
        """Returns (class_logits, deltas, roi_features_or_None)."""
        if self.res5 is not None:
            feats = self.res5(pooled, train=train)
            vec = feats.mean(axis=(1, 2))
            scores, deltas = self.box_predictors[0](vec, train=train)
            return scores, deltas, feats
        if self.box_head_takes_boxes:
            x = self.box_heads[stage](pooled, boxes, boxes_valid, train=train)
            scores, deltas = self.box_predictors[stage](x, train=train)
            # Appearance features feed the duplicate-removal stage.
            return scores, deltas, x
        x = self.box_heads[stage](pooled, train=train)
        scores, deltas = self.box_predictors[stage](x, train=train)
        return scores, deltas, None

    def dup_removal(self, appearance, scores, boxes, valid):
        """Keep logits [B, N, T] for score-sorted candidates (learned NMS),
        one column per IoU-threshold head (Hu et al. §4.3)."""
        assert self.duplicate_removal is not None
        return self.duplicate_removal(appearance, scores, boxes, valid)

    def mask(self, pooled, train: bool = False):
        assert self.mask_head is not None
        return self.mask_head(pooled, train=train)

    def keypoint(self, pooled, train: bool = False):
        assert self.keypoint_head is not None
        return self.keypoint_head(pooled, train=train)

    def sem_seg(self, features, train: bool = False):
        assert self.sem_seg_head is not None
        return self.sem_seg_head(features, train=train)

    def __call__(self, images, box_pooled, mask_pooled=None, train: bool = False):
        """Init-only path touching every submodule once."""
        features = self.compute_features(images, train=train)
        outs = [features]
        if self.rpn_head is not None:
            first = next(iter(features.values()))
            outs.append(self.rpn([first], train=train))
        if self.res5 is not None:
            outs.append(self.box(box_pooled, train=train))
            if self.mask_head is not None:
                res5_out = outs[-1][2]
                outs.append(self.mask(res5_out, train=train))
        else:
            n_dummy = box_pooled.shape[0] if box_pooled is not None else 0
            dummy_boxes = jnp.zeros((n_dummy, 1, 4))
            dummy_valid = jnp.ones((n_dummy, 1), bool)
            for stage in range(len(self.box_heads)):
                outs.append(
                    self.box(
                        box_pooled, stage=stage, train=train,
                        boxes=dummy_boxes, boxes_valid=dummy_valid,
                    )
                )
            if self.duplicate_removal is not None:
                app = outs[-1][2].reshape(n_dummy, 1, -1)
                outs.append(
                    self.dup_removal(
                        app, jnp.ones((n_dummy, 1)), dummy_boxes, dummy_valid
                    )
                )
            if self.mask_head is not None and mask_pooled is not None:
                outs.append(self.mask(mask_pooled, train=train))
        if self.keypoint_head is not None and mask_pooled is not None:
            outs.append(self.keypoint(mask_pooled, train=train))
        if self.sem_seg_head is not None:
            outs.append(self.sem_seg(features, train=train))
        return outs


def _build_rcnn_parts(cfg, with_rpn=True, with_roi=True, with_sem_seg=False):
    dtype = jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32
    backbone, bb_shapes = build_resnet_backbone(cfg, dtype=dtype)
    neck, neck_shapes = build_neck(cfg, bb_shapes, dtype=dtype)

    rpn_driver = rpn_head = None
    if with_rpn:
        rpn_driver = RPN(cfg, neck_shapes)
        rpn_head = rpn_driver.head_module(dtype)

    roi_driver = None
    box_heads: Tuple = ()
    box_predictors: Tuple = ()
    res5 = None
    mask_head = None
    keypoint_head = None
    duplicate_removal = None
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    if with_roi:
        roi_name = cfg.MODEL.ROI_HEADS.NAME
        bh = cfg.MODEL.ROI_BOX_HEAD
        if roi_name == "RelationROIHeads":
            from ..roi_heads.relation import (
                DuplicateRemovalModule,
                RelationBoxHead,
            )

            rel = cfg.MODEL.ROI_BOX_RELATION_HEAD
            roi_driver = StandardROIHeads(cfg, neck_shapes)
            box_heads = (
                RelationBoxHead(
                    fc_dim=bh.FC_DIM,
                    num_groups=rel.NUM_GROUPS,
                    key_dim=rel.KEY_DIM,
                    geometry_dim=rel.GEOMETRY_EMBEDDING_DIM,
                    dtype=dtype, name="box_head",
                ),
            )
            if rel.DUPLICATE_REMOVAL_ON:
                duplicate_removal = DuplicateRemovalModule(
                    num_groups=rel.NMS_NUM_GROUP,
                    key_dim=rel.KEY_DIM,
                    geometry_dim=rel.GEOMETRY_EMBEDDING_DIM,
                    rank_dim=rel.RANK_EMBEDDING_DIM,
                    num_thresholds=len(
                        tuple(rel.DUPLICATE_REMOVAL_IOUS)
                        or (rel.DUPLICATE_REMOVAL_IOU,)
                    ),
                    dtype=dtype, name="duplicate_removal",
                )
            box_predictors = (
                FastRCNNOutputLayers(
                    num_classes=num_classes,
                    cls_agnostic_bbox_reg=bh.CLS_AGNOSTIC_BBOX_REG,
                    dtype=dtype, name="box_predictor",
                ),
            )
        elif roi_name == "StandardROIHeads":
            roi_driver = StandardROIHeads(cfg, neck_shapes)
            box_heads = (
                FastRCNNConvFCHead(
                    num_conv=bh.NUM_CONV, conv_dim=bh.CONV_DIM,
                    num_fc=bh.NUM_FC, fc_dim=bh.FC_DIM, norm=bh.NORM,
                    dtype=dtype, name="box_head",
                ),
            )
            box_predictors = (
                FastRCNNOutputLayers(
                    num_classes=num_classes,
                    cls_agnostic_bbox_reg=bh.CLS_AGNOSTIC_BBOX_REG,
                    dtype=dtype, name="box_predictor",
                ),
            )
        elif roi_name == "Res5ROIHeads":
            roi_driver = StandardROIHeads(cfg, neck_shapes)
            r = cfg.MODEL.RESNETS
            from ..backbones.resnet import BLOCKS_PER_STAGE

            res5 = ResNetStage(
                num_blocks=BLOCKS_PER_STAGE[r.DEPTH][3],
                out_channels=r.RES2_OUT_CHANNELS * 8,
                bottleneck_channels=r.NUM_GROUPS * r.WIDTH_PER_GROUP * 8,
                first_stride=2,
                num_groups=r.NUM_GROUPS,
                stride_in_1x1=r.STRIDE_IN_1X1,
                norm=r.NORM,
                dtype=dtype,
                name="res5",
            )
            box_predictors = (
                FastRCNNOutputLayers(
                    num_classes=num_classes,
                    cls_agnostic_bbox_reg=bh.CLS_AGNOSTIC_BBOX_REG,
                    dtype=dtype, name="box_predictor",
                ),
            )
        elif roi_name == "CascadeROIHeads":
            roi_driver = CascadeROIHeads(cfg, neck_shapes)
            box_heads = tuple(
                FastRCNNConvFCHead(
                    num_conv=bh.NUM_CONV, conv_dim=bh.CONV_DIM,
                    num_fc=bh.NUM_FC, fc_dim=bh.FC_DIM, norm=bh.NORM,
                    dtype=dtype, name=f"box_head_{k}",
                )
                for k in range(roi_driver.num_stages)
            )
            box_predictors = tuple(
                FastRCNNOutputLayers(
                    num_classes=num_classes,
                    cls_agnostic_bbox_reg=True,
                    dtype=dtype, name=f"box_predictor_{k}",
                )
                for k in range(roi_driver.num_stages)
            )
        else:
            raise NotImplementedError(f"ROI heads '{roi_name}'")

        if cfg.MODEL.MASK_ON:
            mh = cfg.MODEL.ROI_MASK_HEAD
            mask_head = MaskRCNNConvUpsampleHead(
                num_classes=num_classes,
                num_conv=mh.NUM_CONV, conv_dim=mh.CONV_DIM, norm=mh.NORM,
                cls_agnostic=mh.CLS_AGNOSTIC_MASK, dtype=dtype, name="mask_head",
            )
        if cfg.MODEL.KEYPOINT_ON:
            kh = cfg.MODEL.ROI_KEYPOINT_HEAD
            keypoint_head = KRCNNConvDeconvUpsampleHead(
                num_keypoints=kh.NUM_KEYPOINTS,
                conv_dims=tuple(kh.CONV_DIMS),
                dtype=dtype, name="keypoint_head",
            )

    sem_seg_head = None
    if with_sem_seg:
        sem_seg_head = build_sem_seg_head(cfg, neck_shapes, dtype=dtype)

    module = GeneralizedRCNNModule(
        backbone=backbone, neck=neck, rpn_head=rpn_head,
        box_heads=box_heads, box_predictors=box_predictors, res5=res5,
        mask_head=mask_head, keypoint_head=keypoint_head,
        sem_seg_head=sem_seg_head,
        box_head_takes_boxes=(
            with_roi and cfg.MODEL.ROI_HEADS.NAME == "RelationROIHeads"
        ),
        duplicate_removal=duplicate_removal,
    )
    return module, rpn_driver, roi_driver, neck_shapes, dtype


class _RCNNDrivers:
    """Shared loss/predict orchestration for the R-CNN meta-arch family."""

    def __init__(self, cfg, module, rpn_driver, roi_driver, neck_shapes, dtype,
                 with_sem_seg=False):
        self.cfg = cfg
        self.module = module
        self.rpn = rpn_driver
        self.roi = roi_driver
        self.dtype = dtype
        self.pixel_mean = list(cfg.MODEL.PIXEL_MEAN)
        self.pixel_std = list(cfg.MODEL.PIXEL_STD)
        self.input_format = cfg.MODEL.INPUT_FORMAT
        self.mask_on = cfg.MODEL.MASK_ON and module.mask_head is not None
        self.keypoint_on = (
            cfg.MODEL.KEYPOINT_ON and module.keypoint_head is not None
        )
        self.kp_normalize = cfg.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS
        self.kp_loss_weight = cfg.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT
        self.is_res5 = module.res5 is not None
        self.is_cascade = isinstance(roi_driver, CascadeROIHeads)
        # Fast R-CNN path: precomputed proposals from the batch, no RPN
        # (MODEL.LOAD_PROPOSALS; the reference defines the key at
        # defaults.py:68 but never consumes it — implemented here).
        self.load_proposals = cfg.MODEL.LOAD_PROPOSALS
        # Learned duplicate removal (relation networks): replaces NMS at
        # inference and adds a BCE loss in training.
        self.dup_on = module.duplicate_removal is not None
        _rel = cfg.MODEL.ROI_BOX_RELATION_HEAD
        self.dup_ious = tuple(_rel.DUPLICATE_REMOVAL_IOUS) or (
            _rel.DUPLICATE_REMOVAL_IOU,
        )
        self.dup_combine = _rel.DUPLICATE_REMOVAL_COMBINE
        assert self.dup_combine in ("mean", "max"), (
            f"DUPLICATE_REMOVAL_COMBINE must be 'mean' or 'max', got "
            f"{self.dup_combine!r}"
        )
        self.num_stages = roi_driver.num_stages if self.is_cascade else 1
        self.with_sem_seg = with_sem_seg
        self.sem_seg_ignore = cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE
        self.sem_seg_loss_weight = cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT
        self.instance_loss_weight = cfg.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT
        self.neck_shapes = neck_shapes

    def prep(self, batch):
        return preprocess_images(
            batch["image"], self.pixel_mean, self.pixel_std, self.input_format,
            self.dtype,
        )

    # -- module call helpers ---------------------------------------------------
    def features_and_rpn(self, variables, batch, train, tape=None):
        tape = tape or StatsTape(variables)
        images = self.prep(batch)
        features = tape.apply(
            self.module, variables, images, train=train, method="compute_features"
        )
        rpn_feats = [features[f] for f in self.rpn.in_features]
        logits, deltas = tape.apply(
            self.module, variables, rpn_feats, train=train, method="rpn"
        )
        # Keep the head's native dtype (bf16): upcasting the full maps here
        # materializes ~130 MB/level of f32 copies that the consumers then
        # reshape/relayout just to gather a few thousand rows (measured
        # 0.23 ms/img at the serving shape). RPN.losses/proposals cast the
        # GATHERED slices to f32 instead — bf16 ranking is f32 ranking
        # (upcast is monotone), so top-k/NMS results are identical.
        return features, list(logits), list(deltas)

    def run_box(self, variables, features, boxes, stage, train, grad_scale=1.0,
                tape=None, boxes_valid=None, storage_pack=None, pooled=None):
        tape = tape or StatsTape(variables)
        if pooled is None:
            pooled = self.roi.pool_box_features(
                features, boxes, storage_pack, valid=boxes_valid
            )
        if grad_scale != 1.0:
            pooled = scale_gradient(pooled, grad_scale)
        kwargs = {}
        if self.module.box_head_takes_boxes:
            kwargs = {"boxes": boxes, "boxes_valid": boxes_valid}
        scores, deltas, roi_feats = tape.apply(
            self.module, variables, pooled, stage=stage, train=train,
            method="box", **kwargs,
        )
        return scores.astype(jnp.float32), deltas.astype(jnp.float32), roi_feats

    # -- learned duplicate removal (Relation Networks, Hu et al. 2018) ---------
    def _dup_candidates(self, scores, ds, boxes, valid, image_sizes, topk):
        from ..roi_heads.relation import build_duplicate_removal_candidates

        b, p = boxes.shape[:2]
        return build_duplicate_removal_candidates(
            scores.reshape(b, p, -1), ds.reshape(b, p, -1), boxes, valid,
            image_sizes, self.roi.box2box, self.roi.num_classes,
            self.roi.cls_agnostic_bbox_reg, topk,
        )

    @staticmethod
    def _gather_appearance(appearance, idx, b, p):
        app = appearance.reshape(b, p, -1)
        return jnp.take_along_axis(app, idx[..., None], axis=1)

    def dup_removal_inference(
        self, variables, scores, ds, proposals, appearance, image_sizes
    ) -> Instances:
        """Learned NMS: final score = cls score * combine_t(sigmoid(keep
        logit_t)) over the T threshold heads, then a plain top-k — no
        greedy suppression anywhere.

        combine (DUPLICATE_REMOVAL_COMBINE): 'mean' averages the heads
        (Hu et al. §4.3); 'max' keeps a candidate any head votes for —
        duplicates are positive in NO head (one-positive-per-GT at every
        eta) so they stay suppressed, while the eta-ladder's strict heads
        can no longer drag down a box that is only loose-positive (the
        AP50 regression the mean rule measured: 94.2 -> 90.0)."""
        b, p = proposals.proposal_boxes.shape[:2]
        topk = min(p, 4 * self.roi.detections_per_image)
        cs, cc, cb, cv, idx = self._dup_candidates(
            scores, ds, proposals.proposal_boxes, proposals.is_valid,
            image_sizes, topk,
        )
        app = self._gather_appearance(appearance, idx, b, p)
        keep = self.module.apply(
            variables, app, cs, cb, cv, method="dup_removal"
        ).astype(jnp.float32)  # [B, R, T]
        combine = jnp.max if self.dup_combine == "max" else jnp.mean
        final = cs * combine(jax.nn.sigmoid(keep), axis=-1)
        final = jnp.where(cv & (cs > self.roi.score_thresh), final, 0.0)
        d = self.roi.detections_per_image
        det_scores, di = jax.lax.top_k(final, min(d, topk))
        det_boxes = jnp.take_along_axis(cb, di[..., None], axis=1)
        det_classes = jnp.take_along_axis(cc, di, axis=1)
        if topk < d:  # tiny-capacity configs: pad to the fixed contract
            pad = d - topk
            det_scores = jnp.pad(det_scores, ((0, 0), (0, pad)))
            det_boxes = jnp.pad(det_boxes, ((0, 0), (0, pad), (0, 0)))
            det_classes = jnp.pad(det_classes, ((0, 0), (0, pad)))
        det_valid = det_scores > 0
        return Instances(
            boxes=jnp.where(det_valid[..., None], det_boxes, 0.0),
            scores=jnp.where(det_valid, det_scores, 0.0),
            pred_classes=jnp.where(det_valid, det_classes, -1),
            is_valid=det_valid,
        )

    def dup_removal_loss(
        self, variables, tape, scores, ds, appearance, sampled, batch,
        image_sizes,
    ) -> jnp.ndarray:
        """BCE on the multiplied score against one-positive-per-GT targets,
        one target column per eta in ``dup_ious`` (the paper's training
        rule, §4.3 multi-threshold form)."""
        from ..roi_heads.relation import duplicate_removal_targets_multi

        b, s = sampled.boxes.shape[:2]
        cs, cc, cb, cv, idx = self._dup_candidates(
            scores, ds, sampled.boxes, sampled.valid, image_sizes, s
        )
        app = self._gather_appearance(appearance, idx, b, s)
        keep = tape.apply(
            self.module, variables, app, cs, cb, cv, method="dup_removal"
        ).astype(jnp.float32)  # [B, S, T]
        final = cs[..., None] * jax.nn.sigmoid(keep)  # [B, S, T]
        gt_valid = batch["gt_valid"]
        if "gt_is_crowd" in batch:  # optional field (crowds never anchor)
            gt_valid = gt_valid & ~batch["gt_is_crowd"]
        # One target column per IoU-threshold head: the eta=0.9 column only
        # marks the tightest box positive, teaching the head the strict-IoU
        # suppression a single eta=0.5 target never asks for. The [S, G]
        # IoU/eligibility work is shared across etas (one pass, T columns).
        targets = jax.vmap(
            lambda cbx, ccl, csc, cvl, gb, gc, gv:
            duplicate_removal_targets_multi(
                cbx, ccl, csc, cvl, gb, gc, gv, self.dup_ious
            )
        )(cb, cc, cs, cv, batch["gt_boxes"], batch["gt_classes"],
          gt_valid)  # [B, S, T]
        prob = jnp.clip(final, 1e-6, 1.0 - 1e-6)
        bce = -(targets * jnp.log(prob) + (1 - targets) * jnp.log1p(-prob))
        cvf = cv.astype(jnp.float32)[..., None]
        return jnp.sum(bce * cvf) / jnp.maximum(
            jnp.sum(cvf) * len(self.dup_ious), 1.0
        )

    def features_only(self, variables, batch, train, tape=None):
        tape = tape or StatsTape(variables)
        images = self.prep(batch)
        return tape.apply(
            self.module, variables, images, train=train,
            method="compute_features",
        )

    @staticmethod
    def batch_proposals(batch):
        """Precomputed proposals packed by the loader -> Instances."""
        return Instances(
            proposal_boxes=batch["proposal_boxes"],
            objectness_logits=batch["proposal_scores"],
            is_valid=batch["proposal_valid"],
        )

    # -- losses ------------------------------------------------------------------
    def loss_fn(self, variables, batch, rng, state):
        tape = StatsTape(variables)
        rng_rpn, rng_roi = jax.random.split(rng)
        image_sizes = batch["image_size"]
        if self.load_proposals:
            features = self.features_only(variables, batch, True, tape=tape)
            losses = {}
            proposals = self.batch_proposals(batch)
        else:
            features, logits, deltas = self.features_and_rpn(
                variables, batch, True, tape=tape
            )
            losses = self.rpn.losses(rng_rpn, logits, deltas, batch, image_sizes)
            proposals = self.rpn.proposals(
                logits, deltas, image_sizes, training=True
            )
        proposals = jax.tree.map(jax.lax.stop_gradient, proposals)
        if self.roi.proposal_append_gt:
            proposals = add_ground_truth_to_proposals(proposals, batch)
        sampled = self.roi.label_and_sample_proposals(rng_roi, proposals, batch)
        # One storage build serves the box, mask and keypoint poolers.
        storage_pack = (
            self.roi.pooling_storage(features)
            if hasattr(self.roi, "pooling_storage") else None
        )

        inst_losses = {}
        roi_feats = None
        pre_pooled = {}
        if self.is_cascade:
            boxes = sampled.boxes
            gt_classes, gt_boxes = sampled.gt_classes, sampled.gt_boxes
            valid = sampled.valid
            b, s = gt_classes.shape
            for k in range(self.num_stages):
                scores, ds, _ = self.run_box(
                    variables, features, boxes, k, True,
                    grad_scale=1.0 / self.num_stages, tape=tape,
                    boxes_valid=valid, storage_pack=storage_pack,
                )
                inst_losses.update(
                    self.roi.stage_losses(
                        k, scores, ds, boxes, gt_classes, gt_boxes, valid
                    )
                )
                if k + 1 < self.num_stages:
                    boxes = self.roi.refine_boxes(k, ds, boxes, image_sizes)
                    gt_classes, gt_boxes, _ = self.roi._rematch(k + 1, boxes, batch)
                    valid = sampled.valid  # refined boxes keep slot validity
        else:
            # Fuse the box/mask/keypoint pools into one op with a chained
            # Pallas backward — independent pools autodiff into one full
            # f32 gradient plane EACH (zeros + add per extra set; ~1.0
            # ms/img of pure HBM traffic at the Mask R-CNN train shape).
            # See poolers.pool_multi_from_storage.
            fused = []
            if (storage_pack is not None and not self.is_res5
                    and os.environ.get("D2TPU_FUSED_POOL", "1") != "0"):
                if self.mask_on:
                    fused.append(("mask", self.roi.mask_pooler))
                if self.keypoint_on:
                    fused.append(("keypoint", self.roi.keypoint_pooler))
            if fused:
                m = self.roi.mask_slots
                outs = self.roi.pool_multi(
                    [(self.roi.box_pooler, sampled.boxes, sampled.valid)]
                    + [
                        (p, sampled.boxes[:, :m], sampled.valid[:, :m])
                        for _, p in fused
                    ],
                    storage_pack,
                )
                pre_pooled = {"box": outs[0]}
                pre_pooled.update(
                    {name: o for (name, _), o in zip(fused, outs[1:])}
                )
            scores, ds, roi_feats = self.run_box(
                variables, features, sampled.boxes, 0, True, tape=tape,
                boxes_valid=sampled.valid, storage_pack=storage_pack,
                pooled=pre_pooled.get("box"),
            )
            inst_losses.update(self.roi.box_losses(scores, ds, sampled))
            if self.dup_on:
                inst_losses["loss_dup"] = self.dup_removal_loss(
                    variables, tape, scores, ds, roi_feats, sampled, batch,
                    image_sizes,
                )

        if self.mask_on:
            m = self.roi.mask_slots
            if self.is_res5:
                # C4: reuse the res5 features of the leading (fg) slots.
                b, s = sampled.gt_classes.shape
                rf = roi_feats.reshape((b, s) + roi_feats.shape[1:])[:, :m]
                mask_in = rf.reshape((-1,) + rf.shape[2:])
            else:
                # Pad slots (invalid) skip their patch DMA and pool zeros.
                # Bg slots are REAL proposals and stay pooled: with a
                # norm-equipped mask head their features enter batch stats,
                # and only the loss (masked by is_fg & valid) ignores them.
                mask_in = pre_pooled.get("mask")
                if mask_in is None:
                    mask_in = self.roi.pool_mask_features(
                        features, sampled.boxes[:, :m], storage_pack,
                        valid=sampled.valid[:, :m],
                    )
            mask_logits = tape.apply(
                self.module, variables, mask_in, train=True, method="mask"
            )
            # Native dtype: mask_loss gathers each ROI's GT-class channel
            # FIRST and casts the [B, M, 28, 28] slice — casting the full
            # [B*M, 28, 28, K] tensor here materializes 514 MB f32 whose
            # gather-transpose is an f32 zeros+scatter of the same size
            # (0.4 ms/img at train batch 16, round-4 roofline audit).
            inst_losses["loss_mask"] = self.roi.mask_loss(
                mask_logits, sampled, batch
            )

        if self.keypoint_on:
            m = self.roi.mask_slots
            kp_in = pre_pooled.get("keypoint")
            if kp_in is None:
                kp_in = self.roi.pool_keypoint_features(
                    features, sampled.boxes[:, :m], storage_pack,
                    valid=sampled.valid[:, :m],
                )
            kp_logits = tape.apply(
                self.module, variables, kp_in, train=True, method="keypoint"
            )
            inst_losses["loss_keypoint"] = self.roi.keypoint_loss(
                kp_logits.astype(jnp.float32), sampled, batch,
                self.kp_normalize, self.kp_loss_weight,
            )

        if self.with_sem_seg:
            for k, v in inst_losses.items():
                inst_losses[k] = v * self.instance_loss_weight
            sem_logits = tape.apply(
                self.module, variables, features, train=True, method="sem_seg"
            ).astype(jnp.float32)
            losses["loss_sem_seg"] = sem_seg_loss(
                sem_logits, batch["gt_sem_seg"], self.sem_seg_ignore,
                self.sem_seg_loss_weight,
            )
        losses.update(inst_losses)
        total = sum(losses.values())
        return total, (losses, {**state, **tape.state()})

    # -- inference ------------------------------------------------------------------
    def predict_fn(self, variables, batch):
        image_sizes = batch["image_size"]
        if self.load_proposals:
            features = self.features_only(variables, batch, False)
            proposals = self.batch_proposals(batch)
        else:
            features, logits, deltas = self.features_and_rpn(
                variables, batch, False
            )
            proposals = self.rpn.proposals(
                logits, deltas, image_sizes, training=False
            )

        storage_pack = (
            self.roi.pooling_storage(features)
            if hasattr(self.roi, "pooling_storage") else None
        )
        if self.is_cascade:
            boxes = proposals.proposal_boxes
            stage_scores = []
            ds = None
            for k in range(self.num_stages):
                scores, ds, _ = self.run_box(
                    variables, features, boxes, k, False,
                    boxes_valid=proposals.is_valid, storage_pack=storage_pack,
                )
                stage_scores.append(scores)
                if k + 1 < self.num_stages:
                    boxes = self.roi.refine_boxes(k, ds, boxes, image_sizes)
            detections = self.roi.cascade_inference(
                stage_scores, ds, boxes, proposals.is_valid, image_sizes
            )
        else:
            scores, ds, app = self.run_box(
                variables, features, proposals.proposal_boxes, 0, False,
                boxes_valid=proposals.is_valid, storage_pack=storage_pack,
            )
            if self.dup_on:
                detections = self.dup_removal_inference(
                    variables, scores, ds, proposals, app, image_sizes
                )
            else:
                detections = self.roi.box_inference(
                    scores, ds, proposals, image_sizes
                )

        if self.mask_on:
            if self.is_res5:
                pooled = self.roi.pool_box_features(
                    features, detections.boxes, storage_pack,
                    valid=detections.is_valid,
                )
                _, _, rf = self.module.apply(
                    variables, pooled, stage=0, train=False, method="box"
                )
                mask_in = rf
            else:
                mask_in = self.roi.pool_mask_features(
                    features, detections.boxes, storage_pack,
                    valid=detections.is_valid,
                )
            mask_logits = self.module.apply(
                variables, mask_in, train=False, method="mask"
            )
            # Raw dtype in: mask_inference gathers the class channel before
            # widening to f32 (see roi_heads.mask_inference).
            detections = self.roi.mask_inference(mask_logits, detections)

        if self.keypoint_on:
            kp_in = self.roi.pool_keypoint_features(
                features, detections.boxes, storage_pack,
                valid=detections.is_valid,
            )
            kp_logits = self.module.apply(
                variables, kp_in, train=False, method="keypoint"
            )
            detections = self.roi.keypoint_inference(
                kp_logits.astype(jnp.float32), detections
            )

        if self.with_sem_seg:
            sem_logits = self.module.apply(
                variables, features, train=False, method="sem_seg"
            ).astype(jnp.float32)
            detections = detections.replace(
                sem_seg=jnp.argmax(sem_logits, axis=-1)
            )
        return detections

    def predict_with_boxes_fn(self, variables, batch, detections):
        """Per-ROI outputs for GIVEN detections (the reference's
        ``inference(detected_instances=...)`` path, rcnn.py:93-122):
        skip proposal+box stages, recompute masks/keypoints at the
        supplied boxes. Used by TTA to attach masks to merged boxes."""
        features = self.features_only(variables, batch, False)
        storage_pack = (
            self.roi.pooling_storage(features)
            if hasattr(self.roi, "pooling_storage") else None
        )
        if self.mask_on:
            if self.is_res5:
                pooled = self.roi.pool_box_features(
                    features, detections.boxes, storage_pack,
                    valid=detections.is_valid,
                )
                _, _, rf = self.module.apply(
                    variables, pooled, stage=0, train=False, method="box"
                )
                mask_in = rf
            else:
                mask_in = self.roi.pool_mask_features(
                    features, detections.boxes, storage_pack,
                    valid=detections.is_valid,
                )
            mask_logits = self.module.apply(
                variables, mask_in, train=False, method="mask"
            )
            # Raw dtype in: mask_inference gathers the class channel before
            # widening to f32 (see roi_heads.mask_inference).
            detections = self.roi.mask_inference(mask_logits, detections)
        if self.keypoint_on:
            kp_in = self.roi.pool_keypoint_features(
                features, detections.boxes, storage_pack,
                valid=detections.is_valid,
            )
            kp_logits = self.module.apply(
                variables, kp_in, train=False, method="keypoint"
            )
            detections = self.roi.keypoint_inference(
                kp_logits.astype(jnp.float32), detections
            )
        return detections


def _make_model(cfg, with_sem_seg=False) -> DetectorModel:
    module, rpn_driver, roi_driver, neck_shapes, dtype = _build_rcnn_parts(
        cfg, with_rpn=not cfg.MODEL.LOAD_PROPOSALS, with_sem_seg=with_sem_seg
    )
    drv = _RCNNDrivers(
        cfg, module, rpn_driver, roi_driver, neck_shapes, dtype, with_sem_seg
    )
    box_res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    mask_res = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION
    channels = (
        cfg.MODEL.NECK.OUT_CHANNELS
        if cfg.MODEL.NECK.NAME
        else next(iter(neck_shapes.values())).channels
    )

    def init_fn(rng, batch):
        dummy_box = jnp.zeros((1, box_res, box_res, channels), dtype)
        need_pooled = (cfg.MODEL.MASK_ON and module.res5 is None) or cfg.MODEL.KEYPOINT_ON
        dummy_mask = (
            jnp.zeros((1, mask_res, mask_res, channels), dtype)
            if need_pooled
            else None
        )
        return module.init(rng, drv.prep(batch), dummy_box, dummy_mask, train=False)

    return DetectorModel(
        module, init_fn, drv.loss_fn, drv.predict_fn,
        predict_with_boxes=drv.predict_with_boxes_fn,
    )


@META_ARCH_REGISTRY.register(name="GeneralizedRCNN")
def build_generalized_rcnn(cfg) -> DetectorModel:
    return _make_model(cfg, with_sem_seg=False)


@META_ARCH_REGISTRY.register(name="PanopticFPN")
def build_panoptic_fpn(cfg) -> DetectorModel:
    """GeneralizedRCNN + SemSegFPNHead; fusion available via
    :func:`panoptic_fusion` on the prediction outputs."""
    return _make_model(cfg, with_sem_seg=True)


def panoptic_fusion(cfg, detections: Instances):
    """Batched panoptic fusion over predict() outputs (needs pred_masks and
    sem_seg fields)."""
    comb = cfg.MODEL.PANOPTIC_FPN.COMBINE

    def one(det: Instances):
        return combine_semantic_and_instance_outputs(
            det,
            det.sem_seg,
            comb.OVERLAP_THRESH,
            comb.STUFF_AREA_LIMIT,
            comb.INSTANCES_CONFIDENCE_THRESH,
            cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        )

    return jax.vmap(one)(detections)


@META_ARCH_REGISTRY.register(name="SemanticSegmentor")
def build_semantic_segmentor(cfg) -> DetectorModel:
    module, _, _, neck_shapes, dtype = _build_rcnn_parts(
        cfg, with_rpn=False, with_roi=False, with_sem_seg=True
    )
    pixel_mean = list(cfg.MODEL.PIXEL_MEAN)
    pixel_std = list(cfg.MODEL.PIXEL_STD)
    input_format = cfg.MODEL.INPUT_FORMAT

    def prep(batch):
        return preprocess_images(
            batch["image"], pixel_mean, pixel_std, input_format, dtype
        )

    def init_fn(rng, batch):
        return module.init(rng, prep(batch), None, None, train=False)

    def loss_fn(variables, batch, rng, state):
        features = module.apply(
            variables, prep(batch), train=True, method="compute_features"
        )
        sem_logits = module.apply(
            variables, features, train=True, method="sem_seg"
        ).astype(jnp.float32)
        loss = sem_seg_loss(
            sem_logits, batch["gt_sem_seg"], cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
        )
        return loss, ({"loss_sem_seg": loss}, state)

    def predict_fn(variables, batch):
        features = module.apply(
            variables, prep(batch), train=False, method="compute_features"
        )
        sem_logits = module.apply(
            variables, features, train=False, method="sem_seg"
        ).astype(jnp.float32)
        return Instances(
            sem_seg=jnp.argmax(sem_logits, axis=-1),
            sem_seg_logits=sem_logits,
            is_valid=jnp.ones((sem_logits.shape[0], 1), bool),
        )

    return DetectorModel(module, init_fn, loss_fn, predict_fn)


@META_ARCH_REGISTRY.register(name="ProposalNetwork")
def build_proposal_network(cfg) -> DetectorModel:
    """RPN-only meta-arch (proposal evaluation); reference rcnn.py:160-225."""
    module, rpn_driver, _, neck_shapes, dtype = _build_rcnn_parts(
        cfg, with_roi=False
    )
    pixel_mean = list(cfg.MODEL.PIXEL_MEAN)
    pixel_std = list(cfg.MODEL.PIXEL_STD)
    input_format = cfg.MODEL.INPUT_FORMAT

    def prep(batch):
        return preprocess_images(
            batch["image"], pixel_mean, pixel_std, input_format, dtype
        )

    def init_fn(rng, batch):
        return module.init(rng, prep(batch), None, None, train=False)

    def _stage(variables, batch, train):
        features = module.apply(
            variables, prep(batch), train=train, method="compute_features"
        )
        rpn_feats = [features[f] for f in rpn_driver.in_features]
        logits, deltas = module.apply(variables, rpn_feats, train=train, method="rpn")
        # Native dtype; RPN.losses/proposals cast gathered slices to f32.
        return list(logits), list(deltas)

    def loss_fn(variables, batch, rng, state):
        logits, deltas = _stage(variables, batch, train=True)
        losses = rpn_driver.losses(rng, logits, deltas, batch, batch["image_size"])
        return sum(losses.values()), (losses, state)

    def predict_fn(variables, batch):
        logits, deltas = _stage(variables, batch, train=False)
        props = rpn_driver.proposals(logits, deltas, batch["image_size"], False)
        return Instances(
            boxes=props.proposal_boxes,
            scores=props.objectness_logits,
            pred_classes=jnp.zeros(props.objectness_logits.shape, jnp.int32),
            is_valid=props.is_valid,
        )

    return DetectorModel(module, init_fn, loss_fn, predict_fn)
