"""GeneralizedRCNN: backbone -> neck -> RPN -> ROI heads (+ProposalNetwork).

Parity target: /root/reference/lib/modeling/meta_arch/rcnn.py:16-225. The
flax module owns only parameterized pieces (trunk, RPN head, box/mask heads)
as setup() submodules exposed through named apply-methods; proposal
selection, sampling, losses and NMS are pure drivers — so the whole training
step is one jit with explicit rng threading (the reference's global
training-phase flag and per-clone graph replication both disappear).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...structures import Instances
from ..backbones.resnet import build_resnet_backbone
from ..necks.fpn import build_neck
from ..roi_heads.fast_rcnn import FastRCNNOutputLayers
from ..roi_heads.heads import FastRCNNConvFCHead, MaskRCNNConvUpsampleHead
from ..roi_heads.roi_heads import StandardROIHeads
from ..rpn import RPN, add_ground_truth_to_proposals
from .build import META_ARCH_REGISTRY
from .common import DetectorModel, preprocess_images


class GeneralizedRCNNModule(nn.Module):
    """Parameter container; drivers orchestrate its apply-methods."""

    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module
    box_head: nn.Module
    box_predictor: nn.Module
    mask_head: Optional[nn.Module] = None

    def compute_features(self, images, train: bool = False):
        return self.neck(self.backbone(images, train=train), train=train)

    def rpn(self, feature_list, train: bool = False):
        return self.rpn_head(feature_list, train=train)

    def box(self, pooled, train: bool = False):
        return self.box_predictor(self.box_head(pooled, train=train), train=train)

    def mask(self, pooled, train: bool = False):
        assert self.mask_head is not None
        return self.mask_head(pooled, train=train)

    def __call__(self, images, box_pooled, mask_pooled=None, train: bool = False):
        """Init-only path touching every submodule once."""
        features = self.compute_features(images, train=train)
        first = next(iter(features.values()))
        rpn_out = self.rpn([first], train=train)
        box_out = self.box(box_pooled, train=train)
        mask_out = None
        if self.mask_head is not None and mask_pooled is not None:
            mask_out = self.mask(mask_pooled, train=train)
        return features, rpn_out, box_out, mask_out


def _build_rcnn_parts(cfg):
    dtype = jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32
    backbone, bb_shapes = build_resnet_backbone(cfg, dtype=dtype)
    neck, neck_shapes = build_neck(cfg, bb_shapes, dtype=dtype)

    rpn_driver = RPN(cfg, neck_shapes)
    rpn_head = rpn_driver.head_module(dtype)

    roi_name = cfg.MODEL.ROI_HEADS.NAME
    if roi_name != "StandardROIHeads":
        raise NotImplementedError(f"ROI heads '{roi_name}' not yet built")
    roi_driver = StandardROIHeads(cfg, neck_shapes)

    bh = cfg.MODEL.ROI_BOX_HEAD
    box_head = FastRCNNConvFCHead(
        num_conv=bh.NUM_CONV, conv_dim=bh.CONV_DIM,
        num_fc=bh.NUM_FC, fc_dim=bh.FC_DIM, norm=bh.NORM,
        dtype=dtype, name="box_head",
    )
    box_predictor = FastRCNNOutputLayers(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        cls_agnostic_bbox_reg=bh.CLS_AGNOSTIC_BBOX_REG,
        dtype=dtype, name="box_predictor",
    )
    mask_head = None
    if cfg.MODEL.MASK_ON:
        mh = cfg.MODEL.ROI_MASK_HEAD
        mask_head = MaskRCNNConvUpsampleHead(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            num_conv=mh.NUM_CONV, conv_dim=mh.CONV_DIM, norm=mh.NORM,
            cls_agnostic=mh.CLS_AGNOSTIC_MASK, dtype=dtype, name="mask_head",
        )
    module = GeneralizedRCNNModule(
        backbone=backbone, neck=neck, rpn_head=rpn_head,
        box_head=box_head, box_predictor=box_predictor, mask_head=mask_head,
    )
    return module, rpn_driver, roi_driver, neck_shapes, dtype


@META_ARCH_REGISTRY.register(name="GeneralizedRCNN")
def build_generalized_rcnn(cfg) -> DetectorModel:
    module, rpn_driver, roi_driver, neck_shapes, dtype = _build_rcnn_parts(cfg)
    pixel_mean = list(cfg.MODEL.PIXEL_MEAN)
    pixel_std = list(cfg.MODEL.PIXEL_STD)
    input_format = cfg.MODEL.INPUT_FORMAT
    mask_on = cfg.MODEL.MASK_ON
    box_res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    mask_res = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION
    channels = cfg.MODEL.NECK.OUT_CHANNELS if cfg.MODEL.NECK.NAME else next(
        iter(neck_shapes.values())
    ).channels

    def prep(batch):
        return preprocess_images(
            batch["image"], pixel_mean, pixel_std, input_format, dtype
        )

    def init_fn(rng, batch):
        dummy_box = jnp.zeros((1, box_res, box_res, channels), dtype)
        dummy_mask = (
            jnp.zeros((1, mask_res, mask_res, channels), dtype) if mask_on else None
        )
        return module.init(rng, prep(batch), dummy_box, dummy_mask, train=False)

    def _rpn_stage(variables, batch, train):
        images = prep(batch)
        features = module.apply(
            variables, images, train=train, method="compute_features"
        )
        rpn_feats = [features[f] for f in rpn_driver.in_features]
        logits, deltas = module.apply(
            variables, rpn_feats, train=train, method="rpn"
        )
        logits = [l.astype(jnp.float32) for l in logits]
        deltas = [d.astype(jnp.float32) for d in deltas]
        return features, logits, deltas

    def loss_fn(variables, batch, rng, state):
        rng_rpn, rng_roi = jax.random.split(rng)
        features, logits, deltas = _rpn_stage(variables, batch, train=True)
        image_sizes = batch["image_size"]

        losses = rpn_driver.losses(rng_rpn, logits, deltas, batch, image_sizes)

        proposals = rpn_driver.proposals(logits, deltas, image_sizes, training=True)
        # Proposal coordinates are training constants (D2 semantics).
        proposals = jax.tree.map(jax.lax.stop_gradient, proposals)
        proposals = add_ground_truth_to_proposals(proposals, batch)
        sampled = roi_driver.label_and_sample_proposals(rng_roi, proposals, batch)

        pooled = roi_driver.pool_box_features(features, sampled.boxes)
        class_logits, box_deltas = module.apply(
            variables, pooled, train=True, method="box"
        )
        losses.update(
            roi_driver.box_losses(
                class_logits.astype(jnp.float32),
                box_deltas.astype(jnp.float32),
                sampled,
            )
        )

        if mask_on:
            m = roi_driver.mask_slots
            mask_pooled = roi_driver.pool_mask_features(
                features, sampled.boxes[:, :m]
            )
            mask_logits = module.apply(
                variables, mask_pooled, train=True, method="mask"
            )
            losses["loss_mask"] = roi_driver.mask_loss(
                mask_logits.astype(jnp.float32), sampled, batch
            )

        total = sum(losses.values())
        return total, (losses, state)

    def predict_fn(variables, batch):
        features, logits, deltas = _rpn_stage(variables, batch, train=False)
        image_sizes = batch["image_size"]
        proposals = rpn_driver.proposals(logits, deltas, image_sizes, training=False)

        pooled = roi_driver.pool_box_features(
            features, proposals.proposal_boxes
        )
        class_logits, box_deltas = module.apply(
            variables, pooled, train=False, method="box"
        )
        detections = roi_driver.box_inference(
            class_logits.astype(jnp.float32),
            box_deltas.astype(jnp.float32),
            proposals,
            image_sizes,
        )
        if mask_on:
            mask_pooled = roi_driver.pool_mask_features(
                features, detections.boxes
            )
            mask_logits = module.apply(
                variables, mask_pooled, train=False, method="mask"
            )
            detections = roi_driver.mask_inference(
                mask_logits.astype(jnp.float32), detections
            )
        return detections

    return DetectorModel(module, init_fn, loss_fn, predict_fn)


@META_ARCH_REGISTRY.register(name="ProposalNetwork")
def build_proposal_network(cfg) -> DetectorModel:
    """RPN-only meta-arch (proposal evaluation); reference rcnn.py:160-225."""
    module, rpn_driver, _, neck_shapes, dtype = _build_rcnn_parts(cfg)
    pixel_mean = list(cfg.MODEL.PIXEL_MEAN)
    pixel_std = list(cfg.MODEL.PIXEL_STD)
    input_format = cfg.MODEL.INPUT_FORMAT

    def prep(batch):
        return preprocess_images(
            batch["image"], pixel_mean, pixel_std, input_format, dtype
        )

    def init_fn(rng, batch):
        res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
        ch = cfg.MODEL.NECK.OUT_CHANNELS if cfg.MODEL.NECK.NAME else next(
            iter(neck_shapes.values())
        ).channels
        return module.init(
            rng, prep(batch), jnp.zeros((1, res, res, ch), dtype), None, train=False
        )

    def _stage(variables, batch, train):
        features = module.apply(
            variables, prep(batch), train=train, method="compute_features"
        )
        rpn_feats = [features[f].astype(jnp.float32) for f in rpn_driver.in_features]
        logits, deltas = module.apply(variables, rpn_feats, train=train, method="rpn")
        return (
            [l.astype(jnp.float32) for l in logits],
            [d.astype(jnp.float32) for d in deltas],
        )

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
