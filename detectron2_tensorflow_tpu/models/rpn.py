"""Region Proposal Network: head, GT assignment, losses, proposal selection.

Parity targets: /root/reference/lib/modeling/proposal_generator/rpn.py:30-195
and rpn_outputs.py:29-440. TPU-native re-derivation:

  * per-image tf.map_fn pipelines (GT assignment, per-level NMS) become vmap
    over the batch with fixed-capacity outputs;
  * boolean_mask chains (score filter, min-size prune, boundary prune)
    become validity masks feeding the fixed-shape NMS;
  * anchors are trace-time constants.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import nms_fixed
from ..ops.topk import spatial_top_k
from ..structures import Instances, boxes as box_ops
from ..utils import Registry
from .anchors import build_anchor_generator
from .box_regression import Box2BoxTransform
from .layers import Conv2D
from .losses import sigmoid_cross_entropy, smooth_l1_loss
from .matcher import Matcher
from .sampling import subsample_labels

RPN_HEAD_REGISTRY = Registry("RPN_HEAD")
PROPOSAL_GENERATOR_REGISTRY = Registry("PROPOSAL_GENERATOR")


@RPN_HEAD_REGISTRY.register()
class StandardRPNHead(nn.Module):
    """3x3 shared conv + 1x1 objectness / 1x1 deltas (rpn.py:30-96)."""

    in_channels: int
    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        conv = Conv2D(
            self.in_channels, 3, activation="relu", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="conv",
        )
        obj = Conv2D(
            self.num_anchors, 1, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="objectness_logits",
        )
        deltas = Conv2D(
            self.num_anchors * 4, 1, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="anchor_deltas",
        )
        logits, box_deltas = [], []
        for x in features:
            t = conv(x, train=train)
            logits.append(obj(t, train=train))
            box_deltas.append(deltas(t, train=train))
        return logits, box_deltas


class RPN:
    """Pure driver around the head (no parameters of its own)."""

    def __init__(self, cfg, feature_shapes: Dict):
        r = cfg.MODEL.RPN
        self.in_features = list(r.IN_FEATURES)
        shapes = [feature_shapes[f] for f in self.in_features]
        self.strides = [s.stride for s in shapes]
        self.in_channels = shapes[0].channels
        self.anchor_generator = build_anchor_generator(cfg, shapes)
        self.box2box = Box2BoxTransform(r.BBOX_REG_WEIGHTS)
        self.matcher = Matcher(
            r.IOU_THRESHOLDS, r.IOU_LABELS, allow_low_quality_matches=True
        )
        self.batch_size_per_image = r.BATCH_SIZE_PER_IMAGE
        self.positive_fraction = r.POSITIVE_FRACTION
        self.smooth_l1_beta = r.SMOOTH_L1_BETA
        self.loss_weight = r.LOSS_WEIGHT
        self.boundary_thresh = r.BOUNDARY_THRESH
        self.nms_thresh = r.NMS_THRESH
        self.min_size = cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE
        self.pre_nms_topk = {
            True: r.PRE_NMS_TOPK_TRAIN,
            False: r.PRE_NMS_TOPK_TEST,
        }
        self.post_nms_topk = {
            True: r.POST_NMS_TOPK_TRAIN,
            False: r.POST_NMS_TOPK_TEST,
        }
        self.head_name = r.HEAD_NAME

    def head_module(self, dtype=jnp.float32) -> nn.Module:
        a = self.anchor_generator.num_anchors_per_location
        assert len(set(a)) == 1, "RPN requires equal anchors per level"
        # MODEL.RPN.HEAD_NAME registry dispatch (reference rpn.py:22-27).
        head_cls = RPN_HEAD_REGISTRY.get(self.head_name)
        return head_cls(
            in_channels=self.in_channels,
            num_anchors=a[0],
            dtype=dtype,
            name="rpn_head",
        )

    # -- losses ----------------------------------------------------------------
    def losses(
        self,
        rng: jax.Array,
        logits: List[jnp.ndarray],
        deltas: List[jnp.ndarray],
        gt: Dict,
        image_sizes: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        anchors = jnp.concatenate(
            self.anchor_generator([(l.shape[1], l.shape[2]) for l in logits]), 0
        )  # [R, 4]
        b = logits[0].shape[0]
        flat_logits = jnp.concatenate(
            [l.reshape(b, -1) for l in logits], axis=1
        )  # [B, R]
        flat_deltas = jnp.concatenate(
            [d.reshape(b, -1, 4) for d in deltas], axis=1
        )  # [B, R, 4]

        gt_is_crowd = gt.get("gt_is_crowd")
        if gt_is_crowd is None:
            gt_is_crowd = jnp.zeros(gt["gt_boxes"].shape[:2], bool)

        def assign_one(key, gt_boxes, gt_valid, is_crowd, image_size):
            noncrowd = gt_valid & ~is_crowd
            crowd_valid = gt_valid & is_crowd

            def crowd_extra(gt, anchor_chunk):
                # Crowd ignore: anchors mostly inside a crowd region are
                # dropped from the loss (reference rpn_outputs.py crowd
                # handling). Folded into the matcher's chunk sweep so the
                # [G, R] IoA matrix is never materialized either.
                ioa = box_ops.pairwise_ioa(gt, anchor_chunk)
                return jnp.any(
                    ioa * crowd_valid[:, None].astype(ioa.dtype) > 0.5, axis=0
                )

            # Dense [G, R] assignment. The [B, G, R] f32 quality tensor is
            # ~4.4 GB at FPN train shapes, but its producing/consuming
            # fusions run at ~0.85 of the HBM roofline — both chunked
            # re-derivations (Matcher.match_chunked) measured WORSE
            # end-to-end (scan: 51.2 vs 52.5 img/s; unrolled slices:
            # compile blowup >20 min), so the materialized matrix stands.
            quality = box_ops.pairwise_iou(gt_boxes, anchors)  # [G, R]
            matched_idx, labels = self.matcher(quality, noncrowd)
            in_crowd = crowd_extra(gt_boxes, anchors)
            labels = jnp.where(in_crowd, jnp.int8(-1), labels)
            if self.boundary_thresh >= 0:
                inside = box_ops.inside_image(
                    anchors, image_size, self.boundary_thresh
                )
                labels = jnp.where(inside, labels, jnp.int8(-1))
            idx, is_pos, valid = subsample_labels(
                key,
                labels.astype(jnp.int32),
                self.batch_size_per_image,
                self.positive_fraction,
            )
            matched_boxes = jnp.take(gt_boxes, jnp.take(matched_idx, idx), axis=0)
            return idx, is_pos, valid, matched_boxes

        keys = jax.random.split(rng, b)
        idx, is_pos, valid, matched_boxes = jax.vmap(assign_one)(
            keys, gt["gt_boxes"], gt["gt_valid"], gt_is_crowd, image_sizes
        )

        # Gather FIRST, cast the [B, S]-sized slices after — the head's
        # full maps stay in their native (bf16) dtype so no f32 copies of
        # whole feature-map-sized tensors are ever materialized.
        sel_logits = jnp.take_along_axis(flat_logits, idx, axis=1).astype(
            jnp.float32
        )
        sel_deltas = jnp.take_along_axis(
            flat_deltas, idx[..., None], axis=1
        ).astype(jnp.float32)
        sel_anchors = jnp.take(anchors, idx, axis=0)  # [B, S, 4]

        objectness = sigmoid_cross_entropy(
            sel_logits, is_pos.astype(sel_logits.dtype)
        )
        loss_cls = jnp.sum(objectness * valid)

        gt_deltas = self.box2box.get_deltas(sel_anchors, matched_boxes)
        reg = smooth_l1_loss(sel_deltas, gt_deltas, self.smooth_l1_beta).sum(-1)
        loss_reg = jnp.sum(reg * (is_pos & valid))

        normalizer = float(self.batch_size_per_image * b)
        return {
            "loss_rpn_cls": loss_cls / normalizer * self.loss_weight,
            "loss_rpn_loc": loss_reg / normalizer * self.loss_weight,
        }

    # -- proposal selection -----------------------------------------------------
    def proposals(
        self,
        logits: List[jnp.ndarray],
        deltas: List[jnp.ndarray],
        image_sizes: jnp.ndarray,
        training: bool,
    ) -> Instances:
        """find_top_rpn_proposals (rpn_outputs.py:29-132) with fixed shapes:
        per level topk -> decode -> clip -> min-size mask -> NMS; then global
        topk to post_nms_topk. Returns batched Instances with proposal_boxes,
        objectness_logits, is_valid."""
        level_anchors = self.anchor_generator(
            [(l.shape[1], l.shape[2]) for l in logits]
        )
        pre_k = self.pre_nms_topk[training]
        post_k = self.post_nms_topk[training]

        def per_image(per_level_logits, per_level_deltas, image_size):
            cand_boxes, cand_scores, cand_valid = [], [], []
            for logit, delta, anchors in zip(
                per_level_logits, per_level_deltas, level_anchors
            ):
                k = min(pre_k, logit.size)
                # top-k in the head's native dtype (bf16 upcast is monotone,
                # so the selection is identical to f32); cast only the
                # gathered k rows. Gathering 4-channel rows from the
                # [H*W*A, 4] view avoids reshaping the full map: XLA folds
                # the reshape into the gather when no cast sits in between.
                top_scores, top_idx = spatial_top_k(logit, k)
                top_scores = top_scores.astype(jnp.float32)
                sel_anchors = jnp.take(anchors, top_idx, axis=0)
                sel_deltas = jnp.take(
                    delta.reshape(-1, 4), top_idx, axis=0
                ).astype(jnp.float32)
                boxes = self.box2box.apply_deltas(sel_deltas, sel_anchors)
                boxes = box_ops.clip(boxes, image_size)
                valid = box_ops.nonempty(boxes, float(self.min_size))
                nb, ns, _, nv = nms_fixed(
                    boxes, top_scores, self.nms_thresh,
                    min(post_k, k), valid=valid,
                    presorted=True,  # spatial_top_k output is descending
                )
                cand_boxes.append(nb)
                cand_scores.append(ns)
                cand_valid.append(nv)
            boxes = jnp.concatenate(cand_boxes, 0)
            scores = jnp.concatenate(cand_scores, 0)
            valid = jnp.concatenate(cand_valid, 0)
            # Cross-level topk to the fixed proposal budget.
            k = min(post_k, scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(
                jnp.where(valid, scores, -1e10), k
            )
            top_boxes = jnp.take(boxes, top_idx, axis=0)
            top_valid = top_scores > -1e9
            return Instances(
                proposal_boxes=jnp.where(top_valid[:, None], top_boxes, 0.0),
                objectness_logits=top_scores,
                is_valid=top_valid,
            )

        return jax.vmap(per_image, in_axes=(0, 0, 0))(
            [l for l in logits], [d for d in deltas], image_sizes
        )


def add_ground_truth_to_proposals(proposals: Instances, gt: Dict) -> Instances:
    """Append GT boxes as high-confidence proposals during training
    (reference proposal_utils.py:7-60); keeps fixed shapes by concatenation."""
    gt_boxes = gt["gt_boxes"]  # [B, G, 4]
    gt_valid = gt["gt_valid"]
    gt_is_crowd = gt.get("gt_is_crowd")
    if gt_is_crowd is not None:
        gt_valid = gt_valid & ~gt_is_crowd
    # logit ~ +10 mimics the reference's math.log((1-1e-10)/1e-10) intent.
    gt_logits = jnp.where(gt_valid, 23.0, -1e10)
    return Instances(
        proposal_boxes=jnp.concatenate([proposals.proposal_boxes, gt_boxes], 1),
        objectness_logits=jnp.concatenate(
            [proposals.objectness_logits, gt_logits], 1
        ),
        is_valid=jnp.concatenate([proposals.is_valid, gt_valid], 1),
    )
