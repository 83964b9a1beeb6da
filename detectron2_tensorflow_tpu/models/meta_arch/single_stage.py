"""SingleStageDetector: backbone -> neck -> dense head (RetinaNet/SOLOv2/YOLOv4).

Parity target: /root/reference/lib/modeling/meta_arch/single_stage_detector.py
:16-83. The flax module computes raw head outputs; GT assignment, losses and
NMS live in pure drivers outside the parameter graph.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import build_resnet_backbone
from ..necks.fpn import build_neck
from ..single_stage.retinanet import RetinaNet
from ..single_stage.solov2 import SOLOv2
from .build import META_ARCH_REGISTRY
from .common import DetectorModel, StatsTape, preprocess_images


class _SingleStageTrunk(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, images: jnp.ndarray, train: bool = False):
        features = self.backbone(images, train=train)
        features = self.neck(features, train=train)
        return self.head(features, train=train)


def _build_backbone_neck(cfg):
    dtype = jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32
    backbone_name = cfg.MODEL.BACKBONE.NAME
    if backbone_name == "ResNet":
        backbone, bb_shapes = build_resnet_backbone(cfg, dtype=dtype)
    elif backbone_name == "DarkNet53":
        from ..backbones.darknet import build_darknet_backbone

        backbone, bb_shapes = build_darknet_backbone(cfg, dtype=dtype)
    else:
        raise NotImplementedError(f"backbone {backbone_name}")
    neck, neck_shapes = build_neck(cfg, bb_shapes, dtype=dtype)
    return backbone, neck, neck_shapes, dtype


@META_ARCH_REGISTRY.register(name="SingleStageDetector")
def build_single_stage_detector(cfg) -> DetectorModel:
    backbone, neck, neck_shapes, dtype = _build_backbone_neck(cfg)

    head_name = cfg.MODEL.SINGLE_STAGE_HEAD.NAME
    pixel_mean = list(cfg.MODEL.PIXEL_MEAN)
    pixel_std = list(cfg.MODEL.PIXEL_STD)
    input_format = cfg.MODEL.INPUT_FORMAT

    def prep(batch):
        return preprocess_images(
            batch["image"], pixel_mean, pixel_std, input_format, dtype
        )

    if head_name == "RetinaNetHead":
        driver = RetinaNet(cfg, neck_shapes)
        head = driver.head_module(cfg, dtype)
        module = _SingleStageTrunk(backbone=backbone, neck=neck, head=head)

        def init_fn(rng, batch):
            return module.init(rng, prep(batch), train=False)

        def loss_fn(variables, batch, rng, state):
            tape = StatsTape(variables)
            logits, deltas = tape.apply(module, variables, prep(batch), train=True)
            logits = [l.astype(jnp.float32) for l in logits]
            deltas = [d.astype(jnp.float32) for d in deltas]
            losses, new_norm = driver.losses(
                logits, deltas, batch, state["loss_normalizer"]
            )
            new_state = {"loss_normalizer": new_norm, **tape.state()}
            return sum(losses.values()), (losses, new_state)

        def predict_fn(variables, batch):
            logits, deltas = module.apply(variables, prep(batch), train=False)
            logits = [l.astype(jnp.float32) for l in logits]
            deltas = [d.astype(jnp.float32) for d in deltas]
            return driver.inference(logits, deltas, batch["image_size"])

        return DetectorModel(
            module, init_fn, loss_fn, predict_fn,
            initial_state={"loss_normalizer": jnp.asarray(100.0)},
        )

    if head_name == "SOLOv2Head":
        driver = SOLOv2(cfg, neck_shapes)
        head = driver.head_module(cfg, dtype)
        module = _SingleStageTrunk(backbone=backbone, neck=neck, head=head)

        def init_fn(rng, batch):
            return module.init(rng, prep(batch), train=False)

        def loss_fn(variables, batch, rng, state):
            tape = StatsTape(variables)
            cate, kernels, mask_feat = tape.apply(
                module, variables, prep(batch), train=True
            )
            input_size = batch["image"].shape[1:3]
            losses = driver.losses(rng, cate, kernels, mask_feat, batch, input_size)
            return sum(losses.values()), (losses, {**state, **tape.state()})

        def predict_fn(variables, batch):
            cate, kernels, mask_feat = module.apply(
                variables, prep(batch), train=False
            )
            return driver.inference(cate, kernels, mask_feat, batch["image_size"])

        return DetectorModel(module, init_fn, loss_fn, predict_fn)

    if head_name == "YOLOV4Head":
        from ..single_stage.yolov4 import YOLOv4

        driver = YOLOv4(cfg, neck_shapes)
        head = driver.head_module(cfg, dtype)
        module = _SingleStageTrunk(backbone=backbone, neck=neck, head=head)

        def init_fn(rng, batch):
            return module.init(rng, prep(batch), train=False)

        def loss_fn(variables, batch, rng, state):
            tape = StatsTape(variables)
            preds = tape.apply(module, variables, prep(batch), train=True)
            losses = driver.losses(preds, batch)
            return sum(losses.values()), (losses, {**state, **tape.state()})

        def predict_fn(variables, batch):
            preds = module.apply(variables, prep(batch), train=False)
            return driver.inference(preds, batch["image_size"])

        return DetectorModel(module, init_fn, loss_fn, predict_fn)

    raise NotImplementedError(f"single-stage head {head_name}")
