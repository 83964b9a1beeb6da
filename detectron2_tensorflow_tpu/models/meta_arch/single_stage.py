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
from .build import META_ARCH_REGISTRY
from .common import DetectorModel, preprocess_images


class _SingleStageTrunk(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, images: jnp.ndarray, train: bool = False):
        features = self.backbone(images, train=train)
        features = self.neck(features, train=train)
        return self.head(features, train=train)


@META_ARCH_REGISTRY.register(name="SingleStageDetector")
def build_single_stage_detector(cfg) -> DetectorModel:
    dtype = jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32
    backbone, bb_shapes = build_resnet_backbone(cfg, dtype=dtype)
    neck, neck_shapes = build_neck(cfg, bb_shapes, dtype=dtype)

    head_name = cfg.MODEL.SINGLE_STAGE_HEAD.NAME
    if head_name == "RetinaNetHead":
        driver = RetinaNet(cfg, neck_shapes)
    else:
        raise NotImplementedError(f"single-stage head {head_name}")
    head = driver.head_module(cfg, dtype)

    module = _SingleStageTrunk(backbone=backbone, neck=neck, head=head)
    pixel_mean = list(cfg.MODEL.PIXEL_MEAN)
    pixel_std = list(cfg.MODEL.PIXEL_STD)
    input_format = cfg.MODEL.INPUT_FORMAT

    def prep(batch):
        return preprocess_images(
            batch["image"], pixel_mean, pixel_std, input_format, dtype
        )

    def init_fn(rng, batch):
        return module.init(rng, prep(batch), train=False)

    def loss_fn(variables, batch, rng, state):
        logits, deltas = module.apply(variables, prep(batch), train=True)
        logits = [l.astype(jnp.float32) for l in logits]
        deltas = [d.astype(jnp.float32) for d in deltas]
        losses, new_norm = driver.losses(
            logits, deltas, batch, state["loss_normalizer"]
        )
        total = sum(losses.values())
        return total, (losses, {"loss_normalizer": new_norm})

    def predict_fn(variables, batch):
        logits, deltas = module.apply(variables, prep(batch), train=False)
        logits = [l.astype(jnp.float32) for l in logits]
        deltas = [d.astype(jnp.float32) for d in deltas]
        return driver.inference(logits, deltas, batch["image_size"])

    return DetectorModel(
        module,
        init_fn,
        loss_fn,
        predict_fn,
        initial_state={"loss_normalizer": jnp.asarray(100.0)},
    )
