"""FPN neck (lateral + top-down pyramid) and top blocks.

Capability parity with the reference neck (/root/reference/lib/modeling/
necks/fpn.py:30-217): sum/avg fusion, optional norm/activation on the
lateral/output convs, LastLevelMaxPool (p6) or LastLevelP6P7 (RetinaNet).
Upsampling is nearest-2x via reshape-broadcast (a layout-friendly XLA op,
no gather).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...utils import Registry, ShapeSpec
from ..layers import Conv2D, get_activation, max_pool

NECK_REGISTRY = Registry("NECK")


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


@NECK_REGISTRY.register()
class FPN(nn.Module):
    """in_features (fine->coarse, e.g. res2..res5) -> {p2..p5(+p6,p7)}."""

    in_features: Sequence[str]
    in_channels: Sequence[int]
    stages: Sequence[int]  # pyramid stage number per in_feature (res3 -> 3)
    out_channels: int = 256
    norm: str = ""
    activation: str = ""
    fuse_type: str = "sum"
    top_block: str = "MAXPOOL"  # "" | MAXPOOL | P6P7
    top_block_in_feature: str = ""  # "" => coarsest FPN output
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        assert self.fuse_type in ("sum", "avg")
        names = list(self.in_features)
        # Lateral 1x1s, coarse to fine; output 3x3s per level. Param names
        # carry the stage number (fpn_lateral3, ...) matching D2 checkpoints.
        results: Dict[str, jnp.ndarray] = {}
        prev = None
        for idx in reversed(range(len(names))):
            stage = self.stages[idx]
            lateral = Conv2D(
                self.out_channels, 1, norm=self.norm, dtype=self.dtype,
                name=f"fpn_lateral{stage}",
            )(features[names[idx]], train=train)
            if prev is not None:
                td = upsample_nearest_2x(prev)
                lateral = lateral + td
                if self.fuse_type == "avg":
                    lateral = lateral / 2.0
            prev = lateral
            out = Conv2D(
                self.out_channels, 3, norm=self.norm,
                activation=self.activation, dtype=self.dtype,
                name=f"fpn_output{stage}",
            )(lateral, train=train)
            results[f"p{stage}"] = out

        last_p = self.stages[-1]  # e.g. res2..res5 -> p5
        if self.top_block == "MAXPOOL":
            results[f"p{last_p + 1}"] = max_pool(results[f"p{last_p}"], 1, 2)
        elif self.top_block == "P6P7":
            src = (
                results[f"p{last_p}"]
                if self.top_block_in_feature in ("", f"p{last_p}")
                else features[self.top_block_in_feature]
            )
            p6 = Conv2D(self.out_channels, 3, strides=2, dtype=self.dtype, name="top_block_p6")(
                src, train=train
            )
            p7 = Conv2D(
                self.out_channels, 3, strides=2, dtype=self.dtype, name="top_block_p7"
            )(nn.relu(p6), train=train)
            results[f"p{last_p + 1}"] = p6
            results[f"p{last_p + 2}"] = p7
        return results


@NECK_REGISTRY.register()
class DummyNeck(nn.Module):
    """Identity pass-through for neck-less (C4/C5) models; reference
    necks/build.py:18-71."""

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        return features


def build_neck(
    cfg, input_shapes: Dict[str, ShapeSpec], dtype=jnp.float32
) -> Tuple[nn.Module, Dict[str, ShapeSpec]]:
    """Factory returning (neck module, output ShapeSpecs)."""
    name = cfg.MODEL.NECK.NAME
    if name == "":
        return DummyNeck(name="neck"), dict(input_shapes)
    if name == "FPN":
        in_features = list(cfg.MODEL.NECK.IN_FEATURES)
        strides = [input_shapes[f].stride for f in in_features]
        # Pyramid stage = log2(stride): res3 (stride 8) feeds p3, etc.
        stages = [int(math.log2(s)) for s in strides]
        module = FPN(
            in_features=tuple(in_features),
            in_channels=tuple(input_shapes[f].channels for f in in_features),
            stages=tuple(stages),
            out_channels=cfg.MODEL.NECK.OUT_CHANNELS,
            norm=cfg.MODEL.NECK.NORM,
            activation=cfg.MODEL.NECK.ACTIVATION,
            fuse_type=cfg.MODEL.NECK.FUSE_TYPE,
            top_block=cfg.MODEL.NECK.TOP_BLOCK_TYPE,
            dtype=dtype,
            name="neck",
        )
        out_shapes = {}
        for idx, f in enumerate(in_features):
            out_shapes[f"p{stages[idx]}"] = ShapeSpec(
                channels=cfg.MODEL.NECK.OUT_CHANNELS, stride=strides[idx]
            )
        last_p = stages[-1]
        last_stride = strides[-1]
        if cfg.MODEL.NECK.TOP_BLOCK_TYPE == "MAXPOOL":
            out_shapes[f"p{last_p + 1}"] = ShapeSpec(
                channels=cfg.MODEL.NECK.OUT_CHANNELS, stride=last_stride * 2
            )
        elif cfg.MODEL.NECK.TOP_BLOCK_TYPE == "P6P7":
            out_shapes[f"p{last_p + 1}"] = ShapeSpec(
                channels=cfg.MODEL.NECK.OUT_CHANNELS, stride=last_stride * 2
            )
            out_shapes[f"p{last_p + 2}"] = ShapeSpec(
                channels=cfg.MODEL.NECK.OUT_CHANNELS, stride=last_stride * 4
            )
        return module, out_shapes
    # Other necks (e.g. YOLOV4 PANet) register themselves here.
    from . import yolov4 as _yolov4  # noqa: F401 — registration side effect

    module_cls = NECK_REGISTRY.get(name)
    return module_cls.from_config(cfg, input_shapes, dtype=dtype)  # type: ignore
