"""YOLOv4 PANet neck: SPP + top-down + bottom-up path aggregation.

Parity target: /root/reference/lib/modeling/necks/yolov4.py:22-293 (SPP at
:130, TopDown at :186, BottomUp at :244). Outputs p3/p4/p5 with channel
widths (C, 2C, 4C) where C = NECK.OUT_CHANNELS (128 in Base-YOLO).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...utils import ShapeSpec
from ..layers import Conv2D
from .fpn import NECK_REGISTRY, upsample_nearest_2x


def _max_pool_same(x, k):
    p = k // 2
    return nn.max_pool(
        x, window_shape=(k, k), strides=(1, 1), padding=[(p, p), (p, p)]
    )


@NECK_REGISTRY.register()
class YOLOV4(nn.Module):
    in_features: Sequence[str] = ("res3", "res4", "res5")
    out_channels: int = 128  # p3 width; p4 = 2x, p5 = 4x
    norm: str = "BN"
    activation: str = "leaky_relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        def conv(c, k, name, s=1):
            return Conv2D(
                c, k, strides=s, norm=self.norm, activation=self.activation,
                dtype=self.dtype, name=name,
            )

        c = self.out_channels
        c3, c4, c5 = features[self.in_features[0]], features[self.in_features[1]], features[self.in_features[2]]

        # SPP block on the coarsest level.
        x = conv(4 * c, 1, "spp_conv1")(c5, train=train)
        x = conv(8 * c, 3, "spp_conv2")(x, train=train)
        x = conv(4 * c, 1, "spp_conv3")(x, train=train)
        spp = jnp.concatenate(
            [_max_pool_same(x, 13), _max_pool_same(x, 9), _max_pool_same(x, 5), x],
            axis=-1,
        )
        x = conv(4 * c, 1, "spp_conv4")(spp, train=train)
        x = conv(8 * c, 3, "spp_conv5")(x, train=train)
        p5_td = conv(4 * c, 1, "spp_conv6")(x, train=train)

        # Top-down to p4.
        up = upsample_nearest_2x(conv(2 * c, 1, "td4_route")(p5_td, train=train))
        lat4 = conv(2 * c, 1, "td4_lateral")(c4, train=train)
        x = jnp.concatenate([lat4, up], axis=-1)
        for i in range(5):
            k = 3 if i % 2 else 1
            x = conv(2 * c * (2 if k == 3 else 1), k, f"td4_conv{i + 1}")(x, train=train)
        p4_td = x  # [.., 2c]

        # Top-down to p3.
        up = upsample_nearest_2x(conv(c, 1, "td3_route")(p4_td, train=train))
        lat3 = conv(c, 1, "td3_lateral")(c3, train=train)
        x = jnp.concatenate([lat3, up], axis=-1)
        for i in range(5):
            k = 3 if i % 2 else 1
            x = conv(c * (2 if k == 3 else 1), k, f"td3_conv{i + 1}")(x, train=train)
        p3 = x  # [.., c]

        # Bottom-up to p4.
        down = conv(2 * c, 3, "bu4_down", s=2)(p3, train=train)
        x = jnp.concatenate([down, p4_td], axis=-1)
        for i in range(5):
            k = 3 if i % 2 else 1
            x = conv(2 * c * (2 if k == 3 else 1), k, f"bu4_conv{i + 1}")(x, train=train)
        p4 = x

        # Bottom-up to p5.
        down = conv(4 * c, 3, "bu5_down", s=2)(p4, train=train)
        x = jnp.concatenate([down, p5_td], axis=-1)
        for i in range(5):
            k = 3 if i % 2 else 1
            x = conv(4 * c * (2 if k == 3 else 1), k, f"bu5_conv{i + 1}")(x, train=train)
        p5 = x

        return {"p3": p3, "p4": p4, "p5": p5}

    @classmethod
    def from_config(cls, cfg, input_shapes, dtype=jnp.float32):
        in_features = list(cfg.MODEL.NECK.IN_FEATURES)
        c = cfg.MODEL.NECK.OUT_CHANNELS
        module = cls(
            in_features=tuple(in_features),
            out_channels=c,
            norm=cfg.MODEL.NECK.NORM,
            activation=cfg.MODEL.NECK.ACTIVATION,
            dtype=dtype,
            name="neck",
        )
        strides = [input_shapes[f].stride for f in in_features]
        out_shapes = {
            "p3": ShapeSpec(channels=c, stride=strides[0]),
            "p4": ShapeSpec(channels=2 * c, stride=strides[1]),
            "p5": ShapeSpec(channels=4 * c, stride=strides[2]),
        }
        return module, out_shapes
