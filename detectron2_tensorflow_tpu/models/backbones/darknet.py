"""CSP-DarkNet53 backbone (YOLOv4 trunk).

Parity target: /root/reference/lib/modeling/backbone/darknet.py:41-249.
Structure per stage: stride-2 3x3 downsample (preconv), CSP split (shortcut
1x1 / main 1x1), residual blocks (1x1 bottleneck + 3x3), postconv 1x1,
concat, final 1x1. Stage res1 is "wide" (no channel narrowing), res2..res5
narrow. Default activation mish, norm BN.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import ShapeSpec
from ..layers import Conv2D

NUM_BLOCKS = (1, 2, 8, 8, 4)


class DarkNetResidualBlock(nn.Module):
    channels: int
    bottleneck_channels: int
    norm: str = "BN"
    activation: str = "mish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = Conv2D(
            self.bottleneck_channels, 1, norm=self.norm,
            activation=self.activation, dtype=self.dtype, name="conv1",
        )(x, train=train)
        out = Conv2D(
            self.channels, 3, norm=self.norm, activation=self.activation,
            dtype=self.dtype, name="conv2",
        )(out, train=train)
        return x + out


class DarkNetStage(nn.Module):
    out_channels: int
    num_blocks: int
    all_narrow: bool = True
    norm: str = "BN"
    activation: str = "mish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda c, k, s, name: Conv2D(  # noqa: E731
            c, k, strides=s, norm=self.norm, activation=self.activation,
            dtype=self.dtype, name=name,
        )
        x = conv(self.out_channels, 3, 2, "preconv")(x, train=train)
        block_channels = self.out_channels // 2 if self.all_narrow else self.out_channels
        bottleneck = block_channels if self.all_narrow else block_channels // 2
        shortcut = conv(block_channels, 1, 1, "shortcut")(x, train=train)
        main = conv(block_channels, 1, 1, "main")(x, train=train)
        for i in range(self.num_blocks):
            main = DarkNetResidualBlock(
                channels=block_channels, bottleneck_channels=bottleneck,
                norm=self.norm, activation=self.activation, dtype=self.dtype,
                name=f"block_{i + 1}",
            )(main, train=train)
        main = conv(block_channels, 1, 1, "postconv")(main, train=train)
        route = jnp.concatenate([main, shortcut], axis=-1)
        return conv(self.out_channels, 1, 1, "final")(route, train=train)


class DarkNet53(nn.Module):
    stem_out_channels: int = 32
    res2_out_channels: int = 64
    out_features: Sequence[str] = ("res3", "res4", "res5")
    norm: str = "BN"
    activation: str = "mish"
    freeze_at: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2D(
            self.stem_out_channels, 3, norm=self.norm,
            activation=self.activation, dtype=self.dtype, name="stem",
        )(x, train=train)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        outputs: Dict[str, jnp.ndarray] = {}
        out_channels = self.res2_out_channels
        max_stage = max(int(f[3:]) for f in self.out_features)
        for stage_idx in range(1, max_stage + 1):
            name = f"res{stage_idx}"
            x = DarkNetStage(
                out_channels=out_channels,
                num_blocks=NUM_BLOCKS[stage_idx - 1],
                all_narrow=stage_idx != 1,
                norm=self.norm, activation=self.activation, dtype=self.dtype,
                name=name,
            )(x, train=train)
            if self.freeze_at >= stage_idx + 1:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x
            out_channels *= 2
        return outputs


def build_darknet_backbone(cfg, dtype=jnp.float32) -> Tuple[nn.Module, Dict[str, ShapeSpec]]:
    r = cfg.MODEL.RESNETS  # darknet reuses the RESNETS config block (reference)
    module = DarkNet53(
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        out_features=tuple(r.OUT_FEATURES),
        norm=r.NORM,
        activation=r.ACTIVATION,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        dtype=dtype,
        name="backbone",
    )
    shapes = {}
    out_channels = r.RES2_OUT_CHANNELS
    for stage_idx in range(1, 6):
        shapes[f"res{stage_idx}"] = ShapeSpec(
            channels=out_channels, stride=2**stage_idx
        )
        out_channels *= 2
    return module, {f: shapes[f] for f in r.OUT_FEATURES}
