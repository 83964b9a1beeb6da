"""ResNet / ResNeXt backbone (D2-compatible structure, TPU-native execution).

Mirrors the capability of the reference backbone (/root/reference/lib/
modeling/backbone/resnet.py:132-253, blocks.py:77-244): stem + res2..res5,
bottleneck or basic blocks, stride_in_1x1 (MSRA) vs torchvision placement,
grouped 3x3 for ResNeXt, res5 dilation for DC5 models, stage freezing, and
configurable out_features.

TPU-first choices:
  * NHWC + HWIO everywhere; convs are single lax.conv_general_dilated calls
    (groups via feature_group_count — no loop-split);
  * freezing = ``stop_gradient`` on frozen-stage outputs (grads vanish; the
    solver additionally masks those params out of the update);
  * module/param names (stem.conv1, res2.0.conv2, shortcut) line up 1:1 with
    Detectron2 checkpoints so conversion is pure renaming.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import Registry, ShapeSpec
from ..deform_conv import DeformConv2D
from ..layers import Conv2D, get_activation, get_norm, max_pool

BACKBONE_REGISTRY = Registry("BACKBONE")

# depth -> per-stage block counts (res2, res3, res4, res5)
BLOCKS_PER_STAGE = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class _KernelHolder(nn.Module):
    """Declares ``kernel`` (+``bias``) — named "conv", it reproduces
    Conv2D's ``conv1/conv/kernel`` parameter path so weight converters are
    untouched."""

    shape: tuple
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            self.shape,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],))
            if self.use_bias
            else None
        )
        return kernel, bias


class _S2DStemConv(nn.Module):
    """Space-to-depth rewrite of the 7x7/2 stem conv (see Stem docstring).
    Parameter tree is identical to ``Conv2D(7, 2, norm=...)``."""

    features: int
    norm: str
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        kernel, bias = _KernelHolder(
            (7, 7, c, self.features), use_bias=self.norm == "", name="conv"
        )()
        hh, ww = h // 2, w // 2
        x2d = x.reshape(b, hh, 2, ww, 2, c)
        x2d = x2d.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, 4 * c)
        wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8,8,C,O]
        w2d = wp.reshape(4, 2, 4, 2, c, self.features)
        w2d = w2d.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        x = jax.lax.conv_general_dilated(
            x2d.astype(self.dtype),
            w2d.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            x = x + bias.astype(x.dtype)
        norm = get_norm(self.norm, self.features, self.dtype)
        if norm is not None:
            x = norm(x, train=train)
        return get_activation("relu")(x)


class Stem(nn.Module):
    """7x7/2 conv + norm + relu + 3x3/2 maxpool (stride 4 total).

    TPU fast path (``space_to_depth``): a 7x7 stride-2 conv on a 3-channel
    image starves the MXU (3 input channels against a 128-wide systolic
    array) and is HBM-padding-heavy. Rewriting the input as 2x2
    space-to-depth blocks ([H, W, 3] -> [H/2, W/2, 12]) turns it into a
    4x4 STRIDE-1 conv over 12 channels — the exact same arithmetic
    (the 7x7 kernel zero-padded to 8x8 and regrouped).
    The parameter stays [7, 7, 3, 64] under the canonical name so weight
    converters are untouched; the regrouping folds into the graph.

    Derivation: y[i] = sum_k w[k] x[2i+k-3]; with k' = k+1 = 2m+r the sum
    becomes sum_{m,r} w'[m, r] x2d[i+m-2, r] — a 4-tap stride-1 conv with
    explicit (2, 1) padding, where w' is the kernel padded by one zero row/
    column at the top-left and reshaped [8->4x2].
    """

    out_channels: int = 64
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32
    # Measured SLOWER on TPU v5e (the input reshuffle outweighs the MXU win
    # — XLA's native 3-channel conv path is already good there); kept as an
    # opt-in for TPU generations where the 7x7/2 stem is the bottleneck.
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        if self.space_to_depth and h % 2 == 0 and w % 2 == 0:
            x = _S2DStemConv(
                self.out_channels, self.norm, self.dtype, name="conv1"
            )(x, train=train)
        else:
            x = Conv2D(
                self.out_channels,
                kernel_size=7,
                strides=2,
                norm=self.norm,
                activation="relu",
                dtype=self.dtype,
                name="conv1",
            )(x, train=train)
        return max_pool(x, 3, 2)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 (grouped/dilated) -> 1x1 with projection shortcut."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    norm: str = "FrozenBN"
    has_shortcut: bool = False
    deform: bool = False
    deform_modulated: bool = False
    deform_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = Conv2D(
            self.bottleneck_channels, 1, strides=s1, norm=self.norm,
            activation="relu", dtype=self.dtype, name="conv1",
        )(x, train=train)
        if self.deform:
            out = DeformConv2D(
                self.bottleneck_channels, 3, strides=s3,
                dilation=self.dilation, deform_groups=self.deform_groups,
                modulated=self.deform_modulated, dtype=self.dtype, name="conv2",
            )(out, train=train)
            norm = get_norm(
                self.norm, self.bottleneck_channels, self.dtype, name="conv2_norm"
            )
            if norm is not None:
                out = norm(out, train=train)
            out = nn.relu(out)
        else:
            out = Conv2D(
                self.bottleneck_channels, 3, strides=s3, groups=self.num_groups,
                dilation=self.dilation, norm=self.norm, activation="relu",
                dtype=self.dtype, name="conv2",
            )(out, train=train)
        if self.has_shortcut:
            sc = Conv2D(
                self.out_channels, 1, strides=self.stride, norm=self.norm,
                dtype=self.dtype, name="shortcut",
            )(x, train=train)
        else:
            sc = x
        # conv3 + BN + residual-add + relu ride one Pallas kernel on TPU
        # (the unfused graph spills conv3's output to HBM before a separate
        # add+relu kernel — ~11% of Mask R-CNN inference at batch 16).
        return Conv2D(
            self.out_channels, 1, norm=self.norm, dtype=self.dtype, name="conv3",
        )(out, train=train, residual=sc)


class BasicBlock(nn.Module):
    """Two 3x3 convs (ResNet-18/34)."""

    out_channels: int
    stride: int = 1
    norm: str = "FrozenBN"
    has_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = Conv2D(
            self.out_channels, 3, strides=self.stride, norm=self.norm,
            activation="relu", dtype=self.dtype, name="conv1",
        )(x, train=train)
        if self.has_shortcut:
            sc = Conv2D(
                self.out_channels, 1, strides=self.stride, norm=self.norm,
                dtype=self.dtype, name="shortcut",
            )(x, train=train)
        else:
            sc = x
        return Conv2D(
            self.out_channels, 3, norm=self.norm, dtype=self.dtype, name="conv2",
        )(out, train=train, residual=sc)


class ResNetStage(nn.Module):
    """A res{2..5} stage: first block strides/projects, the rest are identity."""

    num_blocks: int
    out_channels: int
    bottleneck_channels: int
    first_stride: int = 1
    num_groups: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    norm: str = "FrozenBN"
    use_bottleneck: bool = True
    deform: bool = False
    deform_modulated: bool = False
    deform_groups: int = 1
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Per-block rematerialization (jax.checkpoint): the backward pass
        # recomputes the three conv activations of each block from its input
        # instead of holding them in HBM — trades ~33% extra stage FLOPs for
        # ~3x less activation memory, buying a larger train batch.
        Bottleneck = (
            nn.remat(BottleneckBlock, static_argnums=(2,))
            if self.remat
            else BottleneckBlock
        )
        Basic = (
            nn.remat(BasicBlock, static_argnums=(2,)) if self.remat else BasicBlock
        )
        for i in range(self.num_blocks):
            if self.use_bottleneck:
                x = Bottleneck(
                    out_channels=self.out_channels,
                    bottleneck_channels=self.bottleneck_channels,
                    stride=self.first_stride if i == 0 else 1,
                    num_groups=self.num_groups,
                    stride_in_1x1=self.stride_in_1x1,
                    dilation=self.dilation,
                    norm=self.norm,
                    has_shortcut=(i == 0),
                    deform=self.deform,
                    deform_modulated=self.deform_modulated,
                    deform_groups=self.deform_groups,
                    dtype=self.dtype,
                    name=str(i),
                )(x, train)  # positional: static_argnums=(2,) under remat
            else:
                x = Basic(
                    out_channels=self.out_channels,
                    stride=self.first_stride if i == 0 else 1,
                    norm=self.norm,
                    has_shortcut=(i == 0),
                    dtype=self.dtype,
                    name=str(i),
                )(x, train)
        return x


@BACKBONE_REGISTRY.register()
class ResNet(nn.Module):
    """Full trunk returning a {feature_name: NHWC array} dict."""

    depth: int = 50
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    stem_space_to_depth: bool = False
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res4",)
    freeze_at: int = 2
    num_stages: int = 4  # trimmed for C4 trunks that stop at res4
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    deform_groups: int = 1
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.depth in BLOCKS_PER_STAGE, f"unsupported depth {self.depth}"
        use_bottleneck = self.depth >= 50
        blocks = BLOCKS_PER_STAGE[self.depth]

        x = Stem(
            self.stem_out_channels, self.norm, dtype=self.dtype,
            space_to_depth=self.stem_space_to_depth, name="stem",
        )(x, train=train)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        outputs: Dict[str, jnp.ndarray] = {}
        if "stem" in self.out_features:
            outputs["stem"] = x

        out_channels = self.res2_out_channels
        bottleneck_channels = self.num_groups * self.width_per_group
        for idx in range(self.num_stages):
            name = f"res{idx + 2}"
            dilation = self.res5_dilation if name == "res5" else 1
            first_stride = 1 if idx == 0 or dilation > 1 else 2
            x = ResNetStage(
                num_blocks=blocks[idx],
                out_channels=out_channels if use_bottleneck else out_channels // 4,
                bottleneck_channels=bottleneck_channels,
                first_stride=first_stride,
                num_groups=self.num_groups,
                stride_in_1x1=self.stride_in_1x1,
                dilation=dilation,
                norm=self.norm,
                use_bottleneck=use_bottleneck,
                deform=self.deform_on_per_stage[idx],
                deform_modulated=self.deform_modulated,
                deform_groups=self.deform_groups,
                # Frozen stages do no backward work — remat would only
                # slow their forward down.
                remat=self.remat and idx + 2 > self.freeze_at,
                dtype=self.dtype,
                name=name,
            )(x, train=train)
            if self.freeze_at >= idx + 2:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x
            out_channels *= 2
            bottleneck_channels *= 2
        return outputs


def resnet_output_shapes(cfg) -> Dict[str, ShapeSpec]:
    """Static ShapeSpec dict for the configured out_features."""
    use_bottleneck = cfg.MODEL.RESNETS.DEPTH >= 50
    res2_out = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
    shapes = {"stem": ShapeSpec(channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS, stride=4)}
    for idx in range(4):
        name = f"res{idx + 2}"
        channels = res2_out * (2**idx)
        if not use_bottleneck:
            channels //= 4
        stride = 4 * (2**idx)
        if name == "res5" and cfg.MODEL.RESNETS.RES5_DILATION > 1:
            stride //= 2
        shapes[name] = ShapeSpec(channels=channels, stride=stride)
    return {k: v for k, v in shapes.items()}


def build_resnet_backbone(cfg, dtype=jnp.float32) -> Tuple[nn.Module, Dict[str, ShapeSpec]]:
    """Factory from config; returns (module, out_feature ShapeSpecs).

    Note: the reference defines MODEL.RESNETS.ACTIVATION but its ResNet
    hardcodes relu (resnet.py:30); we match that behavior.
    """
    r = cfg.MODEL.RESNETS
    out_features = list(r.OUT_FEATURES)
    # C4/C5 trunks don't need later stages built at all.
    max_stage = max(int(f[3:]) for f in out_features if f.startswith("res"))
    module = ResNet(
        depth=r.DEPTH,
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        stem_space_to_depth=r.STEM_SPACE_TO_DEPTH,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        stride_in_1x1=r.STRIDE_IN_1X1,
        res5_dilation=r.RES5_DILATION,
        norm=r.NORM,
        out_features=tuple(out_features),
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        num_stages=max_stage - 1,
        deform_on_per_stage=tuple(r.DEFORM_ON_PER_STAGE),
        deform_modulated=r.DEFORM_MODULATED,
        deform_groups=r.DEFORM_NUM_GROUPS,
        remat=r.REMAT,
        dtype=dtype,
        name="backbone",
    )
    all_shapes = resnet_output_shapes(cfg)
    return module, {f: all_shapes[f] for f in out_features}
