"""Box and mask head modules (FastRCNNConvFCHead, MaskRCNNConvUpsampleHead).

Parity: /root/reference/lib/modeling/roi_heads/box_head.py:16-97 and
mask_head.py:17-183. Param names (fc1/fc2, mask_fcn{i}, deconv, predictor)
match Detectron2 checkpoints.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import Conv2D, ConvTranspose2D, get_norm


class _FlattenDense(nn.Module):
    """Dense over a flattened [N, S, S, C] input WITHOUT the flatten copy.

    ``x.reshape(N, -1) @ kernel`` materializes a sublane-retiling copy of
    the whole pooled tensor (S=7 pads to 8 in TPU (8,128) tiles; 802 MB and
    0.085 ms/img at the serving shape — round-4 roofline audit). This
    module contracts (h, w, c) directly with dot_general so XLA can feed
    the tiled tensor straight to the MXU. The kernel parameter keeps the
    canonical flattened ``[S*S*C, features]`` checkpoint shape (converters
    and D2 weight layouts untouched); its reshape to [S, S, C, features]
    is row-major, so the math is bit-identical to flatten-then-matmul.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if x.ndim == 2:  # already flat (e.g. relation box head re-entry)
            in_dim, view = x.shape[1], None
        else:
            in_dim, view = int(np_prod(x.shape[1:])), x.shape[1:]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (in_dim, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if view is None:
            y = x @ kernel
        else:
            y = jax.lax.dot_general(
                x,
                kernel.reshape(view + (self.features,)),
                dimension_numbers=(((1, 2, 3), (0, 1, 2)), ((), ())),
            )
        return y + bias.astype(self.dtype)


def np_prod(xs):
    out = 1
    for v in xs:
        out *= int(v)
    return out


class FastRCNNConvFCHead(nn.Module):
    """k convs + n FCs on pooled features -> [N, fc_dim]."""

    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    norm: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        for i in range(self.num_conv):
            x = Conv2D(
                self.conv_dim, 3, norm=self.norm, activation="relu",
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x, train=train)
        for i in range(self.num_fc):
            if x.ndim == 4:
                x = _FlattenDense(
                    self.fc_dim, dtype=self.dtype, name=f"fc{i + 1}"
                )(x)
            else:
                x = nn.Dense(
                    self.fc_dim, dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        1.0, "fan_in", "uniform"
                    ),
                    name=f"fc{i + 1}",
                )(x)
            x = nn.relu(x)
        return x


class KRCNNConvDeconvUpsampleHead(nn.Module):
    """Keypoint head: 8 convs + deconv 2x + bilinear 2x -> K heatmaps.

    The reference defines only config keys for this head (defaults.py:
    510-540, no implementation); this follows the upstream Detectron2
    architecture (conv_fcn1..8, score_lowres deconv, 2x upsample).
    Input [N, S, S, C] -> [N, 4S, 4S, K] logits.
    """

    num_keypoints: int = 17
    conv_dims: tuple = tuple(512 for _ in range(8))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        for i, dim in enumerate(self.conv_dims):
            x = Conv2D(
                dim, 3, activation="relu", dtype=self.dtype,
                name=f"conv_fcn{i + 1}",
            )(x, train=train)
        x = ConvTranspose2D(
            self.num_keypoints, 4, 2, dtype=self.dtype, name="score_lowres"
        )(x, train=train)
        b, h, w, k = x.shape
        import jax

        return jax.image.resize(x, (b, h * 2, w * 2, k), method="bilinear")


class MaskRCNNConvUpsampleHead(nn.Module):
    """num_conv 3x3s + 2x deconv + 1x1 per-class mask logits.

    Input [N, S, S, C] -> [N, 2S, 2S, K] logits.
    """

    num_classes: int
    num_conv: int = 4
    conv_dim: int = 256
    norm: str = ""
    cls_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        for i in range(self.num_conv):
            x = Conv2D(
                self.conv_dim, 3, norm=self.norm, activation="relu",
                dtype=self.dtype, name=f"mask_fcn{i + 1}",
            )(x, train=train)
        x = ConvTranspose2D(self.conv_dim, 2, 2, dtype=self.dtype, name="deconv")(
            x, train=train
        )
        x = nn.relu(x)
        out_ch = 1 if self.cls_agnostic else self.num_classes
        x = Conv2D(
            out_ch, 1, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001), name="predictor",
        )(x, train=train)
        return x
