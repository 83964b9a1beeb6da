"""Shared NN building blocks: convs, norms, activations.

Replaces the reference's lib/layers/{convolutional,normalization}.py. Convs
are ``flax.linen`` modules over ``lax.conv_general_dilated`` (NHWC — the TPU-
native layout; grouped/dilated conv is a single XLA op, no loop-split like
the reference's _group_conv2d at convolutional.py:26-48). Norm inventory
mirrors normalization.py:15-274:

  * FrozenBN — inference-statistics BN with no trainable state; parameters
    live in the ``frozen`` variable collection so optimizers never see them.
  * BN / SyncBN — flax BatchNorm; SyncBN passes ``axis_name`` so the batch
    statistics are ``lax.pmean``-reduced over the data mesh axis (the ICI
    all-reduce replacing the reference's raw NCCL call at
    normalization.py:120-165).
  * GN — flax GroupNorm(32).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    table = {
        "": lambda x: x,
        "relu": nn.relu,
        "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
        "swish": nn.swish,
        "silu": nn.swish,
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
        "gelu": nn.gelu,
    }
    if name not in table:
        raise ValueError(f"unknown activation '{name}'")
    return table[name]


class FrozenBatchNorm(nn.Module):
    """BatchNorm with statistics and affine params frozen (never trained).

    The default ResNet norm for converted Detectron2 weights. All four
    tensors live in the ``frozen`` collection; the transform is folded to a
    single scale/shift so XLA fuses it into the adjacent conv.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    def folded_affine(self):
        """Declare the four frozen tensors and return the folded (scale,
        shift). The single source of truth for the eps, the ``frozen``
        collection, and the tensor names — shared with the Pallas fused
        residual epilogue (see _FrozenFoldedAffine below)."""
        init = nn.initializers.ones
        zinit = nn.initializers.zeros
        gamma = self.variable("frozen", "scale", init, None, (self.features,)).value
        beta = self.variable("frozen", "bias", zinit, None, (self.features,)).value
        mean = self.variable("frozen", "mean", zinit, None, (self.features,)).value
        var = self.variable("frozen", "var", init, None, (self.features,)).value
        scale = gamma * lax.rsqrt(var + self.eps)
        shift = beta - mean * scale
        return scale, shift

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale, shift = self.folded_affine()
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class BatchNorm(nn.Module):
    """Trainable BN. Under the pjit data mesh the batch axis is globally
    sharded, so the moments XLA computes are *global-batch* statistics — i.e.
    BN on the mesh IS SyncBN (the collective the reference hand-rolls with
    NCCL at normalization.py:120-165 falls out of sharding propagation)."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.9
    axis_name: Optional[str] = None  # kept for explicit shard_map use
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(x)


class GroupNorm(nn.Module):
    features: int
    num_groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, dtype=self.dtype
        )(x)


def get_norm(norm: str, features: int, dtype: Dtype = jnp.float32,
             name: Optional[str] = None) -> Optional[nn.Module]:
    """Norm factory keyed by the config vocabulary (reference get_norm)."""
    if norm == "":
        return None
    if norm == "FrozenBN":
        return FrozenBatchNorm(features, dtype=dtype, name=name)
    if norm in ("BN", "SyncBN"):  # identical under the pjit data mesh
        return BatchNorm(features, dtype=dtype, name=name)
    if norm == "GN":
        return GroupNorm(features, dtype=dtype, name=name)
    raise ValueError(f"unknown norm '{norm}'")


class _ConvKernel(nn.Module):
    """Declares a bare conv ``kernel`` param. Named "conv", it reproduces
    nn.Conv's ``<layer>/conv/kernel`` path so checkpoints and weight
    converters see the identical tree whether or not the fused residual
    epilogue is taken."""

    shape: tuple
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.kernel_init, self.shape)


class _FrozenFoldedAffine(FrozenBatchNorm):
    """FrozenBatchNorm whose __call__ returns the folded (scale, shift)
    instead of applying them — the Pallas residual epilogue applies them
    in-kernel. Inherits the eps/collection/tensor-name contract, so the
    two paths cannot diverge. Instantiated under FrozenBatchNorm's
    auto-name (see Conv2D) so the checkpoint tree is identical either way.
    """

    @nn.compact
    def __call__(self):  # noqa: D102 — contract documented above
        return self.folded_affine()


class Conv2D(nn.Module):
    """Conv + optional norm + optional activation (NHWC, HWIO kernels).

    ``use_bias`` defaults to "no norm => bias", matching D2 convention.

    ``residual``: when passed to ``__call__``, the layer computes
    ``relu(norm(conv(x)) + residual)`` — and, for the 1x1/stride-1/FrozenBN
    shape every ResNet bottleneck tail has, rides a single Pallas kernel
    (ops/pallas/fused_residual.py) instead of letting XLA spill the conv
    result to HBM before a separate add+relu kernel.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    norm: str = ""
    activation: str = ""
    use_bias: Optional[bool] = None
    padding: str | Sequence = "SAME"
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        bias = self.use_bias if self.use_bias is not None else self.norm == ""
        if residual is not None:
            assert self.activation == "", (
                "residual implies the trailing relu; set activation=''"
            )
            from ..ops.pallas.fused_residual import (
                epilogue_shape_supported,
                fused_conv1x1_bn_add_relu,
                fused_epilogue_supported,
            )

            import os as _os

            _dot_tail = _os.environ.get("D2TPU_DOT_TAIL", "0") == "1"
            _tail_ok = epilogue_shape_supported(
                self.kernel_size, self.strides, self.groups,
                self.dilation, self.norm, bias, self.padding,
            )
            if (_dot_tail and _tail_ok) or fused_epilogue_supported(
                self.kernel_size, self.strides, self.groups,
                self.dilation, self.norm, bias, self.padding,
            ):
                kernel = _ConvKernel(
                    (1, 1, x.shape[-1], self.features),
                    self.kernel_init,
                    name="conv",
                )()
                scale, shift = _FrozenFoldedAffine(
                    self.features,
                    # get_norm's flax auto-name for the unfused path.
                    name=f"{FrozenBatchNorm.__name__}_0",
                )()
                if _dot_tail and _tail_ok:
                    # Same epilogue expressed as a plain-XLA dot: a 1x1
                    # stride-1 conv over NHWC IS x·W on the channel axis,
                    # and dot_general (unlike convolution — see
                    # ops/pallas/fused_residual.py) admits output fusion
                    # of the affine+add+relu, so the conv result need not
                    # round-trip HBM before the residual add. Param tree
                    # identical to the other two paths by construction.
                    # MEASURED DEAD END (round 4, kept opt-in for the
                    # record): Mask R-CNN R50-FPN serving bench 154.7
                    # img/s with D2TPU_DOT_TAIL=1 vs 170.7 with the conv
                    # path — the dot's canonical [BHW, C] layout breaks
                    # the batch-minormost {3,0,2,1} layout chain XLA
                    # gives the surrounding convs, and the relayout
                    # copies cost more than the saved HBM round trip
                    # (the same failure mode as the Mosaic epilogue).
                    w = kernel.reshape(x.shape[-1], self.features)
                    y = jax.lax.dot_general(
                        # promote-to-dtype mirrors nn.Conv: without the x
                        # cast an f32 input silently runs the dot in f32.
                        x.astype(self.dtype), w.astype(self.dtype),
                        (((3,), (0,)), ((), ())),
                    )
                    y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
                    return nn.relu(y + residual)
                return fused_conv1x1_bn_add_relu(
                    x, kernel.astype(self.dtype), scale, shift, residual
                )
        padding = self.padding
        if padding == "SAME" and self.strides > 1:
            # Explicit symmetric padding: XLA "SAME" with stride 2 pads
            # bottom/right-heavy like TF, but D2/torch pads evenly (k//2).
            # Matching D2 is required for converted-weight parity.
            p = (self.kernel_size - 1) // 2 * self.dilation
            padding = [(p, p), (p, p)]
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            padding=padding,
            use_bias=bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            name="conv",
        )(x)
        norm = get_norm(self.norm, self.features, self.dtype)
        if norm is not None:
            x = norm(x, train=train)
        if residual is not None:
            return nn.relu(x + residual)
        if self.activation:
            x = get_activation(self.activation)(x)
        return x


class ConvTranspose2D(nn.Module):
    """Transposed conv (mask-head deconv); reference convolutional.py:747-893."""

    features: int
    kernel_size: int = 2
    strides: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="VALID" if self.kernel_size == self.strides else "SAME",
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            name="deconv",
        )(x)


class DropBlock(nn.Module):
    """Structured dropout: contiguous block_size x block_size regions are
    zeroed together (reference lib/layers/dropblock.py:12-79)."""

    keep_prob: float = 0.9
    block_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not train or self.keep_prob >= 1.0:
            return x
        b, h, w, c = x.shape
        bs = min(self.block_size, h, w)
        # Seed-point rate chosen so the expected dropped fraction matches.
        gamma = (
            (1.0 - self.keep_prob)
            / (bs**2)
            * (h * w)
            / max((h - bs + 1) * (w - bs + 1), 1)
        )
        rng = self.make_rng("dropout")
        seeds = jax.random.bernoulli(rng, gamma, (b, h - bs + 1, w - bs + 1, c))
        pad = [(0, 0), (bs // 2, bs - 1 - bs // 2), (bs // 2, bs - 1 - bs // 2), (0, 0)]
        seeds = jnp.pad(seeds, pad)
        block_mask = 1.0 - (
            jax.lax.reduce_window(
                seeds.astype(jnp.float32), 0.0, jax.lax.max,
                (1, bs, bs, 1), (1, 1, 1, 1), "SAME",
            )
        )
        norm = block_mask.size / jnp.maximum(block_mask.sum(), 1.0)
        return x * block_mask.astype(x.dtype) * norm.astype(x.dtype)


def max_pool(x: jnp.ndarray, window: int, stride: int, padding="SAME") -> jnp.ndarray:
    if padding == "SAME" and stride > 1:
        # Same even-padding consideration as Conv2D above (stem maxpool).
        p = (window - 1) // 2
        padding = [(p, p), (p, p)]
    import os as _os

    if (
        window == 3 and stride == 2 and padding == [(1, 1), (1, 1)]
        and _os.environ.get("D2TPU_SEPARABLE_STEM_POOL", "0") == "1"
    ):  # measured-first opt-in; see max_pool_3x3_s2_separable
        return max_pool_3x3_s2_separable(x)
    return nn.max_pool(
        x, window_shape=(window, window), strides=(stride, stride), padding=padding
    )


def max_pool_3x3_s2_separable(x: jnp.ndarray) -> jnp.ndarray:
    """The stem's 3x3/2 maxpool as two rank-1 passes: rows (3x1, stride
    (2, 1)) then columns (1x3, stride (1, 2)). Exact — max over a 3x3
    window separates into max-of-row-maxes (tests/test_layers_fast.py).

    Why: the fused reduce-window reads 9 strided taps per output and
    measured 41% of HBM bandwidth at the serving shape (roofline audit,
    ROUND5.md); each separable pass is a contiguous 3-tap sweep with a
    2.25x smaller intermediate than the input, trading ~60% more bytes for
    much higher achieved bandwidth."""
    r = nn.max_pool(x, (3, 1), strides=(2, 1), padding=[(1, 1), (0, 0)])
    return nn.max_pool(r, (1, 3), strides=(1, 2), padding=[(0, 0), (1, 1)])


class GCN(nn.Module):
    """Global Convolutional Network block (Peng et al. 2017): two separable
    large-kernel branches, (k x 1 -> 1 x k) + (1 x k -> k x 1), summed — a
    k x k receptive field at O(k) cost, MXU-friendly as four plain convs.

    The reference ships a GCN layer (convolutional.py:896-1006) that cannot
    even construct (undefined ``stride``/``rate`` in its __init__ — unused
    by any config, SURVEY §2.7); this is a correct implementation.
    """

    features: int
    kernel_size: int = 15
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size

        def conv(name, kh, kw, inp):
            return nn.Conv(
                self.features, (kh, kw), padding="SAME",
                use_bias=self.use_bias, dtype=self.dtype, name=name,
            )(inp)

        left = conv("l2", 1, k, conv("l1", k, 1, x))
        right = conv("r2", k, 1, conv("r1", 1, k, x))
        return left + right
