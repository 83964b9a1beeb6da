"""Deformable convolution v1/v2 (offset-predicting conv).

Parity target: /root/reference/lib/layers/convolutional.py:267-743 (which
builds it from tf.gather_nd; upstream D2 uses CUDA). TPU-native formulation:

  * the offset field comes from a regular 3x3 conv (zero-initialized, as in
    the paper — the layer starts as a plain conv);
  * sampled taps are 4-corner bilinear gathers from the flattened feature
    map (batched per image);
  * the conv itself collapses to ONE matmul: the sampled taps [H, W, K*K, C]
    reshape to [H*W, K*K*C] and multiply the reshaped kernel — MXU work.

v2 (modulated) additionally multiplies each tap by a sigmoid mask.
The reference's own implementations are broken (ModulatedDeformConv2D calls
the wrong super and uses an undefined variable, convolutional.py:536,677);
this one is tested against a plain conv in the zero-offset limit.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_sample(flat, h, w, ys, xs):
    """Zero-padded bilinear sampling of [H*W, C] at float coords [P] -> [P, C].

    Deformable conv uses conv-style zero padding: each of the 4 corner taps
    contributes only if it lies inside the map (no coordinate clamping —
    unlike ROIAlign's border rule).
    """
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = (ys - y0)[:, None]
    lx = (xs - x0)[:, None]

    def take(yi, xi):
        inside = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        v = jnp.take(flat, yc * w + xc, axis=0)
        return jnp.where(inside[:, None], v, 0.0)

    return (
        take(y0, x0) * (1 - ly) * (1 - lx)
        + take(y0, x0 + 1) * (1 - ly) * lx
        + take(y0 + 1, x0) * ly * (1 - lx)
        + take(y0 + 1, x0 + 1) * ly * lx
    )


class DeformConv2D(nn.Module):
    """3x3 deformable conv; ``modulated=True`` => v2."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    deform_groups: int = 1
    modulated: bool = False
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        k = self.kernel_size
        taps = k * k
        dg = self.deform_groups
        assert c % dg == 0

        offset_ch = 2 * taps * dg + (taps * dg if self.modulated else 0)
        offset_field = nn.Conv(
            offset_ch, (k, k), strides=(self.strides, self.strides),
            padding=[(k // 2 * self.dilation,) * 2] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="conv_offset",
        )(x)
        oh, ow = offset_field.shape[1:3]
        offsets = offset_field[..., : 2 * taps * dg].reshape(b, oh, ow, dg, taps, 2)
        if self.modulated:
            mod = jax.nn.sigmoid(
                offset_field[..., 2 * taps * dg :]
            ).reshape(b, oh, ow, dg, taps)
        else:
            mod = None

        # Base sampling grid: output position * stride + dilated tap offset.
        base_y = jnp.arange(oh, dtype=jnp.float32) * self.strides
        base_x = jnp.arange(ow, dtype=jnp.float32) * self.strides
        tap = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2.0
        tap_y = jnp.repeat(tap, k) * self.dilation  # [taps]
        tap_x = jnp.tile(tap, k) * self.dilation

        def sample_image(img, off, m):
            # img [H, W, C]; off [oh, ow, dg, taps, 2] (dy, dx); m may be None
            group_c = c // dg
            outs = []
            for g in range(dg):
                flat = img[..., g * group_c : (g + 1) * group_c].reshape(-1, group_c)
                ys = (
                    base_y[:, None, None]
                    + tap_y[None, None, :]
                    + off[:, :, g, :, 0]
                )  # [oh, ow, taps]
                xs = (
                    base_x[None, :, None]
                    + tap_x[None, None, :]
                    + off[:, :, g, :, 1]
                )
                sampled = _bilinear_sample(
                    flat, h, w, ys.reshape(-1), xs.reshape(-1)
                ).reshape(oh, ow, taps, group_c)
                if m is not None:
                    sampled = sampled * m[:, :, g, :, None]
                outs.append(sampled)
            return jnp.concatenate(outs, axis=-1)  # [oh, ow, taps, C]

        x32 = x.astype(jnp.float32)
        off32 = offsets.astype(jnp.float32)
        if mod is not None:
            sampled = jax.vmap(sample_image)(x32, off32, mod.astype(jnp.float32))
        else:
            sampled = jax.vmap(lambda i, o: sample_image(i, o, None))(x32, off32)

        # One matmul: [B*oh*ow, taps*C] x [taps*C, features].
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k, k, c, self.features),
        )
        wmat = kernel.reshape(taps * c, self.features).astype(jnp.float32)
        out = sampled.reshape(b * oh * ow, taps * c) @ wmat
        out = out.reshape(b, oh, ow, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out.astype(self.dtype)
