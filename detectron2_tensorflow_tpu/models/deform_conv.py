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


def _bilinear_sample(flat, h, w, ys, xs, row_base=None):
    """Zero-padded bilinear sampling of [H*W, C] at float coords [P] -> [P, C].

    Deformable conv uses conv-style zero padding: each of the 4 corner taps
    contributes only if it lies inside the map (no coordinate clamping —
    unlike ROIAlign's border rule).

    Values keep ``flat``'s dtype end to end (bf16 in production — halves the
    gathered bytes and the materialized tap tensor, the layer's HBM cost);
    coordinates and corner weights are computed in f32 and only cast at the
    multiply, so position math never quantizes.

    ``row_base``: optional per-sample row offset into ``flat`` — the caller
    folds a batch of images into one [B*H*W, C] plane and passes
    ``image_index * H * W`` here. Measured on TPU v5e: one flat gather over
    the folded plane runs 3.3x faster than the batched gather a vmapped
    per-image sample lowers to (5.8 vs 19.3 ms at the res3 dconv shape),
    because XLA's batched gather path serializes far worse than its flat
    row-gather. Corner clipping keeps every index inside its own image's
    window, so images never bleed into each other.
    """
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = (ys - y0)[:, None]
    lx = (xs - x0)[:, None]

    def take(yi, xi, wgt):
        inside = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = yc * w + xc
        if row_base is not None:
            idx = idx + row_base
        v = jnp.take(flat, idx, axis=0)
        wgt = jnp.where(inside[:, None], wgt, 0.0).astype(flat.dtype)
        return v * wgt

    return (
        take(y0, x0, (1 - ly) * (1 - lx))
        + take(y0, x0 + 1, (1 - ly) * lx)
        + take(y0 + 1, x0, ly * (1 - lx))
        + take(y0 + 1, x0 + 1, ly * lx)
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

        # Sampling stays [B*P, C] with P = oh*ow*taps end to end:
        #  * a taps-second-minor [oh, ow, 9, C] intermediate would be
        #    tile-padded 9 -> 16 on TPU (+78% bytes on every elementwise op);
        #  * row-major [b*pos*taps, C] flattens bit-exactly to the matmul's
        #    [b*pos, taps*C] operand, so no relayout is ever needed;
        #  * the batch folds into the gather ROW INDEX (row_base) instead of
        #    vmapping — see _bilinear_sample's measured 3.3x.
        group_c = c // dg
        xv = x.astype(self.dtype)
        off32 = offsets.astype(jnp.float32)
        # [B, oh, ow, taps] absolute sample coords per deform group.
        grid_y = base_y[:, None, None] + tap_y[None, None, :]
        grid_x = base_x[None, :, None] + tap_x[None, None, :]
        row_base = jnp.repeat(
            jnp.arange(b, dtype=jnp.int32) * (h * w), oh * ow * taps
        )
        outs = []
        for g in range(dg):
            flat = xv[..., g * group_c : (g + 1) * group_c].reshape(-1, group_c)
            ys = grid_y[None] + off32[:, :, :, g, :, 0]  # [B, oh, ow, taps]
            xs = grid_x[None] + off32[:, :, :, g, :, 1]
            sampled = _bilinear_sample(
                flat, h, w, ys.reshape(-1), xs.reshape(-1), row_base=row_base
            )  # [B*P, group_c]
            if mod is not None:
                sampled = sampled * mod[:, :, :, g, :].reshape(-1, 1).astype(
                    sampled.dtype
                )
            outs.append(sampled)
        sampled = outs[0] if dg == 1 else jnp.concatenate(outs, axis=-1)
        # [B*oh*ow*taps, C] row-major == [B*oh*ow, taps*C].

        # One matmul: [B*oh*ow, taps*C] x [taps*C, features].
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k, k, c, self.features),
        )
        wmat = kernel.reshape(taps * c, self.features).astype(self.dtype)
        out = jnp.dot(
            sampled.reshape(b * oh * ow, taps * c), wmat,
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(b, oh, ow, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out.astype(self.dtype)
