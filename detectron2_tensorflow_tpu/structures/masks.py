"""Mask utilities: paste fixed-resolution box masks into full images.

The reference implements mask pasting as an inverse crop_and_resize
(/root/reference/lib/structures/mask_ops.py:7-56); upstream Detectron2 uses a
CUDA grid-sampler. The TPU-native formulation below is **two small matmuls per
mask**: bilinear interpolation along each axis is a linear map, so

    pasted = W_y @ mask @ W_x^T,   W_y: [H, Mh], W_x: [W, Mw]

with hat-function weights evaluated at the (traced) box-relative coordinates.
This runs on the MXU at batch=N masks (a [N, H, Mh] x [N, Mh, Mw] x
[N, Mw, W] batched contraction) instead of a scalar gather storm, and matches
``align_corners=False`` + zero-padding sampling semantics (coordinates more
than one mask-pixel outside the box contribute zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Interpolation weights must not be truncated to bf16 by the MXU default —
# mask/ROI parity with the reference requires f32 accumulation here. The
# matrices are tiny (<= [1344, 28]) so this costs nothing.
_HIGHEST = jax.lax.Precision.HIGHEST


def _interp_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HIGHEST)


def _bilinear_weight_matrix(out_size: int, lo, hi, mask_size: int, dtype):
    """[out_size, mask_size] bilinear weights mapping mask rows to image rows.

    For output pixel center ``p + 0.5`` inside the box [lo, hi), the source
    coordinate in mask space is ``(p + 0.5 - lo) / (hi - lo) * mask_size - 0.5``
    (half-pixel alignment). Weight to mask cell m is ``max(0, 1 - |coord - m|)``.
    """
    pix = jnp.arange(out_size, dtype=dtype) + 0.5
    extent = jnp.maximum(hi - lo, 1e-4)
    coord = (pix - lo) / extent * mask_size - 0.5  # [out]
    cells = jnp.arange(mask_size, dtype=dtype)  # [M]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coord[:, None] - cells[None, :]))
    return w  # rows for pixels outside the box are all ~0 automatically


def paste_masks_in_image(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    image_size: tuple[int, int],
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Paste ``[N, Mh, Mw]`` soft masks into ``[N, H, W]`` binary image masks.

    ``boxes``: [N, 4] xyxy absolute pixels. ``threshold < 0`` returns soft
    (float) masks instead of binarizing.
    """
    n, mh, mw = masks.shape
    h, w = image_size
    dtype = masks.dtype if jnp.issubdtype(masks.dtype, jnp.floating) else jnp.float32
    masks = masks.astype(dtype)

    def paste_one(mask, box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        wy = _bilinear_weight_matrix(h, y0, y1, mh, dtype)  # [H, Mh]
        wx = _bilinear_weight_matrix(w, x0, x1, mw, dtype)  # [W, Mw]
        # [H, Mh] @ [Mh, Mw] @ [Mw, W] — two MXU matmuls.
        return _interp_matmul(_interp_matmul(wy, mask), wx.T)

    pasted = jax.vmap(paste_one)(masks, boxes)  # [N, H, W]
    if threshold >= 0:
        return pasted > threshold
    return pasted


def crop_and_resize_masks(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    mask_size: int,
) -> jnp.ndarray:
    """Inverse of pasting: crop ``[N, H, W]`` GT masks to ``[N, S, S]`` box crops.

    Used to build mask-head training targets (the reference does this with
    crop_and_resize in lib/data/transform.py:1245-1266 for mini-masks and in
    the mask loss). Same separable-bilinear construction, transposed.
    """
    n, h, w = masks.shape
    dtype = jnp.float32
    masks = masks.astype(dtype)

    def crop_one(mask, box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        # Sample mask_size points inside the box along each axis.
        ys = y0 + (jnp.arange(mask_size, dtype=dtype) + 0.5) / mask_size * (y1 - y0)
        xs = x0 + (jnp.arange(mask_size, dtype=dtype) + 0.5) / mask_size * (x1 - x0)
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs((ys - 0.5)[:, None] - jnp.arange(h, dtype=dtype)[None, :])
        )  # [S, H]
        wx = jnp.maximum(
            0.0, 1.0 - jnp.abs((xs - 0.5)[:, None] - jnp.arange(w, dtype=dtype)[None, :])
        )  # [S, W]
        return _interp_matmul(_interp_matmul(wy, mask), wx.T)  # [S, S]

    return jax.vmap(crop_one)(masks, boxes)
