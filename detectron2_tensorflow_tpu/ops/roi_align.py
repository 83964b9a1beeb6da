"""ROIAlign: aligned crop-and-resize of ROIs from a feature map.

The reference builds this from ``tf.image.crop_and_resize`` plus a coordinate
transform and SYMMETRIC border padding (/root/reference/lib/layers/
roi_align.py:9-75, functional.py:100-166) — an approximation of Detectron2's
CUDA kernel. Here we implement the *exact* D2 ``aligned=True`` sampling math
(half-pixel offsets, border clamping to [-1, size] with zero outside) as an
XLA program:

  * sample coordinates for all (roi, bin, sample) triples are computed in
    closed form (static shapes: ``out * sampling_ratio`` points per axis);
  * the four bilinear corners are gathered from the flattened ``[H*W, C]``
    feature map (lane-aligned C keeps TPU gathers efficient) and combined
    with their weights;
  * a ``sampling_ratio × sampling_ratio`` mean finishes each bin.

``sampling_ratio=0`` (adaptive per-ROI in D2) is statically resolved to 2 —
the value D2's adaptive rule picks for correctly level-assigned ROIs — since
XLA requires static shapes. ROIs are processed in chunks to bound the gather
working set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def avg_pool_bins(val: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """[N, S, S, C] -> [N, S/r, S/r, C] mean pool via reduce_window.

    A reshape to [..., out, r, out, r, c] leaves tiny trailing dims that TPU
    tiling pads ~70x (875MB temps at production shapes); reduce_window keeps
    the layout intact.
    """
    if ratio == 1:
        return val
    summed = jax.lax.reduce_window(
        val,
        jnp.zeros((), val.dtype),
        jax.lax.add,
        window_dimensions=(1, ratio, ratio, 1),
        window_strides=(1, ratio, ratio, 1),
        padding="VALID",
    )
    return summed / (ratio * ratio)


def _bilinear_gather(flat_features, h, w, ys, xs):
    """Sample ``flat_features`` [H*W, C] at float coords (ys, xs) [P] -> [P, C].

    Implements D2's border rule: points with y < -1 or y > H (resp. x) return
    zero; otherwise coordinates clamp into [0, size-1] before the 4-corner
    bilinear blend.
    """
    out_of_range = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1.0, h - 1.0)
    x1 = jnp.minimum(x0 + 1.0, w - 1.0)
    ly = ys - y0
    lx = xs - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)

    def take(yi, xi):
        return jnp.take(flat_features, yi * w + xi, axis=0)

    val = (
        take(y0i, x0i) * (hy * hx)[:, None]
        + take(y0i, x1i) * (hy * lx)[:, None]
        + take(y1i, x0i) * (ly * hx)[:, None]
        + take(y1i, x1i) * (ly * lx)[:, None]
    )
    return jnp.where(out_of_range[:, None], 0.0, val)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "aligned", "chunk_size"),
)
def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
    chunk_size: int = 256,
) -> jnp.ndarray:
    """Pool ``[N, 4]`` xyxy image-space boxes from ``[H, W, C]`` features.

    Returns ``[N, output_size, output_size, C]`` (NHWC). Matches Detectron2's
    ROIAlignV2 (aligned=True) to float precision.
    """
    h, w, c = features.shape
    n = boxes.shape[0]
    if sampling_ratio <= 0:
        sampling_ratio = 2  # static stand-in for D2's adaptive ceil rule
    s = output_size * sampling_ratio

    scaled = boxes * spatial_scale
    offset = 0.5 if aligned else 0.0
    x0 = scaled[:, 0] - offset
    y0 = scaled[:, 1] - offset
    roi_w = scaled[:, 2] - scaled[:, 0]
    roi_h = scaled[:, 3] - scaled[:, 1]
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    # Sample-point coordinates: s points per axis at sub-bin centers.
    steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s  # in (0, 1)
    ys = y0[:, None] + steps[None, :] * roi_h[:, None]  # [N, S]
    xs = x0[:, None] + steps[None, :] * roi_w[:, None]  # [N, S]

    flat = features.reshape(h * w, c)

    def pool_chunk(coords):
        cy, cx = coords  # [chunk, S] each
        chunk = cy.shape[0]
        grid_y = jnp.repeat(cy[:, :, None], s, axis=2)  # [chunk, S, S]
        grid_x = jnp.repeat(cx[:, None, :], s, axis=1)
        vals = _bilinear_gather(
            flat, h, w, grid_y.reshape(-1), grid_x.reshape(-1)
        )  # [chunk*S*S, C]
        return avg_pool_bins(vals.reshape(chunk, s, s, c), sampling_ratio)

    if n <= chunk_size:
        return pool_chunk((ys, xs))

    # Chunk the ROI axis to bound the gather working set; pad to a multiple.
    pad = (-n) % chunk_size
    ys_p = jnp.pad(ys, ((0, pad), (0, 0)))
    xs_p = jnp.pad(xs, ((0, pad), (0, 0)))
    ys_c = ys_p.reshape(-1, chunk_size, s)
    xs_c = xs_p.reshape(-1, chunk_size, s)
    out = jax.lax.map(pool_chunk, (ys_c, xs_c))
    out = out.reshape(-1, output_size, output_size, c)
    return out[:n]
