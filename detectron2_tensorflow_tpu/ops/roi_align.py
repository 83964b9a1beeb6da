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

``sampling_ratio=0`` is D2's ADAPTIVE rule — per ROI and per axis,
``ceil(roi_extent / out)`` samples per bin. Static shapes still hold: the
sample grid is sized for ``max_adaptive_ratio`` and each ROI's bin average
becomes a per-ROI assignment matrix (samples beyond the ROI's own grid carry
zero weight), so the selected ratio is data-dependent while every array
shape is trace-time constant.
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


def _adaptive_coords_and_bins(origin, extent, out_size, r_max):
    """Per-ROI adaptive sample coords [N, out*r_max] + bin-assignment matrix
    [N, out, out*r_max] for one axis.

    The selected per-ROI ratio is ``clip(ceil(extent / out), 1, r_max)``;
    D2's rule is ``ceil`` with NO lower clip — an axis with extent <= 0 gets
    zero samples, which zeroes the whole output bin (count clamps to 1), so
    that case is folded into the assignment weights instead.
    """
    s = out_size * r_max
    grid = jnp.ceil(extent / out_size)  # D2's raw grid size (can be <= 0)
    r = jnp.clip(grid, 1, r_max)
    ns = out_size * r  # [N] samples actually used
    k = jnp.arange(s, dtype=jnp.float32)
    # Sample positions for THIS ROI's ratio; beyond-grid slots clamp to the
    # last valid sample (their assignment weight below is zero).
    frac = (jnp.minimum(k[None, :], ns[:, None] - 1.0) + 0.5) / ns[:, None]
    coords = origin[:, None] + frac * extent[:, None]
    bins = jnp.floor(k[None, :] / r[:, None])  # [N, S]
    a = (
        (bins[:, None, :] == jnp.arange(out_size, dtype=jnp.float32)[None, :, None])
        & (k[None, None, :] < ns[:, None, None])
    ).astype(jnp.float32) / r[:, None, None]
    a = a * (grid >= 1.0)[:, None, None]  # degenerate axis -> empty bins
    return coords, a


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "sampling_ratio", "aligned", "chunk_size",
        "max_adaptive_ratio",
    ),
)
def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
    chunk_size: int = 256,
    max_adaptive_ratio: int = 8,
) -> jnp.ndarray:
    """Pool ``[N, 4]`` xyxy image-space boxes from ``[H, W, C]`` features.

    Returns ``[N, output_size, output_size, C]`` (NHWC). Matches Detectron2's
    ROIAlignV2 (aligned=True) to float precision, including the adaptive
    ``sampling_ratio=0`` rule (exact for ROIs whose per-axis grid
    ``ceil(extent/out)`` fits ``max_adaptive_ratio``).
    """
    h, w, c = features.shape
    n = boxes.shape[0]
    adaptive = sampling_ratio <= 0
    r_static = max_adaptive_ratio if adaptive else sampling_ratio
    s = output_size * r_static

    scaled = boxes * spatial_scale
    offset = 0.5 if aligned else 0.0
    x0 = scaled[:, 0] - offset
    y0 = scaled[:, 1] - offset
    roi_w = scaled[:, 2] - scaled[:, 0]
    roi_h = scaled[:, 3] - scaled[:, 1]
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    if adaptive:
        ys, ay = _adaptive_coords_and_bins(y0, roi_h, output_size, r_static)
        xs, ax = _adaptive_coords_and_bins(x0, roi_w, output_size, r_static)
        per_roi = (ys, xs, ay, ax)
    else:
        # Sample-point coordinates: s points per axis at sub-bin centers.
        steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s  # in (0, 1)
        ys = y0[:, None] + steps[None, :] * roi_h[:, None]  # [N, S]
        xs = x0[:, None] + steps[None, :] * roi_w[:, None]  # [N, S]
        per_roi = (ys, xs)

    flat = features.reshape(h * w, c)

    def pool_chunk(args):
        cy, cx = args[0], args[1]  # [chunk, S] coords
        chunk = cy.shape[0]
        grid_y = jnp.repeat(cy[:, :, None], s, axis=2)  # [chunk, S, S]
        grid_x = jnp.repeat(cx[:, None, :], s, axis=1)
        vals = _bilinear_gather(
            flat, h, w, grid_y.reshape(-1), grid_x.reshape(-1)
        )  # [chunk*S*S, C]
        vals = vals.reshape(chunk, s, s, c)
        if adaptive:
            cay, cax = args[2], args[3]  # [chunk, out, S] bin matrices
            a = jnp.einsum("nik,nklc->nilc", cay, vals)
            return jnp.einsum("njl,nilc->nijc", cax, a)
        return avg_pool_bins(vals, r_static)

    if n <= chunk_size:
        return pool_chunk(per_roi)

    # Chunk the ROI axis to bound the gather working set; pad to a multiple.
    pad = (-n) % chunk_size
    args = tuple(
        jnp.pad(t, ((0, pad),) + ((0, 0),) * (t.ndim - 1)).reshape(
            (-1, chunk_size) + t.shape[1:]
        )
        for t in per_roi
    )
    out = jax.lax.map(pool_chunk, args)
    out = out.reshape(-1, output_size, output_size, c)
    return out[:n]
