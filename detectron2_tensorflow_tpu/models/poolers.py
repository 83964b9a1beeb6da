"""Multi-level ROI pooling (FPN-paper level assignment + ROIAlign).

The reference pools per level then regathers with an inverse permutation
(/root/reference/lib/modeling/poolers.py:11-180, a tf.map_fn pipeline).

TPU-native design (v2, patch-matmul): TPU gathers run at ~1e8 rows/s, so the
classic 4-corner-per-sample-point gather (4*N*S*S row fetches) is latency-
bound and slow. Instead each ROI fetches ONE contiguous [P, P, C] patch from
its assigned pyramid level (a single big-slice gather — DMA-friendly), and
the bilinear interpolation + bin averaging collapse into two small per-ROI
matmuls against precomputed hat-weight matrices:

    out[n] = Wy[n] (S x P)  @  patch[n] (P x P x C)  @  Wx[n]^T

which run on the MXU at negligible cost. Level assignment is the pure FPN
area rule; boxes whose sample span would overflow the (small) patch pool
from a 2x/4x-avgpooled ALIAS of the same level (see plan_pooling — same
features at lower resolution, not a different FPN level). Sampling math
(half-pixel offsets, [-1, size] zero border, clamp) is exactly Detectron2's
aligned=True.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence

import jax
import jax.numpy as jnp

# Patch must cover: max ROI extent at the coarsest level (1344/32 = 42 for
# the standard buckets) + 2 border cells + up to 7 cells of DMA alignment
# (Mosaic requires the W-axis slice start to be sublane-aligned, i.e. a
# multiple of 8). 56 = 8 * 7 satisfies all three.
DEFAULT_PATCH = 56
_ALIGN = 8  # TPU sublane alignment for the W-axis DMA start
_EXTENT_MARGIN = 2 + (_ALIGN - 1)  # border + worst-case alignment shift

from ..ops.pallas.roi_patch import (  # narrow-DMA window tiers + skip sentinel
    COL_TIERS,
    ROW_TIERS,
    skip_tier_class,
    tier_combos,
)


def assign_boxes_to_levels(
    boxes: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    patch_size: int = 0,
    extent_max_level: int = 0,
) -> jnp.ndarray:
    """FPN paper eqn (1): level = floor(k0 + log2(sqrt(wh)/224)), clamped.

    With ``patch_size > 0`` the level is additionally raised until
    ``max(w, h) / stride <= patch_size - 2`` (see module docstring);
    ``extent_max_level >= max_level`` lets that raise reach EXTRA pooled
    levels (2x-avgpooled copies of the top feature map) beyond the FPN
    area-rule range. Returns [N] int32 level indices relative to min_level.
    """
    extent_max_level = max(extent_max_level, max_level)
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    sqrt_area = jnp.sqrt(w * h)
    lvl = jnp.floor(
        canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8)
    )
    lvl = jnp.clip(lvl, min_level, max_level)  # FPN area rule
    if patch_size > 0:
        max_side = jnp.maximum(w, h)
        extent_lvl = jnp.ceil(
            jnp.log2(jnp.maximum(max_side / (patch_size - _EXTENT_MARGIN), 1e-8))
        )
        lvl = jnp.maximum(lvl, extent_lvl)
    lvl = jnp.clip(lvl, min_level, extent_max_level)
    return (lvl - min_level).astype(jnp.int32)


def _interp_weights(coords, ty, size_l, patch_size, out_size, ratio):
    """Per-ROI bin-averaged hat weights.

    coords: [N, S] sample coordinates (S = out*ratio) in level space;
    ty: [N] patch origin; size_l: [N] level extent. Returns [N, out, P]
    weights implementing D2's clamp-to-[0,size-1] + zero-outside-[-1,size]
    border rule, with the ratio-bin mean folded in.
    """
    n, s = coords.shape
    in_range = (coords >= -1.0) & (coords <= size_l[:, None])
    clamped = jnp.clip(coords, 0.0, size_l[:, None] - 1.0)
    local = clamped - ty[:, None]  # within [0, P-1] by construction
    cells = jnp.arange(patch_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(local[:, :, None] - cells[None, None, :]))
    w = w * in_range[:, :, None]
    # Fold the sampling-bin average: mean over each group of `ratio` samples.
    w = w.reshape(n, out_size, ratio, patch_size).mean(axis=2)
    return w  # [N, out, P]


def _sample_coords(origin, extent, out_size, ratio):
    """[N, out*ratio] uniform sample-point coords over [origin, origin+extent].

    D2 places ``ratio`` samples per bin at sub-bin centers; across ``out``
    bins that is exactly a uniform grid of out*ratio points at centers
    (k + 0.5) / (out*ratio)."""
    s = out_size * ratio
    steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    return origin[:, None] + steps[None, :] * extent[:, None]


def _adaptive_weights(origin, extent, ratio_sel, ty, size_l, patch_size,
                      out_size, ratio_max):
    """Per-ROI hat weights under D2's ADAPTIVE sampling rule.

    D2 with sampling_ratio=0 uses ``ceil(roi_extent / out)`` samples per bin
    per ROI (per axis). The weight matrix shape [N, out, P] is ratio-
    independent, so each candidate ratio's weights are computed and the
    per-ROI selection is a where() — all static shapes. ``ratio_sel`` is the
    per-ROI selected ratio in [1, ratio_max]."""
    w = None
    for r in range(1, ratio_max + 1):
        w_r = _interp_weights(
            _sample_coords(origin, extent, out_size, r), ty, size_l,
            patch_size, out_size, r,
        )
        w = w_r if w is None else jnp.where(
            (ratio_sel == r)[:, None, None], w_r, w
        )
    return w


@jax.custom_vjp
def _avgpool2x(f: jnp.ndarray) -> jnp.ndarray:
    # reduce_window compiles ~3x faster than reshape+mean on TPU (the
    # reshape forces an HBM relayout). Native-dtype accumulation (default;
    # D2TPU_POOL_ALIAS_NATIVE_DTYPE=0 restores f32): the bf16->f32 convert
    # of the big levels does not fuse into the reduce-window on TPU,
    # materializing full f32 copies — the audit's 0.167 ms/img 'reduce'
    # phase at 0.67 eff. Measured round 5 (Mask R-CNN R50-FPN 800x1344
    # bf16, v5e-1): serving 170.5 -> 172.9 img/s; train 52.4 -> 52.6.
    # Summing 4 bf16 taps in bf16 is <=0.6% rel error on an alias tier
    # only extent-overflow boxes ever read.
    import os

    acc = (
        jnp.float32
        if os.environ.get("D2TPU_POOL_ALIAS_NATIVE_DTYPE", "1") == "0"
        else f.dtype
    )
    s = jax.lax.reduce_window(
        f.astype(acc), jnp.zeros((), acc), jax.lax.add,
        (2, 2, 1), (2, 2, 1), "VALID",
    )
    return (s * jnp.asarray(0.25, acc)).astype(f.dtype)


def _avgpool2x_fwd(f):
    # Zero-width template: carries the input's (h, w) and dtype through the
    # residuals as a JAX value (residual leaves must be arrays).
    return _avgpool2x(f), jnp.zeros((f.shape[0], f.shape[1], 0), f.dtype)


def _avgpool2x_bwd(template, g):
    # Exact transpose of the 2x2 mean: broadcast each cotangent cell to its
    # 2x2 source window at weight 1/4 — a repeat, not XLA's autodiff
    # transpose of reduce_window (which lowers to a slow scatter shape on
    # TPU and dominated the pooler backward before this).
    gf = g.astype(jnp.float32) * 0.25
    gf = jnp.repeat(jnp.repeat(gf, 2, axis=0), 2, axis=1)
    ph = template.shape[0] - gf.shape[0]
    pw = template.shape[1] - gf.shape[1]
    if ph or pw:  # odd input rows/cols fall outside every VALID window
        gf = jnp.pad(gf, ((0, ph), (0, pw), (0, 0)))
    return (gf.astype(template.dtype),)


_avgpool2x.defvjp(_avgpool2x_fwd, _avgpool2x_bwd)


class StorageMeta:
    """Static (trace-time) description of a built pooling storage plane."""

    def __init__(self, shapes, strides, base_l, patch_size, extent_tiers):
        self.shapes = shapes              # [(h, w)] per storage level
        self.strides = strides            # per storage level
        self.base_l = base_l              # number of real FPN levels
        self.patch_size = patch_size
        self.extent_tiers = extent_tiers
        self.w_max = max(max(w for _, w in shapes), patch_size)
        offs, off = [], 0
        for h, _ in shapes:
            offs.append(off)
            off += h
        self.row_offsets = offs


def build_storage(
    features: List[jnp.ndarray],
    strides: Sequence[int],
    patch_size: int,
    extent_tiers: bool = False,
):
    """Build the row-concatenated pooling plane (see plan_pooling docstring).

    Returns (storage [Htot, Wm, C], StorageMeta). Separated from the
    per-ROI planning so the box / mask / keypoint poolers SHARE one storage
    build (and one set of avgpool aliases) per image.
    """
    features = list(features)
    strides = list(strides)
    base_l = len(features)
    if extent_tiers:
        for i in range(base_l):  # tier-1: 2x alias of every level
            features.append(_avgpool2x(features[i]))
            strides.append(strides[i] * 2)
        # tier-2: 4x alias of the top level (covers any legal box)
        features.append(_avgpool2x(features[2 * base_l - 1]))
        strides.append(strides[base_l - 1] * 4)

    c = features[0].shape[-1]
    p = patch_size
    meta = StorageMeta(
        [(f.shape[0], f.shape[1]) for f in features], strides, base_l, p,
        extent_tiers,
    )
    storage = jnp.concatenate(
        [
            jnp.pad(f, ((0, 0), (0, meta.w_max - f.shape[1]), (0, 0)))
            for f in features
        ]
        + [jnp.zeros((p, meta.w_max, c), features[0].dtype)],
        axis=0,
    )
    return storage, meta


def plan_rois(
    meta: StorageMeta,
    boxes: jnp.ndarray,
    output_size: int,
    sampling_ratio: int,
    canonical_box_size: int,
    canonical_level: int,
    valid: jnp.ndarray | None = None,
):
    """Per-ROI plan against a built storage: (starts [N, 3], wy, wx).

    ``valid`` ([N] bool, optional): slots marked invalid get the Pallas
    skip sentinel as their window-tier class (the kernels issue no DMA and
    write exact zeros for them — the per-ROI DMA issue cost dominates, and
    at serving time most of the fixed proposal budget is NMS padding whose
    outputs every consumer masks), have their origin parked on the plane's
    trailing zero-pad rows, and get zeroed interpolation weights so the XLA
    fallback path produces the same zeros.
    """
    strides = meta.strides
    base_l = meta.base_l
    p = meta.patch_size
    w_max = meta.w_max

    heights = jnp.asarray([h for h, _ in meta.shapes], jnp.float32)
    widths = jnp.asarray([w for _, w in meta.shapes], jnp.float32)
    scales = jnp.asarray([1.0 / st for st in strides], jnp.float32)
    offsets = jnp.asarray(meta.row_offsets, jnp.int32)

    min_level = int(math.log2(strides[0]))
    if meta.extent_tiers:
        fpn_max_level = min_level + base_l - 1
        base = assign_boxes_to_levels(
            boxes, min_level, fpn_max_level, canonical_box_size,
            canonical_level,
        )  # pure D2 area rule, 0-based
        bw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
        bh = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
        max_side = jnp.maximum(bw, bh)
        bound = float(p - _EXTENT_MARGIN)
        base_stride = jnp.take(
            jnp.asarray(strides[:base_l], jnp.float32), base
        )
        extent = max_side / base_stride
        levels = jnp.where(extent > bound, base + base_l, base)
        levels = jnp.where(extent > 2 * bound, 2 * base_l, levels)
    else:
        fpn_max_level = int(math.log2(strides[-1]))
        levels = assign_boxes_to_levels(
            boxes, min_level, fpn_max_level, canonical_box_size,
            canonical_level, patch_size=p,
        )  # [N], 0-based

    scale = jnp.take(scales, levels)
    h_l = jnp.take(heights, levels)
    w_l = jnp.take(widths, levels)

    scaled = boxes * scale[:, None]
    x0 = scaled[:, 0] - 0.5
    y0 = scaled[:, 1] - 0.5
    roi_w = scaled[:, 2] - scaled[:, 0]
    roi_h = scaled[:, 3] - scaled[:, 1]

    adaptive = sampling_ratio <= 0
    if adaptive:
        # D2 sampling_ratio=0: ceil(roi_extent / out) samples per bin, per
        # ROI and per AXIS (the reference CUDA kernel's adaptive rule). The
        # extent-tier routing bounds every span by (p - _EXTENT_MARGIN)
        # cells at its storage level, so the selected ratio never exceeds
        # ceil(bound / out) — the cap below is exact for every in-contract
        # box and only guards degenerate inputs.
        r_max = max(1, -(-(p - _EXTENT_MARGIN) // output_size))
        ry = jnp.clip(jnp.ceil(roi_h / output_size), 1, r_max).astype(jnp.int32)
        rx = jnp.clip(jnp.ceil(roi_w / output_size), 1, r_max).astype(jnp.int32)
        ns_y = (output_size * ry).astype(jnp.float32)
        ns_x = (output_size * rx).astype(jnp.float32)
        first_y = y0 + 0.5 * roi_h / ns_y
        first_x = x0 + 0.5 * roi_w / ns_x
        max_y = jnp.maximum(first_y, y0 + roi_h - 0.5 * roi_h / ns_y)
        max_x = jnp.maximum(first_x, x0 + roi_w - 0.5 * roi_w / ns_x)
    else:
        s = output_size * sampling_ratio
        steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        ys = y0[:, None] + steps[None, :] * roi_h[:, None]  # [N, S]
        xs = x0[:, None] + steps[None, :] * roi_w[:, None]
        first_y, first_x = ys[:, 0], xs[:, 0]
        max_y, max_x = jnp.max(ys, axis=1), jnp.max(xs, axis=1)

    # Patch origin: floor of the first clamped sample, kept inside the
    # level (downward overreach lands in zero-weight rows, see above).
    # tx rounds DOWN to the sublane alignment so the Pallas DMA start is
    # tileable (the extra left margin is inside the patch).
    ty = jnp.clip(
        jnp.floor(jnp.clip(first_y, 0.0, None)), 0.0, jnp.maximum(h_l - 1, 0)
    )
    tx = jnp.clip(jnp.floor(jnp.clip(first_x, 0.0, None)), 0.0, w_max - p)
    tx = jnp.floor(tx / _ALIGN) * _ALIGN

    if adaptive:
        wy = _adaptive_weights(y0, roi_h, ry, ty, h_l, p, output_size, r_max)
        wx = _adaptive_weights(x0, roi_w, rx, tx, w_l, p, output_size, r_max)
        # D2's adaptive grid has ceil(extent/out) = 0 samples on a
        # degenerate (zero-extent) axis: the bin sum is empty and the
        # output is exactly 0 (its count clamps to 1). Either degenerate
        # axis zeroes the whole bin, so gate both weight matrices.
        ok = ((roi_h > 0.0) & (roi_w > 0.0))[:, None, None]
        wy = wy * ok
        wx = wx * ok
    else:
        wy = _interp_weights(ys, ty, h_l, p, output_size, sampling_ratio)
        wx = _interp_weights(xs, tx, w_l, p, output_size, sampling_ratio)

    rows = jnp.take(offsets, levels) + ty.astype(jnp.int32)

    # Window class: the number of patch rows/cols carrying nonzero hat
    # weight is floor(last clamped sample) - origin + 2 (weights reach one
    # cell past the last sample; the col span additionally absorbs the tx
    # sublane down-alignment because tx IS the aligned origin). The Pallas
    # kernels narrow the per-ROI DMA to the smallest (row, col) tier combo
    # covering both spans — typical area-rule ROIs span <= 16-24 of the 32
    # patch cells per axis, cutting patch/RMW HBM traffic ~40%.
    def tier_class(tiers, span):
        c = jnp.full(span.shape, len(tiers), jnp.int32)
        for k in reversed(range(len(tiers))):
            c = jnp.where(span <= tiers[k], k, c)
        return c

    last_y = jnp.clip(max_y, 0.0, jnp.maximum(h_l - 1, 0.0))
    span_y = jnp.floor(last_y).astype(jnp.int32) - ty.astype(jnp.int32) + 2
    last_x = jnp.clip(max_x, 0.0, jnp.maximum(w_l - 1, 0.0))
    span_x = jnp.floor(last_x).astype(jnp.int32) - tx.astype(jnp.int32) + 2
    n_col = len([c for c in COL_TIERS if c < p]) + 1
    cls = (
        tier_class([r for r in ROW_TIERS if r < p], span_y) * n_col
        + tier_class([c for c in COL_TIERS if c < p], span_x)
    )

    if valid is not None:
        skip = jnp.logical_not(valid)
        # First trailing zero-pad row of the plane (build_storage appends
        # ``p`` zero rows): a safe parking spot for skipped slots.
        safe_row = sum(h for h, _ in meta.shapes)
        cls = jnp.where(skip, skip_tier_class(p), cls)
        rows = jnp.where(skip, jnp.int32(safe_row), rows)
        tx = jnp.where(skip, 0.0, tx)  # stays _ALIGN-aligned
        wy = jnp.where(skip[:, None, None], 0.0, wy)
        wx = jnp.where(skip[:, None, None], 0.0, wx)

    starts = jnp.stack([rows, tx.astype(jnp.int32), cls], axis=1)  # [N, 3]
    return starts, wy, wx


def pool_from_storage(
    storage: jnp.ndarray,
    meta: StorageMeta,
    boxes: jnp.ndarray,
    output_size: int,
    sampling_ratio: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    use_pallas: bool | None = None,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """ROIAlign from a pre-built storage plane.

    Batched ([B, Htot, Wm, C] storage + [B, N, 4] boxes -> [B, N, S, S, C])
    or single-image ([Htot, Wm, C] + [N, 4] -> [N, S, S, C]). The batch is
    passed to the Pallas kernels as a native grid dimension — do NOT wrap
    this in jax.vmap for a batch (vmap of the kernel falls back to a
    sequential lax.map; see ops/pallas/roi_patch.py).

    ``valid`` ([B, N] / [N] bool, optional): invalid slots are skipped
    entirely and pooled as exact zeros (see :func:`plan_rois`).

    ``sampling_ratio <= 0`` selects D2's exact adaptive rule (per-ROI,
    per-axis ``ceil(extent / out)`` samples per bin — see plan_rois).
    """
    batched = storage.ndim == 4
    plan = functools.partial(
        plan_rois,
        meta,
        output_size=output_size,
        sampling_ratio=sampling_ratio,
        canonical_box_size=canonical_box_size,
        canonical_level=canonical_level,
    )
    if valid is None:
        starts, wy, wx = (jax.vmap(plan) if batched else plan)(boxes)
    else:
        plan_v = lambda b, v: plan(b, valid=v)
        starts, wy, wx = (jax.vmap(plan_v) if batched else plan_v)(boxes, valid)
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and storage.dtype == jnp.bfloat16
        )
    if use_pallas:
        from ..ops.pallas.roi_patch import roi_patch_interpolate_diff

        return roi_patch_interpolate_diff(storage, starts, wy, wx)

    p = meta.patch_size
    c = storage.shape[-1]
    dt = storage.dtype
    prec = (
        jax.lax.Precision.HIGHEST if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    def one(plane, st_i, wy_i, wx_i):
        def fetch(st):
            # st[2] (row-span class) only matters for the Pallas narrowing.
            return jax.lax.dynamic_slice(plane, (st[0], st[1], 0), (p, p, c))

        patches = jax.vmap(fetch)(st_i)  # [N, P, P, C]
        a = jnp.einsum("nop,npqc->noqc", wy_i.astype(dt), patches, precision=prec)
        return jnp.einsum("nuq,noqc->nouc", wx_i.astype(dt), a, precision=prec)

    if batched:
        return jax.vmap(one)(storage, starts, wy, wx)
    return one(storage, starts, wy, wx)


def pool_multi_from_storage(
    storage: jnp.ndarray,
    meta: StorageMeta,
    requests: Sequence[dict],
    use_pallas: bool | None = None,
):
    """Pool several ROI sets from ONE shared storage plane in a single
    differentiable op with a chained backward.

    Each request: ``dict(boxes, output_size, sampling_ratio,
    canonical_box_size=224, canonical_level=4, valid=None)`` — the same
    parameters :func:`pool_from_storage` takes. Returns a tuple of pooled
    arrays, one per request.

    Why not independent :func:`pool_from_storage` calls: autodiff of k
    pools of the same plane materializes k full f32 gradient pyramids that
    XLA zero-initializes and adds — at the Mask R-CNN train shape the box+
    mask pair costs ~1.0 ms/img of pure HBM traffic (a [16, 600, 336, 256]
    f32 plane is 5.2 GB). Here the Pallas RMW backwards chain through one
    accumulator plane (ops/pallas/roi_patch.py roi_patch_pool_multi).
    The reference's pattern being fused: the per-head box/mask/keypoint
    pooler calls of roi_heads.py:490,579.
    """
    batched = storage.ndim == 4
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and storage.dtype == jnp.bfloat16
        )
    if not use_pallas:
        # XLA path: gradients are exact-autodiff dynamic-slice transposes;
        # nothing to fuse across calls.
        return tuple(
            pool_from_storage(
                storage, meta, r["boxes"], r["output_size"],
                r["sampling_ratio"], r.get("canonical_box_size", 224),
                r.get("canonical_level", 4), use_pallas=False,
                valid=r.get("valid"),
            )
            for r in requests
        )

    specs = []
    for r in requests:
        plan = functools.partial(
            plan_rois,
            meta,
            output_size=r["output_size"],
            sampling_ratio=r["sampling_ratio"],
            canonical_box_size=r.get("canonical_box_size", 224),
            canonical_level=r.get("canonical_level", 4),
        )
        valid = r.get("valid")
        if valid is None:
            specs.append((jax.vmap(plan) if batched else plan)(r["boxes"]))
        else:
            plan_v = lambda b, v, plan=plan: plan(b, valid=v)
            specs.append(
                (jax.vmap(plan_v) if batched else plan_v)(r["boxes"], valid)
            )

    from ..ops.pallas.roi_patch import roi_patch_pool_multi

    return roi_patch_pool_multi(storage, tuple(specs))


def plan_pooling(
    features: List[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Sequence[int],
    output_size: int,
    sampling_ratio: int,
    canonical_box_size: int,
    canonical_level: int,
    patch_size: int,
    extent_tiers: bool = False,
):
    """Shared front half of the pooler: storage layout + per-ROI plan.

    Returns (storage [Htot, Wm, C], starts [N, 2] (row, col), wy, wx).

    Storage is the pyramid ROW-CONCATENATED into a single [Htot, Wm, C]
    plane (levels stacked top-to-bottom, each row-padded to the widest
    level, plus ``patch_size`` zero rows at the bottom) — vs. a padded
    [L, Hmax, Wmax, C] stack this writes ~60% fewer bytes to HBM, which at
    production shapes is itself milliseconds per batch. A patch fetched
    near a level's bottom edge may read into the next level's rows; those
    rows always carry ZERO interpolation weight (samples are clamped to the
    level extent and the hat weight at distance >= 1 is exactly 0), so the
    reads are harmless.

    ``extent_tiers`` bounds EVERY box's sample span by a SMALL patch
    (P^2 drives the per-ROI DMA bytes) without changing which FPN level a
    box READS ITS FEATURES FROM: each level gets a 2x-avgpooled pooling
    alias, and the top level additionally a 4x one. A box whose extent
    exceeds (P - margin) cells at its area-rule level samples the SAME
    level's features at half resolution (bins there span 3+ cells, so the
    half-res bilinear loses almost nothing) — NOT the next FPN level's
    different features. Tier routing: exact -> own-level 2x -> top 4x.
    """
    storage, meta = build_storage(features, strides, patch_size, extent_tiers)
    starts, wy, wx = plan_rois(
        meta, boxes, output_size, sampling_ratio, canonical_box_size,
        canonical_level,
    )
    return storage, starts, wy, wx


def multilevel_roi_align(
    features: List[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    patch_size: int = DEFAULT_PATCH,
    extent_tiers: bool = False,
    use_pallas: bool | None = None,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pool [N, 4] xyxy boxes from a feature pyramid (list of [Hl, Wl, C]).

    Returns [N, out, out, C] in the features' dtype. ``use_pallas=None``
    selects the fused Pallas kernel on TPU, the XLA path elsewhere.
    ``sampling_ratio <= 0`` = D2's exact adaptive rule (see plan_rois).
    """
    assert len(features) == len(strides)
    storage, meta = build_storage(features, strides, patch_size, extent_tiers)
    return pool_from_storage(
        storage, meta, boxes, output_size, sampling_ratio,
        canonical_box_size, canonical_level, use_pallas, valid=valid,
    )


TARGET_PATCH = 32  # patch DMA bytes scale with P^2 — keep it small


def plan_patch(max_image_size: int, top_stride: int,
               target: int = TARGET_PATCH):
    """(patch_size, extent_tiers) covering a full-image-wide ROI.

    A box can never be longer than the padded image's long side. With the
    extent-tier aliases (plan_pooling) the worst requirement is the 4x-top
    tier: max_side/(4*top_stride) + margin cells. A SMALL patch (P^2
    drives the per-ROI DMA bytes — 3x less traffic at 32 vs the 56-cell
    single-plane worst case at stride 32) then covers every legal box."""
    need = -(-max_image_size // (4 * top_stride)) + _EXTENT_MARGIN
    patch = max(-(-need // _ALIGN) * _ALIGN, 16, min(target, 32))
    return patch, True


def patch_size_for(max_image_size: int, top_stride: int) -> int:
    """Single-plane variant of :func:`plan_patch` (no extra levels)."""
    need = -(-max_image_size // top_stride) + _EXTENT_MARGIN
    return max(DEFAULT_PATCH, -(-need // _ALIGN) * _ALIGN)


class ROIPooler:
    """Config-bound pooler: holds static level/stride/output metadata."""

    def __init__(
        self,
        output_size: int,
        strides: Sequence[int],
        sampling_ratio: int,
        pooler_type: str = "ROIAlignV2",
        canonical_box_size: int = 224,
        canonical_level: int = 4,
        max_image_size: int = 0,
    ):
        assert pooler_type in ("ROIAlignV2", "ROIAlign"), pooler_type
        self.output_size = output_size
        self.strides = list(strides)
        self.sampling_ratio = sampling_ratio
        self.aligned = pooler_type == "ROIAlignV2"
        self.canonical_box_size = canonical_box_size
        self.canonical_level = canonical_level
        if max_image_size:
            self.patch_size, self.extent_tiers = plan_patch(
                max_image_size, self.strides[-1]
            )
        else:
            self.patch_size, self.extent_tiers = DEFAULT_PATCH, False

    def build_storage(self, features: List[jnp.ndarray]):
        """(storage, meta) for this pooler's layout — SHAREABLE with any
        pooler holding the same (strides, patch_size, extent_tiers), i.e.
        the box/mask/keypoint trio of one head."""
        return build_storage(
            features, self.strides, self.patch_size, self.extent_tiers
        )

    def pool(self, storage, meta, boxes: jnp.ndarray,
             valid: jnp.ndarray | None = None) -> jnp.ndarray:
        """ROIAlign from pre-built storage — batched [B, Htot, Wm, C] (the
        batch rides the Pallas grid; never jax.vmap this) or single-image.
        ``valid``: invalid slots skip their DMA and pool exact zeros."""
        return pool_from_storage(
            storage, meta, boxes, self.output_size, self.sampling_ratio,
            self.canonical_box_size, self.canonical_level, valid=valid,
        )

    def __call__(self, features: List[jnp.ndarray], boxes: jnp.ndarray,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
        """features: per-level [Hl, Wl, C] (single image); boxes [N, 4].

        The single-level (C4/DC5) case goes through the same storage/patch
        path: the old exact-XLA ``ops.roi_align`` fallback lowered to a
        vmapped-while gather that materialized a [B, H*W, C] f32 temp PER
        SELECT — 6.1 GB at the C4 serving shape (batch 8, res4 1024ch),
        an instant HBM OOM on v5e. Boxes whose span fits the patch pool
        exactly; longer ones use the 2x/4x extent-tier aliases."""
        storage, meta = self.build_storage(features)
        return self.pool(storage, meta, boxes, valid)
