"""Anchor generation, precomputed at trace time.

The reference regenerates anchors per step from feature shapes
(/root/reference/lib/modeling/anchor_generator.py:43-261). Under jit the
padded input shape is static, so anchors for each level are *constants* baked
into the compiled program — zero runtime cost.

Anchors are xyxy, centered on stride/2-aligned cell centers... actually D2
centers anchors at (stride*x, stride*y) offsets of the cell anchor which is
centered at the origin; the reference follows suit. We match D2: cell
anchors are centered at (0, 0), shifted by stride*i + 0 (i.e. grid offset 0),
giving identical coordinates to converted-weight expectations.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..utils import Registry

ANCHOR_GENERATOR_REGISTRY = Registry("ANCHOR_GENERATOR")


def _broadcast_params(params, num_levels):
    params = list(params)
    if len(params) == 1:
        return params * num_levels
    assert len(params) == num_levels, (params, num_levels)
    return params


def generate_cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """[len(sizes)*len(ratios), 4] xyxy anchors centered at (0, 0)."""
    anchors = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, np.float32)


@ANCHOR_GENERATOR_REGISTRY.register()
class DefaultAnchorGenerator:
    """Grid-shifted cell anchors per pyramid level (D2-compatible)."""

    def __init__(self, sizes, aspect_ratios, strides):
        num_levels = len(strides)
        sizes = _broadcast_params(sizes, num_levels)
        aspect_ratios = _broadcast_params(aspect_ratios, num_levels)
        self.strides = list(strides)
        self.cell_anchors = [
            generate_cell_anchors(s, a) for s, a in zip(sizes, aspect_ratios)
        ]

    @property
    def num_anchors_per_location(self) -> List[int]:
        return [len(c) for c in self.cell_anchors]

    def __call__(self, grid_sizes: Sequence[tuple[int, int]]) -> List[jnp.ndarray]:
        """grid_sizes: per-level (h, w). Returns per-level [h*w*A, 4] xyxy."""
        out = []
        for (gh, gw), stride, cell in zip(grid_sizes, self.strides, self.cell_anchors):
            shift_x = np.arange(gw, dtype=np.float32) * stride
            shift_y = np.arange(gh, dtype=np.float32) * stride
            sx, sy = np.meshgrid(shift_x, shift_y)
            shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
            anchors = (shifts + cell[None, :, :]).reshape(-1, 4)
            out.append(jnp.asarray(anchors))
        return out


@ANCHOR_GENERATOR_REGISTRY.register()
class YOLOAnchorGenerator:
    """YOLO-style: anchor shapes given in input pixels, one set per level,
    centered at cell centers (offset 0.5*stride); reference
    anchor_generator.py:165-261."""

    def __init__(self, sizes, strides):
        assert len(sizes) == len(strides)
        self.strides = list(strides)
        # sizes[i]: list of (w, h) pairs or flat sizes for level i
        self.cell_anchors = []
        for level_sizes in sizes:
            arr = np.asarray(level_sizes, np.float32).reshape(-1, 2)  # (w, h)
            half = arr / 2.0
            self.cell_anchors.append(
                np.concatenate([-half, half], axis=1)  # xyxy around origin
            )

    @property
    def num_anchors_per_location(self) -> List[int]:
        return [len(c) for c in self.cell_anchors]

    def __call__(self, grid_sizes):
        out = []
        for (gh, gw), stride, cell in zip(grid_sizes, self.strides, self.cell_anchors):
            shift_x = (np.arange(gw, dtype=np.float32) + 0.5) * stride
            shift_y = (np.arange(gh, dtype=np.float32) + 0.5) * stride
            sx, sy = np.meshgrid(shift_x, shift_y)
            shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
            out.append(jnp.asarray((shifts + cell[None]).reshape(-1, 4)))
        return out


def build_anchor_generator(cfg, input_shapes: Dict) -> DefaultAnchorGenerator:
    """From config + the ShapeSpecs of the features the anchors sit on."""
    name = cfg.MODEL.ANCHOR_GENERATOR.NAME
    strides = [s.stride for s in input_shapes]
    if name == "DefaultAnchorGenerator":
        return DefaultAnchorGenerator(
            sizes=cfg.MODEL.ANCHOR_GENERATOR.SIZES,
            aspect_ratios=cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
            strides=strides,
        )
    if name == "YOLOAnchorGenerator":
        return YOLOAnchorGenerator(
            sizes=cfg.MODEL.ANCHOR_GENERATOR.SIZES, strides=strides
        )
    return ANCHOR_GENERATOR_REGISTRY.get(name)(cfg, input_shapes)
