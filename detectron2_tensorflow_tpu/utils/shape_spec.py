"""Static shape metadata plumbed between model components at build time.

The reference threads per-feature shape dicts between backbone/neck/heads
(/root/reference/lib/layers/shape_spec.py:8-22). Under jit all shapes are
static, so this is plain Python metadata resolved once at module-construction
time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ShapeSpec:
    """Channels/spatial/stride metadata of a feature map (NHWC layout)."""

    channels: Optional[int] = None
    height: Optional[int] = None
    width: Optional[int] = None
    stride: Optional[int] = None
