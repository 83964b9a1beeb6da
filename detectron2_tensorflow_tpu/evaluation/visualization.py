"""Detection/segmentation visualization (host-side, cv2).

Parity target: /root/reference/lib/evaluation/visualization.py:62-531 (PIL
drawing for TensorBoard). Produces annotated numpy images for logging/
debugging.
"""

from __future__ import annotations

import colorsys
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np


def _palette(n: int) -> List[tuple]:
    return [
        tuple(
            int(255 * c)
            for c in colorsys.hsv_to_rgb((i * 0.618034) % 1.0, 0.7, 0.95)
        )
        for i in range(n)
    ]


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    scores: Optional[np.ndarray] = None,
    classes: Optional[np.ndarray] = None,
    masks: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    score_thresh: float = 0.5,
    num_colors: int = 80,
) -> np.ndarray:
    """Draw xyxy boxes (+labels, +binary masks) onto an RGB uint8 image."""
    out = image.copy()
    colors = _palette(num_colors)
    for i in range(len(boxes)):
        score = float(scores[i]) if scores is not None else 1.0
        if score < score_thresh:
            continue
        cls = int(classes[i]) if classes is not None else 0
        color = colors[cls % num_colors]
        x0, y0, x1, y1 = [int(round(v)) for v in boxes[i]]
        cv2.rectangle(out, (x0, y0), (x1, y1), color, 2)
        label = class_names[cls] if class_names and 0 <= cls < len(class_names) else str(cls)
        text = f"{label} {score:.2f}" if scores is not None else label
        cv2.putText(
            out, text, (x0, max(y0 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
            0.45, color, 1, cv2.LINE_AA,
        )
        if masks is not None and i < len(masks):
            m = masks[i].astype(bool)
            if m.shape != out.shape[:2]:
                m = cv2.resize(
                    m.astype(np.uint8), (out.shape[1], out.shape[0])
                ).astype(bool)
            overlay = out[m].astype(np.float32) * 0.5 + np.asarray(color) * 0.5
            out[m] = overlay.astype(np.uint8)
    return out


def draw_sem_seg(
    image: np.ndarray, sem_seg: np.ndarray, num_classes: int, alpha: float = 0.5
) -> np.ndarray:
    """Overlay a class-id map onto an RGB image."""
    colors = np.asarray(_palette(num_classes), np.uint8)
    seg = np.clip(sem_seg, 0, num_classes - 1)
    color_map = colors[seg]
    if color_map.shape[:2] != image.shape[:2]:
        color_map = cv2.resize(color_map, (image.shape[1], image.shape[0]))
    return (image.astype(np.float32) * (1 - alpha) + color_map * alpha).astype(
        np.uint8
    )
