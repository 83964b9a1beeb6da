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


# COCO person-keypoint skeleton (pairs of keypoint indices).
COCO_KP_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]


def draw_keypoints(
    image: np.ndarray,
    keypoints: np.ndarray,
    scores: Optional[np.ndarray] = None,
    score_thresh: float = 0.5,
    skeleton: Optional[Sequence[tuple]] = None,
    radius: int = 3,
) -> np.ndarray:
    """Draw [N, K, 3] (x, y, vis/score) keypoints + skeleton edges
    (reference visualization.py keypoint path)."""
    out = image.copy()
    skeleton = COCO_KP_SKELETON if skeleton is None else skeleton
    colors = _palette(len(keypoints) or 1)
    for i, kps in enumerate(keypoints):
        if scores is not None and float(scores[i]) < score_thresh:
            continue
        color = colors[i % len(colors)]
        vis = kps[:, 2] > 0
        for k in range(len(kps)):
            if vis[k]:
                cv2.circle(
                    out, (int(kps[k, 0]), int(kps[k, 1])), radius, color, -1,
                    cv2.LINE_AA,
                )
        for a, b in skeleton:
            if a < len(kps) and b < len(kps) and vis[a] and vis[b]:
                cv2.line(
                    out,
                    (int(kps[a, 0]), int(kps[a, 1])),
                    (int(kps[b, 0]), int(kps[b, 1])),
                    color, 1, cv2.LINE_AA,
                )
    return out


def draw_panoptic(
    image: np.ndarray,
    panoptic_map: np.ndarray,
    segments: Sequence[Dict],
    class_names: Optional[Sequence[str]] = None,
    alpha: float = 0.55,
) -> np.ndarray:
    """Overlay a panoptic segment-id map; each segment gets its own color,
    labeled at its centroid (reference visualization.py:62-241 panoptic
    drawing). ``segments``: dicts with ``id``, ``category_id``,
    (optional ``isthing``)."""
    out = image.copy()
    pan = panoptic_map
    if pan.shape != image.shape[:2]:
        pan = cv2.resize(
            pan.astype(np.int32), (image.shape[1], image.shape[0]),
            interpolation=cv2.INTER_NEAREST,
        )
    colors = _palette(max(len(segments), 1) + 1)
    overlay = out.astype(np.float32)
    labels = []
    for i, seg in enumerate(segments):
        m = pan == seg["id"]
        if not m.any():
            continue
        color = np.asarray(colors[i % len(colors)], np.float32)
        overlay[m] = overlay[m] * (1 - alpha) + color * alpha
        ys, xs = np.nonzero(m)
        cid = int(seg["category_id"])
        label = (
            class_names[cid]
            if class_names and 0 <= cid < len(class_names)
            else str(cid)
        )
        labels.append((label, int(xs.mean()), int(ys.mean())))
    out = overlay.astype(np.uint8)
    for label, cx, cy in labels:
        cv2.putText(
            out, label, (max(cx - 10, 0), cy), cv2.FONT_HERSHEY_SIMPLEX,
            0.45, (255, 255, 255), 1, cv2.LINE_AA,
        )
    return out


def draw_eval_image(
    image: np.ndarray,
    detection: Dict,
    class_names: Optional[Sequence[str]] = None,
    score_thresh: float = 0.5,
    num_sem_classes: int = 0,
) -> np.ndarray:
    """One-stop annotator for the eval loop's per-image detection dict
    (boxes/scores/classes + optional masks/keypoints/sem_seg/panoptic)."""
    out = image
    if detection.get("sem_seg") is not None and num_sem_classes:
        out = draw_sem_seg(out, detection["sem_seg"], num_sem_classes)
    if detection.get("panoptic") is not None:
        out = draw_panoptic(
            out, detection["panoptic"], detection.get("segments", ()),
            class_names,
        )
    if detection.get("boxes") is not None and len(detection["boxes"]):
        out = draw_detections(
            out,
            detection["boxes"],
            detection.get("scores"),
            detection.get("classes"),
            detection.get("masks"),
            class_names,
            score_thresh,
        )
    if detection.get("keypoints") is not None and len(detection["keypoints"]):
        out = draw_keypoints(
            out, detection["keypoints"], detection.get("scores"), score_thresh
        )
    return out
