"""Host-side (numpy/cv2) sample transforms: augment -> resize -> mini-masks.

Functional rewrite of /root/reference/lib/data/transform.py (1299 LoC of TF
graph augmentation). The pipeline runs on the host CPU feeding fixed-shape
device buffers, so plain numpy + cv2 replace TF image ops. Inventory matches
the reference's AUGMENT config table (flips, rot90, pixel scale, brightness/
contrast/hue/saturation, distort-color, min-object-covered crop, box jitter)
plus the shortest-side resize with max cap and 56x56 mini-masks.

Samples are dicts: image uint8 [H, W, 3] RGB, boxes float [N, 4] xyxy abs,
classes int [N], is_crowd bool [N], masks float [N, H, W] (optional),
sem_seg int [H, W] (optional).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import cv2
import numpy as np


# -- geometry -----------------------------------------------------------------

# COCO person-keypoint left/right swap under horizontal flip.
COCO_KP_FLIP = [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]


def flip_horizontal(sample: Dict) -> Dict:
    h, w = sample["image"].shape[:2]
    out = dict(sample)
    out["image"] = sample["image"][:, ::-1]
    if len(sample.get("boxes", ())):
        b = sample["boxes"].copy()
        b[:, [0, 2]] = w - b[:, [2, 0]]
        out["boxes"] = b
    if sample.get("proposals") is not None and len(sample["proposals"]):
        pr = sample["proposals"].copy()
        pr[:, [0, 2]] = w - pr[:, [2, 0]]
        out["proposals"] = pr
    if sample.get("keypoints") is not None and len(sample["keypoints"]):
        kp = sample["keypoints"].copy()
        kp[..., 0] = np.where(kp[..., 2] > 0, w - kp[..., 0], kp[..., 0])
        if kp.shape[1] == len(COCO_KP_FLIP):
            kp = kp[:, COCO_KP_FLIP]
        out["keypoints"] = kp
    if sample.get("masks") is not None:
        out["masks"] = sample["masks"][:, :, ::-1]
    if sample.get("sem_seg") is not None:
        out["sem_seg"] = sample["sem_seg"][:, ::-1]
    return out


def flip_vertical(sample: Dict) -> Dict:
    h, w = sample["image"].shape[:2]
    out = dict(sample)
    out["image"] = sample["image"][::-1]
    if len(sample.get("boxes", ())):
        b = sample["boxes"].copy()
        b[:, [1, 3]] = h - b[:, [3, 1]]
        out["boxes"] = b
    if sample.get("proposals") is not None and len(sample["proposals"]):
        pr = sample["proposals"].copy()
        pr[:, [1, 3]] = h - pr[:, [3, 1]]
        out["proposals"] = pr
    if sample.get("keypoints") is not None and len(sample["keypoints"]):
        # Vertical flip has no COCO left/right keypoint swap analogue (the
        # skeleton is left/right symmetric, not top/bottom); only mirror y.
        kp = sample["keypoints"].copy()
        kp[..., 1] = np.where(kp[..., 2] > 0, h - kp[..., 1], kp[..., 1])
        out["keypoints"] = kp
    if sample.get("masks") is not None:
        out["masks"] = sample["masks"][:, ::-1]
    if sample.get("sem_seg") is not None:
        out["sem_seg"] = sample["sem_seg"][::-1]
    return out


def rotate90(sample: Dict, k: int = 1) -> Dict:
    """Rotate CCW by k*90 degrees (numpy rot90 convention)."""
    k = k % 4
    if k == 0:
        return sample
    h, w = sample["image"].shape[:2]
    out = dict(sample)
    out["image"] = np.ascontiguousarray(np.rot90(sample["image"], k))
    if sample.get("masks") is not None:
        out["masks"] = np.ascontiguousarray(np.rot90(sample["masks"], k, axes=(1, 2)))
    if sample.get("sem_seg") is not None:
        out["sem_seg"] = np.ascontiguousarray(np.rot90(sample["sem_seg"], k))
    for key in ("boxes", "proposals"):
        if not len(sample.get(key, ())):
            continue
        b = sample[key]
        rh, rw = h, w
        for _ in range(k):
            # CCW 90: point (x, y) -> (y, w - x) in the rotated (w, h) image.
            x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            b = np.stack([y0, rw - x1, y1, rw - x0], axis=1)
            rh, rw = rw, rh
        out[key] = b.astype(np.float32)
    if sample.get("keypoints") is not None and len(sample["keypoints"]):
        kp = sample["keypoints"].copy()
        rh, rw = h, w
        for _ in range(k):
            x = kp[..., 0].copy()
            kp[..., 0] = kp[..., 1]
            kp[..., 1] = rw - x
            rh, rw = rw, rh
        invis = sample["keypoints"][..., 2] <= 0
        kp[..., 0] = np.where(invis, sample["keypoints"][..., 0], kp[..., 0])
        kp[..., 1] = np.where(invis, sample["keypoints"][..., 1], kp[..., 1])
        out["keypoints"] = kp
    return out


def resize_shortest_edge(
    sample: Dict, min_size: int, max_size: int
) -> Tuple[Dict, float]:
    """Scale so the short side is min_size, capped so the long side <=
    max_size (reference transform.py:1170-1198). Returns (sample, scale)."""
    h, w = sample["image"].shape[:2]
    if min_size <= 0:
        return sample, 1.0
    scale = min_size / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = dict(sample)
    out["image"] = cv2.resize(sample["image"], (nw, nh), interpolation=cv2.INTER_LINEAR)
    if len(sample.get("boxes", ())):
        out["boxes"] = sample["boxes"] * np.array(
            [nw / w, nh / h, nw / w, nh / h], np.float32
        )
    if sample.get("proposals") is not None and len(sample["proposals"]):
        out["proposals"] = sample["proposals"] * np.array(
            [nw / w, nh / h, nw / w, nh / h], np.float32
        )
    if sample.get("keypoints") is not None and len(sample["keypoints"]):
        kp = sample["keypoints"].copy()
        kp[..., 0] *= nw / w
        kp[..., 1] *= nh / h
        out["keypoints"] = kp
    if sample.get("masks") is not None and len(sample["masks"]):
        out["masks"] = np.stack(
            [
                cv2.resize(m.astype(np.float32), (nw, nh), interpolation=cv2.INTER_LINEAR)
                for m in sample["masks"]
            ]
        )
    if sample.get("sem_seg") is not None:
        out["sem_seg"] = cv2.resize(
            sample["sem_seg"].astype(np.int32),
            (nw, nh),
            interpolation=cv2.INTER_NEAREST,
        )
    return out, scale


# -- photometric ---------------------------------------------------------------

def pixel_value_scale(sample, rng, min_value=0.9, max_value=1.1):
    out = dict(sample)
    out["image"] = np.clip(
        sample["image"].astype(np.float32) * rng.uniform(min_value, max_value), 0, 255
    ).astype(np.uint8)
    return out


def adjust_brightness(sample, rng, max_delta=0.2):
    delta = rng.uniform(-max_delta, max_delta) * 255.0
    out = dict(sample)
    out["image"] = np.clip(sample["image"].astype(np.float32) + delta, 0, 255).astype(
        np.uint8
    )
    return out


def adjust_contrast(sample, rng, min_delta=0.8, max_delta=1.25):
    f = rng.uniform(min_delta, max_delta)
    img = sample["image"].astype(np.float32)
    mean = img.mean(axis=(0, 1), keepdims=True)
    out = dict(sample)
    out["image"] = np.clip((img - mean) * f + mean, 0, 255).astype(np.uint8)
    return out


def adjust_hue(sample, rng, max_delta=0.02):
    delta = rng.uniform(-max_delta, max_delta) * 180.0  # cv2 hue range [0,180)
    hsv = cv2.cvtColor(sample["image"], cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 0] = (hsv[..., 0] + delta) % 180.0
    out = dict(sample)
    out["image"] = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return out


def adjust_saturation(sample, rng, min_delta=0.8, max_delta=1.25):
    f = rng.uniform(min_delta, max_delta)
    hsv = cv2.cvtColor(sample["image"], cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * f, 0, 255)
    out = dict(sample)
    out["image"] = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return out


def distort_color(sample, rng, color_ordering=0):
    """Composite brightness/saturation/hue/contrast chain (two orderings),
    mirroring the reference's distort_color dispatch."""
    if color_ordering % 2 == 0:
        sample = adjust_brightness(sample, rng)
        sample = adjust_saturation(sample, rng)
        sample = adjust_hue(sample, rng)
        sample = adjust_contrast(sample, rng)
    else:
        sample = adjust_brightness(sample, rng)
        sample = adjust_contrast(sample, rng)
        sample = adjust_saturation(sample, rng)
        sample = adjust_hue(sample, rng)
    return sample


# -- box / crop ------------------------------------------------------------------

def jitter_boxes(sample, rng, ratio=0.05):
    if not len(sample.get("boxes", ())):
        return sample
    b = sample["boxes"]
    wh = np.stack([b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=1)
    noise = rng.uniform(-ratio, ratio, (len(b), 4)) * np.concatenate([wh, wh], axis=1)
    out = dict(sample)
    h, w = sample["image"].shape[:2]
    jittered = b + noise.astype(np.float32)
    out["boxes"] = np.clip(jittered, 0, [w, h, w, h]).astype(np.float32)
    return out


def random_crop(
    sample,
    rng,
    min_object_covered=1.0,
    aspect_ratio_range=(0.75, 1.33),
    area_range=(0.1, 1.0),
    overlap_thresh=0.3,
    random_coef=0.0,
    max_attempts=100,
):
    """Strict random crop with minimum-object-coverage sampling
    (reference transform.py crop); instances whose center leaves the crop or
    whose visible fraction < overlap_thresh are dropped."""
    if rng.uniform() < random_coef:
        return sample
    h, w = sample["image"].shape[:2]
    boxes = sample.get("boxes")
    for _ in range(max_attempts):
        ar = math.exp(rng.uniform(math.log(aspect_ratio_range[0]), math.log(aspect_ratio_range[1])))
        area = rng.uniform(area_range[0], area_range[1]) * h * w
        cw = int(round(math.sqrt(area * ar)))
        ch = int(round(math.sqrt(area / ar)))
        if cw > w or ch > h or cw < 1 or ch < 1:
            continue
        cx = rng.integers(0, w - cw + 1)
        cy = rng.integers(0, h - ch + 1)
        if boxes is not None and len(boxes) and min_object_covered > 0:
            ix0 = np.maximum(boxes[:, 0], cx)
            iy0 = np.maximum(boxes[:, 1], cy)
            ix1 = np.minimum(boxes[:, 2], cx + cw)
            iy1 = np.minimum(boxes[:, 3], cy + ch)
            inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            cover = inter / np.maximum(areas, 1e-6)
            if cover.max(initial=0.0) < min_object_covered:
                continue
        return _apply_crop(sample, cx, cy, cw, ch, overlap_thresh)
    return sample


def _apply_crop(sample, cx, cy, cw, ch, overlap_thresh):
    out = dict(sample)
    out["image"] = sample["image"][cy : cy + ch, cx : cx + cw]
    if sample.get("sem_seg") is not None:
        out["sem_seg"] = sample["sem_seg"][cy : cy + ch, cx : cx + cw]
    boxes = sample.get("boxes")
    if boxes is None or not len(boxes):
        return out
    shifted = boxes - np.array([cx, cy, cx, cy], np.float32)
    clipped = np.clip(shifted, 0, [cw, ch, cw, ch]).astype(np.float32)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    vis = (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])
    keep = vis / np.maximum(areas, 1e-6) >= overlap_thresh
    out["boxes"] = clipped[keep]
    out["classes"] = sample["classes"][keep]
    out["is_crowd"] = sample["is_crowd"][keep]
    if sample.get("areas") is not None and len(sample["areas"]) == len(boxes):
        out["areas"] = sample["areas"][keep]
    if sample.get("masks") is not None and len(sample["masks"]):
        out["masks"] = sample["masks"][keep][:, cy : cy + ch, cx : cx + cw]
    if sample.get("proposals") is not None and len(sample["proposals"]):
        pr = sample["proposals"] - np.array([cx, cy, cx, cy], np.float32)
        out["proposals"] = np.clip(pr, 0, [cw, ch, cw, ch]).astype(np.float32)
    if sample.get("keypoints") is not None and len(sample["keypoints"]) == len(boxes):
        kp = sample["keypoints"].copy()
        kp[..., 0] -= cx
        kp[..., 1] -= cy
        inside = (
            (kp[..., 0] >= 0) & (kp[..., 0] < cw)
            & (kp[..., 1] >= 0) & (kp[..., 1] < ch)
        )
        kp[..., 2] = np.where(inside, kp[..., 2], 0.0)
        out["keypoints"] = kp[keep]
    return out


# -- mini masks ------------------------------------------------------------------

def make_mini_masks(masks: np.ndarray, boxes: np.ndarray, size: int) -> np.ndarray:
    """Crop each full-image mask to its box and resize to [size, size]
    (reference transform.py:1245-1266). Empty input -> [0, size, size]."""
    out = np.zeros((len(boxes), size, size), np.float32)
    for i, (m, b) in enumerate(zip(masks, boxes)):
        x0, y0, x1, y1 = (int(math.floor(b[0])), int(math.floor(b[1])),
                          int(math.ceil(b[2])), int(math.ceil(b[3])))
        x1 = max(x1, x0 + 1)
        y1 = max(y1, y0 + 1)
        x0 = max(x0, 0)
        y0 = max(y0, 0)
        crop = m[y0:y1, x0:x1].astype(np.float32)
        if crop.size == 0:
            continue
        out[i] = cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)
    return out


# -- pipeline ----------------------------------------------------------------------

def run(cfg, sample: Dict, training: bool, rng: Optional[np.random.Generator] = None):
    """Full per-sample pipeline: augment (train only) -> resize -> mini-masks.

    Returns (sample, scale). Boxes stay absolute-pixel xyxy in the resized
    frame (reference transform.py:1272-1299 contract).
    """
    rng = rng if rng is not None else np.random.default_rng()
    a = cfg.AUGMENT
    if training:
        if a.CROP.ENABLED:
            sample = random_crop(
                sample, rng,
                a.CROP.MIN_OBJECT_COVERED, tuple(a.CROP.ASPECT_RATIO_RANGE),
                tuple(a.CROP.AREA_RANGE), a.CROP.OVERLAP_THRESH, a.CROP.RANDOM_COEF,
            )
        if a.HORIZONTAL_FLIP and rng.uniform() < 0.5:
            sample = flip_horizontal(sample)
        if a.VERTICAL_FLIP and rng.uniform() < 0.5:
            sample = flip_vertical(sample)
        if a.ROTATE and rng.uniform() < 0.5:
            k = rng.choice([1, 3]) if a.ROTATE_BOTH_DIRECTION else 1
            sample = rotate90(sample, int(k))
        if a.PIXEL_VALUE_SCALE.ENABLED:
            sample = pixel_value_scale(
                sample, rng, a.PIXEL_VALUE_SCALE.MIN_VALUE, a.PIXEL_VALUE_SCALE.MAX_VALUE
            )
        if a.ADJUST_BRIGHTNESS.ENABLED:
            sample = adjust_brightness(sample, rng, a.ADJUST_BRIGHTNESS.MAX_DELTA)
        if a.ADJUST_CONSTRACT.ENABLED:
            sample = adjust_contrast(
                sample, rng, a.ADJUST_CONSTRACT.MIN_DELTA, a.ADJUST_CONSTRACT.MAX_DELTA
            )
        if a.ADJUST_HUE.ENABLED:
            sample = adjust_hue(sample, rng, a.ADJUST_HUE.MAX_DELTA)
        if a.ADJUST_SATURATION.ENABLED:
            sample = adjust_saturation(
                sample, rng, a.ADJUST_SATURATION.MIN_DELTA, a.ADJUST_SATURATION.MAX_DELTA
            )
        if a.DISTORT_COLOR.ENABLED:
            sample = distort_color(sample, rng, a.DISTORT_COLOR.COLOR_ORDERING)
        if a.JITTER_BOX.ENABLED:
            sample = jitter_boxes(sample, rng, a.JITTER_BOX.RATIO)

    r = cfg.TRANSFORM.RESIZE
    if training:
        min_size = int(rng.choice(list(r.MIN_SIZE_TRAIN)))
        max_size = r.MAX_SIZE_TRAIN
    else:
        min_size, max_size = r.MIN_SIZE_TEST, r.MAX_SIZE_TEST
    sample, scale = resize_shortest_edge(sample, min_size, max_size)

    if sample.get("masks") is not None and r.USE_MINI_MASKS:
        masks = sample["masks"]
        if len(masks):
            sample = dict(sample)
            sample["masks"] = make_mini_masks(
                masks, sample["boxes"], r.MINI_MASK_SIZE
            )
        else:
            sample = dict(sample)
            sample["masks"] = np.zeros(
                (0, r.MINI_MASK_SIZE, r.MINI_MASK_SIZE), np.float32
            )
    return sample, scale


def run_gt_native(cfg, sample: Dict, rng: np.random.Generator):
    """GT-only counterpart of :func:`run` for the native training IO path.

    The image pixels are decoded / resized / flipped by native/imageio.cpp;
    this applies the SAME geometry to the GT fields. Flip-at-original-size
    followed by scaling is algebraically identical to
    ``flip_horizontal`` + ``resize_shortest_edge``:
    ``(w - x) * nw / w == nw - x * nw / w``.

    Eligibility (checked by data/loader.native_train_supported): the only
    active augmentations are HORIZONTAL_FLIP and the resize itself, and
    masks (if any) use mini-mask targets.

    Returns ``(sample, min_size, flip, (nh, nw))`` — the first three feed
    the native image batch call.
    """
    h, w = sample["original_size"]
    a = cfg.AUGMENT
    flip = bool(a.HORIZONTAL_FLIP) and rng.uniform() < 0.5

    r = cfg.TRANSFORM.RESIZE
    min_size = int(rng.choice(list(r.MIN_SIZE_TRAIN)))
    max_size = r.MAX_SIZE_TRAIN
    if min_size > 0:
        scale = min_size / min(h, w)
        if max(h, w) * scale > max_size:
            scale = max_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
    else:
        nh, nw = h, w

    out = dict(sample)
    sxy = np.array([nw / w, nh / h, nw / w, nh / h], np.float32)
    if len(sample.get("boxes", ())):
        b = sample["boxes"].copy()
        if flip:
            b[:, [0, 2]] = w - b[:, [2, 0]]
        out["boxes"] = b * sxy
    if sample.get("keypoints") is not None and len(sample["keypoints"]):
        kp = sample["keypoints"].copy()
        if flip:
            kp[..., 0] = np.where(kp[..., 2] > 0, w - kp[..., 0], kp[..., 0])
            if kp.shape[1] == len(COCO_KP_FLIP):
                kp = kp[:, COCO_KP_FLIP]
        kp[..., 0] *= nw / w
        kp[..., 1] *= nh / h
        out["keypoints"] = kp

    if sample.get("masks") is not None and r.USE_MINI_MASKS:
        from . import native_io

        if len(sample["masks"]):
            out["masks"] = native_io.mini_masks(
                sample["masks"], (nh, nw), flip, out["boxes"],
                r.MINI_MASK_SIZE,
            )
        else:
            out["masks"] = np.zeros(
                (0, r.MINI_MASK_SIZE, r.MINI_MASK_SIZE), np.float32
            )
    return out, min_size, flip, (nh, nw)
