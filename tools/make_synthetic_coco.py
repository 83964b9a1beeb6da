"""Generate a small synthetic COCO-format dataset on disk.

Produces `<root>/<split>/*.jpg`, `<root>/<split>.json` (COCO annotations
with polygon segmentations) and `<root>/category_map.json` — everything
train.py / eval.py / build_records.py need, with no external data. Images
are flat-noise backgrounds with solid axis-aligned rectangles and ellipses
whose class is encoded in their fill color, so a detector can overfit them
quickly (the learning-validation harness in tools/overfit_check.py /
tools/workflow_check.sh).

Usage: python tools/make_synthetic_coco.py ROOT [N_TRAIN] [N_VAL]
"""

from __future__ import annotations

import json
import os
import sys

import cv2
import numpy as np

CLASSES = ("square", "disk", "stripe")
H, W = 240, 320


def draw_instance(rng, img, cls):
    """Draw one instance; returns (bbox xywh, polygon, area)."""
    bw = int(rng.integers(40, 90))
    bh = int(rng.integers(40, 90))
    x0 = int(rng.integers(0, W - bw))
    y0 = int(rng.integers(0, H - bh))
    color = [(230, 60, 60), (60, 230, 60), (60, 60, 230)][cls]
    if cls == 0:  # square
        cv2.rectangle(img, (x0, y0), (x0 + bw, y0 + bh), color, -1)
        poly = [x0, y0, x0 + bw, y0, x0 + bw, y0 + bh, x0, y0 + bh]
        area = bw * bh
    elif cls == 1:  # disk
        cx, cy = x0 + bw // 2, y0 + bh // 2
        cv2.ellipse(img, (cx, cy), (bw // 2, bh // 2), 0, 0, 360, color, -1)
        poly = []
        for t in np.linspace(0, 2 * np.pi, 16, endpoint=False):
            poly += [cx + bw / 2 * np.cos(t), cy + bh / 2 * np.sin(t)]
        area = np.pi * (bw / 2) * (bh / 2)
    else:  # stripe (thin rectangle)
        bh2 = max(12, bh // 3)
        cv2.rectangle(img, (x0, y0), (x0 + bw, y0 + bh2), color, -1)
        poly = [x0, y0, x0 + bw, y0, x0 + bw, y0 + bh2, x0, y0 + bh2]
        bh = bh2
        area = bw * bh
    return [x0, y0, bw, bh], [float(v) for v in poly], float(area)


def make_split(root, split, n, seed):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, split)
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n):
        img = rng.integers(90, 130, (H, W, 3), np.uint8).copy()
        k = int(rng.integers(1, 4))
        for _ in range(k):
            cls = int(rng.integers(0, len(CLASSES)))
            bbox, poly, area = draw_instance(rng, img, cls)
            annotations.append({
                "id": ann_id,
                "image_id": i + 1,
                "category_id": cls + 1,
                "bbox": bbox,
                "area": area,
                "segmentation": [poly],
                "iscrowd": 0,
            })
            ann_id += 1
        name = f"{i:06d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), img[:, :, ::-1])
        images.append({"id": i + 1, "file_name": name, "height": H, "width": W})

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": c + 1, "name": n_} for c, n_ in enumerate(CLASSES)
        ],
    }
    with open(os.path.join(root, split + ".json"), "w") as f:
        json.dump(coco, f)
    return len(images), len(annotations)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synthetic_coco"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_val = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.makedirs(root, exist_ok=True)
    ni, na = make_split(root, "train", n_train, seed=0)
    vi, va = make_split(root, "val", n_val, seed=100)
    with open(os.path.join(root, "category_map.json"), "w") as f:
        json.dump({"thing_classes": list(CLASSES)}, f)
    print(json.dumps({"root": root, "train": [ni, na], "val": [vi, va]}))


if __name__ == "__main__":
    main()
