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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


STUFF = ("floor", "sky")  # category ids 10, 11; panoptic splits only


def make_panoptic_split(root, split, n, seed):
    """COCO-panoptic layout over the same drawing vocabulary:
    `<split>_panoptic.json` + `<split>_panoptic/*.png` id-maps (plus the
    plain images under `<split>/`). Background = 'floor' stuff, top band =
    'sky' stuff, shapes = thing segments."""
    from detectron2_tensorflow_tpu.data.panoptic import id_to_rgb

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, split)
    pan_dir = os.path.join(root, split + "_panoptic")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pan_dir, exist_ok=True)
    images, annotations = [], []
    for i in range(n):
        img = rng.integers(90, 130, (H, W, 3), np.uint8).copy()
        sky_h = int(rng.integers(30, 70))
        img[:sky_h] = (200, 210, 235)
        seg = np.zeros((H, W), np.int64)
        seg[:] = 1  # floor
        seg[:sky_h] = 2  # sky
        segments = [
            {"id": 1, "category_id": 10, "iscrowd": 0,
             "area": int((seg == 1).sum())},
            {"id": 2, "category_id": 11, "iscrowd": 0,
             "area": int((seg == 2).sum())},
        ]
        k = int(rng.integers(1, 4))
        for j in range(k):
            cls = int(rng.integers(0, len(CLASSES)))
            before = img.copy()
            _bbox, _poly, _area = draw_instance(rng, img, cls)
            # The id-map region is exactly the pixels this draw changed
            # (earlier same-color instances stay with their own ids).
            region = (img != before).any(axis=2)
            sid = 10 + j
            seg[region] = sid
            segments.append({
                "id": sid, "category_id": cls + 1, "iscrowd": 0,
                "area": int(region.sum()),
            })
        # Fix stuff areas after occlusion by things.
        segments[0]["area"] = int((seg == 1).sum())
        segments[1]["area"] = int((seg == 2).sum())
        name = f"{i:06d}"
        cv2.imwrite(os.path.join(img_dir, name + ".jpg"), img[:, :, ::-1])
        cv2.imwrite(
            os.path.join(pan_dir, name + ".png"),
            cv2.cvtColor(id_to_rgb(seg), cv2.COLOR_RGB2BGR),
        )
        images.append(
            {"id": i + 1, "file_name": name + ".jpg", "height": H, "width": W}
        )
        annotations.append({
            "image_id": i + 1, "file_name": name + ".png",
            "segments_info": segments,
        })

    pano = {
        "images": images,
        "annotations": annotations,
        "categories": (
            [{"id": c + 1, "name": n_, "isthing": 1}
             for c, n_ in enumerate(CLASSES)]
            + [{"id": 10 + c, "name": n_, "isthing": 0}
               for c, n_ in enumerate(STUFF)]
        ),
    }
    with open(os.path.join(root, split + "_panoptic.json"), "w") as f:
        json.dump(pano, f)
    return len(images)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synthetic_coco"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_val = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    panoptic = "--panoptic" in sys.argv
    os.makedirs(root, exist_ok=True)
    if panoptic:
        ni = make_panoptic_split(root, "train", n_train, seed=0)
        vi = make_panoptic_split(root, "val", n_val, seed=100)
        with open(os.path.join(root, "category_map.json"), "w") as f:
            json.dump({
                "thing_classes": list(CLASSES),
                "stuff_classes": ["things"] + list(STUFF),
            }, f)
        print(json.dumps({"root": root, "panoptic": True,
                          "train": ni, "val": vi}))
        return
    ni, na = make_split(root, "train", n_train, seed=0)
    vi, va = make_split(root, "val", n_val, seed=100)
    with open(os.path.join(root, "category_map.json"), "w") as f:
        json.dump({"thing_classes": list(CLASSES)}, f)
    print(json.dumps({"root": root, "train": [ni, na], "val": [vi, va]}))


if __name__ == "__main__":
    main()
