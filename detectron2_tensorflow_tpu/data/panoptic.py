"""COCO-panoptic dataset ingestion: panoptic PNG id-maps -> training GT.

Parity targets: /root/reference/lib/data_tools/build_coco_pano.py:33-265 and
lib/utils/id_utils.py:5-37 (RGB <-> id, base 256). Produces samples carrying
both instance GT (things) and the PanopticFPN-style semantic GT (stuff
classes contiguous from 1; all things merged into class 0; unlabeled ->
ignore).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import cv2
import numpy as np


def rgb_to_id(color: np.ndarray) -> np.ndarray:
    """[..., 3] uint8 panoptic PNG -> [...] int32 segment ids (base 256)."""
    color = color.astype(np.int32)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def id_to_rgb(ids: np.ndarray) -> np.ndarray:
    """[...] int segment ids -> [..., 3] uint8 (inverse of rgb_to_id)."""
    ids = ids.astype(np.int64)
    return np.stack(
        [ids % 256, (ids // 256) % 256, (ids // (256 * 256)) % 256], axis=-1
    ).astype(np.uint8)


class CocoPanopticDataset:
    """Panoptic JSON + PNG id-maps, joined with instance annotations.

    Yields samples with image / boxes / classes / masks (things) plus
    ``sem_seg`` [H, W] int32 (0 = things, 1..S = contiguous stuff ids,
    ignore_label elsewhere).
    """

    def __init__(
        self,
        panoptic_json: str,
        panoptic_root: str,
        image_root: str,
        ignore_label: int = -1,
    ):
        with open(panoptic_json) as f:
            pano = json.load(f)
        self.image_root = image_root
        self.panoptic_root = panoptic_root
        self.ignore_label = ignore_label

        things = sorted(
            c["id"] for c in pano["categories"] if c.get("isthing", 0)
        )
        stuff = sorted(
            c["id"] for c in pano["categories"] if not c.get("isthing", 0)
        )
        self.thing_contiguous = {cid: i for i, cid in enumerate(things)}
        # Stuff contiguous ids start at 1; 0 is the merged "thing" class.
        self.stuff_contiguous = {cid: i + 1 for i, cid in enumerate(stuff)}
        self.thing_classes = [
            c["name"] for c in sorted(
                (c for c in pano["categories"] if c.get("isthing", 0)),
                key=lambda c: c["id"],
            )
        ]
        self.stuff_classes = ["things"] + [
            c["name"] for c in sorted(
                (c for c in pano["categories"] if not c.get("isthing", 0)),
                key=lambda c: c["id"],
            )
        ]

        img_by_id = {i["id"]: i for i in pano["images"]}
        self.entries = [
            (img_by_id[a["image_id"]], a) for a in pano["annotations"]
        ]
        self.images = [(img_by_id[a["image_id"]], a) for a in pano["annotations"]]

    def __len__(self) -> int:
        return len(self.entries)

    def get_panoptic_gt(self, idx: int):
        """(gt_map [H, W] segment ids, segments list, categories {id: is_thing})
        at original resolution — for PQ evaluation."""
        img_info, ann = self.entries[idx]
        pan_png = cv2.imread(
            os.path.join(self.panoptic_root, ann["file_name"]), cv2.IMREAD_COLOR
        )
        pan_png = cv2.cvtColor(pan_png, cv2.COLOR_BGR2RGB)
        return rgb_to_id(pan_png), ann["segments_info"]

    def __getitem__(self, idx: int) -> Dict:
        img_info, ann = self.entries[idx]
        image = cv2.imread(os.path.join(self.image_root, img_info["file_name"]))
        if image is None:
            raise FileNotFoundError(img_info["file_name"])
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        h, w = image.shape[:2]

        pan_png = cv2.imread(
            os.path.join(self.panoptic_root, ann["file_name"]), cv2.IMREAD_COLOR
        )
        pan_png = cv2.cvtColor(pan_png, cv2.COLOR_BGR2RGB)
        seg_ids = rgb_to_id(pan_png)

        sem_seg = np.full((h, w), self.ignore_label, np.int32)
        boxes, classes, masks = [], [], []
        for seg in ann["segments_info"]:
            region = seg_ids == seg["id"]
            cat = seg["category_id"]
            if cat in self.thing_contiguous:
                sem_seg[region] = 0  # merged thing class for the semseg head
                if not seg.get("iscrowd", 0):
                    ys, xs = np.nonzero(region)
                    if len(ys) == 0:
                        continue
                    boxes.append(
                        [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
                    )
                    classes.append(self.thing_contiguous[cat])
                    masks.append(region.astype(np.float32))
            else:
                sem_seg[region] = self.stuff_contiguous[cat]

        n = len(boxes)
        return {
            "image": image,
            "image_id": img_info["id"],
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": np.asarray(classes, np.int32),
            "is_crowd": np.zeros(n, bool),
            "masks": np.stack(masks) if masks else np.zeros((0, h, w), np.float32),
            "sem_seg": sem_seg,
        }
