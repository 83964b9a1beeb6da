#!/usr/bin/env python
"""Offline record building (reference: /root/reference/build_tfrecords.py).

COCO JSON + images -> sharded TFRecords per BUILD_RECORDS config.
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", required=True)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.data import CocoDataset
    from detectron2_tensorflow_tpu.data.records import build_records

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    root = cfg.BUILD_RECORDS.ROOT_DIR or cfg.DATASETS.ROOT_DIR
    load_masks = (
        cfg.BUILD_RECORDS.TYPE != "coco_det" or cfg.BUILD_RECORDS.INCLUDE_MASKS
    )
    panoptic = cfg.BUILD_RECORDS.TYPE == "coco_pano"
    for split, shards in (
        (cfg.DATASETS.TRAIN, cfg.BUILD_RECORDS.TRAIN_NUM_SHARDS),
        (cfg.DATASETS.VAL, cfg.BUILD_RECORDS.VAL_NUM_SHARDS),
    ):
        if panoptic:
            # Panoptic records (reference build_coco_pano.py:33-265):
            # <split>_panoptic.json + <split>_panoptic/ PNG id-maps.
            from detectron2_tensorflow_tpu.data.panoptic import CocoPanopticDataset

            ann = os.path.join(root, split + "_panoptic.json")
            if not os.path.isfile(ann):
                logging.warning("skipping %s (no %s)", split, ann)
                continue
            ds = CocoPanopticDataset(
                ann, os.path.join(root, split + "_panoptic"),
                os.path.join(root, split),
            )
        else:
            ann = os.path.join(root, split + ".json")
            if not os.path.isfile(ann):
                logging.warning("skipping %s (no %s)", split, ann)
                continue
            ds = CocoDataset(ann, os.path.join(root, split), load_masks=load_masks)
        out = os.path.join(cfg.DATASETS.ROOT_DIR, f"{split}.record")
        paths = build_records(ds, out, shards)
        logging.info("wrote %d shards for %s", len(paths), split)
        # Emit category_map.json (consumed by config finalize).
        if panoptic:
            cat_map = {
                "thing_classes": ds.thing_classes,
                "stuff_classes": ds.stuff_classes,
            }
        else:
            cat_map = {
                "thing_classes": ds.class_names,
                "contiguous_to_coco_id": ds.contiguous_to_cat_id,
            }
        with open(
            os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.CATEGORY_MAP_NAME), "w"
        ) as fp:
            json.dump(cat_map, fp)


if __name__ == "__main__":
    main()
