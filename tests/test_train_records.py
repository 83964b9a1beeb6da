"""train.py input dispatch: DATASETS.TRAIN_FORMAT (records | coco_json | auto).

The reference trains exclusively from TFRecords (reference
lib/data/dataloader.py:69-112); this framework reads either records or COCO
JSON. Covers the auto-detection rule and that record-trained batches match
the JSON path sample-for-sample.
"""

import json
import os

import numpy as np

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.data import CocoDataset, build_dataloader
from detectron2_tensorflow_tpu.data.records import TFRecordDataset, build_records
from tools.make_synthetic_coco import make_split
from train import build_train_dataset


def _dataset_root(tmp_path):
    root = str(tmp_path)
    make_split(root, "train", 4, seed=0)
    ds = CocoDataset(os.path.join(root, "train.json"),
                     os.path.join(root, "train"))
    build_records(ds, os.path.join(root, "train.record"), num_shards=2)
    with open(os.path.join(root, "category_map.json"), "w") as f:
        json.dump({"thing_classes": ["square", "disk", "stripe"]}, f)
    return root, ds


def _cfg(root, fmt):
    cfg = get_cfg()
    cfg.DATASETS.ROOT_DIR = root
    cfg.DATASETS.TRAIN_FORMAT = fmt
    return cfg


def test_auto_prefers_records(tmp_path):
    root, _ = _dataset_root(tmp_path)
    assert isinstance(build_train_dataset(_cfg(root, "auto")), TFRecordDataset)
    assert isinstance(build_train_dataset(_cfg(root, "records")), TFRecordDataset)
    assert isinstance(build_train_dataset(_cfg(root, "coco_json")), CocoDataset)


def test_auto_falls_back_without_shards(tmp_path):
    root, _ = _dataset_root(tmp_path)
    for f in os.listdir(root):
        if ".record-" in f:
            os.remove(os.path.join(root, f))
    assert isinstance(build_train_dataset(_cfg(root, "auto")), CocoDataset)


def test_keypoint_models_stay_on_json(tmp_path):
    root, _ = _dataset_root(tmp_path)
    cfg = _cfg(root, "auto")
    cfg.MODEL.KEYPOINT_ON = True
    assert isinstance(build_train_dataset(cfg), CocoDataset)


def test_record_samples_match_json_path(tmp_path):
    root, coco_ds = _dataset_root(tmp_path)
    rec_ds = TFRecordDataset(os.path.join(root, "train.record-*"))
    assert len(rec_ds) == len(coco_ds)
    # Records shuffle round-robin across shards; match by image_id.
    by_id = {coco_ds[i]["image_id"]: coco_ds[i] for i in range(len(coco_ds))}
    for i in range(len(rec_ds)):
        r = rec_ds[i]
        c = by_id[r["image_id"]]
        np.testing.assert_array_equal(r["image"], c["image"])
        order = np.lexsort((r["boxes"][:, 0], r["boxes"][:, 1]))
        corder = np.lexsort((c["boxes"][:, 0], c["boxes"][:, 1]))
        np.testing.assert_allclose(
            r["boxes"][order], c["boxes"][corder], atol=0.51
        )
        np.testing.assert_array_equal(
            r["classes"][order], c["classes"][corder]
        )


def test_panoptic_arch_uses_panoptic_layout(tmp_path):
    import cv2
    import pytest

    from detectron2_tensorflow_tpu.data.panoptic import (
        CocoPanopticDataset,
        id_to_rgb,
    )

    root, _ = _dataset_root(tmp_path)
    # Minimal <TRAIN>_panoptic layout over the first synthetic image.
    os.makedirs(os.path.join(root, "train_panoptic"), exist_ok=True)
    seg = np.zeros((240, 320), np.int64)
    seg[4:20, 4:28] = 7
    cv2.imwrite(
        os.path.join(root, "train_panoptic", "000000.png"),
        cv2.cvtColor(id_to_rgb(seg), cv2.COLOR_RGB2BGR),
    )
    with open(os.path.join(root, "train_panoptic.json"), "w") as f:
        json.dump({
            "images": [
                {"id": 1, "file_name": "000000.jpg", "height": 240, "width": 320}
            ],
            "annotations": [{
                "image_id": 1, "file_name": "000000.png",
                "segments_info": [
                    {"id": 7, "category_id": 1, "iscrowd": 0, "area": 384}
                ],
            }],
            "categories": [
                {"id": 1, "name": "square", "isthing": 1},
                {"id": 10, "name": "bg", "isthing": 0},
            ],
        }, f)

    cfg = _cfg(root, "coco_json")
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    ds = build_train_dataset(cfg)
    assert isinstance(ds, CocoPanopticDataset)
    assert ds[0].get("sem_seg") is not None

    # Detection-only records cannot feed a semantic head: loud error.
    cfg = _cfg(root, "records")
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    with pytest.raises(ValueError, match="coco_pano"):
        build_train_dataset(cfg)


def test_eval_dataset_from_records(tmp_path):
    import importlib

    from detectron2_tensorflow_tpu.engine.evaluator import _index_of

    eval_mod = importlib.import_module("eval")
    root, coco_ds = _dataset_root(tmp_path)
    # _dataset_root writes train.* only; eval reads DATASETS.VAL.
    cfg = _cfg(root, "auto")
    cfg.DATASETS.VAL = "train"
    ds = eval_mod.build_eval_dataset(cfg)
    assert isinstance(ds, TFRecordDataset)
    # GT lookup by image_id (the evaluator's access pattern).
    for i in range(len(coco_ds)):
        iid = coco_ds[i]["image_id"]
        got = ds[_index_of(ds, iid)]
        assert got["image_id"] == iid
    cfg2 = _cfg(root, "coco_json")
    cfg2.DATASETS.VAL = "train"
    assert isinstance(eval_mod.build_eval_dataset(cfg2), CocoDataset)


def test_loader_runs_on_records(tmp_path):
    root, _ = _dataset_root(tmp_path)
    cfg = _cfg(root, "records")
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TRAIN = (64,)
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN = 128
    cfg.TRANSFORM.RESIZE.MINI_MASK_SIZE = 28
    cfg.INPUT.PAD_BUCKETS = ((64, 128), (128, 64))
    cfg.INPUT.MAX_GT_INSTANCES = 8
    cfg.SOLVER.IMS_PER_BATCH = 2
    ds = build_train_dataset(cfg)
    it = build_dataloader(cfg, ds, training=True, seed=0)
    batch = next(it)
    assert batch["image"].shape[0] == 2
    assert np.isfinite(batch["image"]).all()
    assert batch["gt_boxes"].shape[1] == 8
