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
