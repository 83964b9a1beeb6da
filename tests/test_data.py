import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.data import build_dataloader, pick_bucket, transforms
from detectron2_tensorflow_tpu.data.coco import segmentation_to_mask


class SyntheticDataset:
    """Deterministic little detection dataset (drawn rectangles)."""

    def __init__(self, n=8, h=97, w=153, num_classes=3, with_masks=True,
                 seed=0, with_keypoints=False, box_range=(10, 30),
                 with_sem_seg=False):
        self.n, self.h, self.w = n, h, w
        self.box_range = box_range
        self.num_classes = num_classes
        self.with_masks = with_masks
        self.with_keypoints = with_keypoints
        self.with_sem_seg = with_sem_seg
        self.rng = np.random.default_rng(seed)
        self.samples = [self._make(i) for i in range(n)]
        # CocoDataset-compatible surface for the eval loop:
        self.images = [({"id": i, "file_name": f"{i}.jpg"}, []) for i in range(n)]

    def _make(self, i):
        rng = np.random.default_rng(i)
        img = rng.integers(0, 255, (self.h, self.w, 3), np.uint8)
        k = rng.integers(1, 4)
        boxes, classes, masks = [], [], []
        for _ in range(k):
            lo, hi = self.box_range
            x0, y0 = rng.uniform(0, self.w - hi), rng.uniform(0, self.h - hi)
            bw, bh = rng.uniform(lo, hi), rng.uniform(lo, hi)
            box = [x0, y0, min(x0 + bw, self.w), min(y0 + bh, self.h)]
            boxes.append(box)
            cls = int(rng.integers(0, self.num_classes))
            classes.append(cls)
            img[int(box[1]) : int(box[3]), int(box[0]) : int(box[2])] = (cls + 1) * 60
            m = np.zeros((self.h, self.w), np.float32)
            m[int(box[1]) : int(box[3]), int(box[0]) : int(box[2])] = 1
            masks.append(m)
        s = {
            "image": img,
            "image_id": i,
            "boxes": np.asarray(boxes, np.float32),
            "classes": np.asarray(classes, np.int32),
            "is_crowd": np.zeros(k, bool),
        }
        if self.with_masks:
            s["masks"] = np.stack(masks)
        if self.with_sem_seg:
            # Dense labels: background 0, each rectangle = class + 1
            # (later boxes overwrite earlier, matching the image paint).
            sem = np.zeros((self.h, self.w), np.int32)
            for b, c in zip(boxes, classes):
                sem[int(b[1]):int(b[3]), int(b[0]):int(b[2])] = c + 1
            s["sem_seg"] = sem
        if self.with_keypoints:
            # 4 keypoints per instance: box corners, all labeled visible.
            b = s["boxes"]
            s["keypoints"] = np.stack([
                np.stack([
                    [b[j, 0], b[j, 1], 2.0],
                    [b[j, 2], b[j, 1], 2.0],
                    [b[j, 0], b[j, 3], 2.0],
                    [b[j, 2], b[j, 3], 2.0],
                ]) for j in range(len(b))
            ]).astype(np.float32)
        return s

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in self.samples[i].items()}


def small_cfg():
    cfg = get_cfg()
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TRAIN = (64,)
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN = 128
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST = 64
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST = 128
    cfg.TRANSFORM.RESIZE.MINI_MASK_SIZE = 28
    cfg.INPUT.PAD_BUCKETS = ((64, 128), (128, 64))
    cfg.INPUT.MAX_GT_INSTANCES = 8
    cfg.SOLVER.IMS_PER_BATCH = 2
    return cfg


def test_flip_roundtrip():
    ds = SyntheticDataset(n=1)
    s = ds[0]
    f2 = transforms.flip_horizontal(transforms.flip_horizontal(s))
    np.testing.assert_array_equal(f2["image"], s["image"])
    np.testing.assert_allclose(f2["boxes"], s["boxes"])


def test_flip_moves_boxes_with_content():
    ds = SyntheticDataset(n=1)
    s = ds[0]
    f = transforms.flip_horizontal(s)
    # The object pixels must still be inside the flipped box.
    b = f["boxes"][0].astype(int)
    inner = f["image"][b[1] + 2 : b[3] - 2, b[0] + 2 : b[2] - 2]
    assert inner.std() < 1.0  # constant-colored rectangle interior


def test_rotate90_box_consistency():
    ds = SyntheticDataset(n=1)
    s = ds[0]
    r = transforms.rotate90(s, 1)
    assert r["image"].shape[:2] == (s["image"].shape[1], s["image"].shape[0])
    b = r["boxes"][0].astype(int)
    inner = r["image"][b[1] + 2 : b[3] - 2, b[0] + 2 : b[2] - 2]
    assert inner.std() < 1.0


def test_resize_shortest_edge_caps_max():
    s = {"image": np.zeros((100, 300, 3), np.uint8), "boxes": np.zeros((0, 4), np.float32)}
    out, scale = transforms.resize_shortest_edge(s, 80, 200)
    h, w = out["image"].shape[:2]
    assert max(h, w) <= 200
    assert abs(w - 200) <= 1


def test_mini_masks_roundtrip_quality():
    ds = SyntheticDataset(n=1)
    s = ds[0]
    mm = transforms.make_mini_masks(s["masks"], s["boxes"], 28)
    assert mm.shape == (len(s["boxes"]), 28, 28)
    assert mm.mean() > 0.8  # box-aligned rectangles fill their mini-masks


def test_pick_bucket():
    buckets = ((64, 128), (128, 64), (128, 128))
    assert pick_bucket(60, 100, buckets) == (64, 128)
    assert pick_bucket(100, 60, buckets) == (128, 64)
    assert pick_bucket(100, 100, buckets) == (128, 128)
    assert pick_bucket(500, 500, buckets) == (128, 128)  # fallback largest


def test_dataloader_shapes_and_masks():
    cfg = small_cfg()
    ds = SyntheticDataset()
    it = build_dataloader(cfg, ds, training=True, seed=0)
    batch = next(it)
    assert batch["image"].shape[0] == 2
    assert batch["image"].shape[1:] in ((64, 128, 3), (128, 64, 3))
    assert batch["gt_boxes"].shape == (2, 8, 4)
    assert batch["gt_masks"].shape == (2, 8, 28, 28)
    assert batch["gt_valid"].any()
    # boxes of valid GT are inside the resized image
    for i in range(2):
        v = batch["gt_valid"][i]
        h, w = batch["image_size"][i]
        assert batch["gt_boxes"][i][v][:, 2].max() <= w + 1e-3
        assert batch["gt_boxes"][i][v][:, 3].max() <= h + 1e-3


def test_dataloader_eval_covers_all_images_once():
    cfg = small_cfg()
    ds = SyntheticDataset()
    seen = []
    for batch in build_dataloader(cfg, ds, training=False, seed=0):
        for iid in batch["image_id"]:
            if iid >= 0:
                seen.append(int(iid))
    assert sorted(set(seen)) == list(range(len(ds)))


def test_coco_polygon_and_rle_decoding():
    # square polygon
    seg = [[2.0, 2.0, 10.0, 2.0, 10.0, 10.0, 2.0, 10.0]]
    m = segmentation_to_mask(seg, 12, 12)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert 60 <= m.sum() <= 90
    # uncompressed RLE: column-major runs
    rle = {"counts": [3, 2, 139], "size": [12, 12]}
    m2 = segmentation_to_mask(rle, 12, 12)
    assert m2.sum() == 2
    assert m2[3, 0] == 1 and m2[4, 0] == 1  # rows 3,4 of column 0


def _kp_sample(h=40, w=60):
    img = np.zeros((h, w, 3), np.uint8)
    boxes = np.array([[10.0, 8.0, 30.0, 28.0]], np.float32)
    kp = np.zeros((1, 17, 3), np.float32)
    kp[0, :, 0] = np.linspace(12, 28, 17)
    kp[0, :, 1] = np.linspace(10, 26, 17)
    kp[0, :, 2] = 2.0
    return {
        "image": img,
        "boxes": boxes,
        "classes": np.array([0], np.int32),
        "is_crowd": np.array([False]),
        "areas": np.array([400.0], np.float32),
        "keypoints": kp,
    }


def test_vertical_flip_moves_keypoints():
    from detectron2_tensorflow_tpu.data.transforms import flip_vertical

    s = _kp_sample()
    out = flip_vertical(s)
    h = s["image"].shape[0]
    np.testing.assert_allclose(out["keypoints"][0, :, 1], h - s["keypoints"][0, :, 1])
    np.testing.assert_allclose(out["keypoints"][0, :, 0], s["keypoints"][0, :, 0])
    # keypoints stay inside their transformed box
    b = out["boxes"][0]
    assert (out["keypoints"][0, :, 1] >= b[1] - 1e-3).all()
    assert (out["keypoints"][0, :, 1] <= b[3] + 1e-3).all()


def test_rotate90_moves_keypoints_with_boxes():
    from detectron2_tensorflow_tpu.data.transforms import rotate90

    s = _kp_sample()
    for k in (1, 2, 3):
        out = rotate90(s, k)
        b = out["boxes"][0]
        kp = out["keypoints"][0]
        assert (kp[:, 0] >= b[0] - 1e-3).all() and (kp[:, 0] <= b[2] + 1e-3).all()
        assert (kp[:, 1] >= b[1] - 1e-3).all() and (kp[:, 1] <= b[3] + 1e-3).all()
        # visibility preserved
        np.testing.assert_array_equal(kp[:, 2], s["keypoints"][0, :, 2])


def test_crop_shifts_and_filters_keypoints():
    from detectron2_tensorflow_tpu.data.transforms import _apply_crop

    s = _kp_sample()
    # Crop [5, 5, 35, 35): the box survives; keypoints shift by (-5, -5).
    out = _apply_crop(s, 5, 5, 35, 30, overlap_thresh=0.3)
    assert len(out["boxes"]) == 1
    assert out["keypoints"].shape[0] == 1
    np.testing.assert_allclose(out["keypoints"][0, :, 0], s["keypoints"][0, :, 0] - 5)
    np.testing.assert_allclose(out["keypoints"][0, :, 1], s["keypoints"][0, :, 1] - 5)
    assert len(out["areas"]) == 1

    # Crop that excludes the object entirely: everything filtered together.
    out2 = _apply_crop(s, 35, 30, 20, 10, overlap_thresh=0.3)
    assert len(out2["boxes"]) == 0
    assert out2["keypoints"].shape[0] == 0
    assert len(out2["areas"]) == 0

    # Keypoints landing outside a partial crop are marked invisible.
    out3 = _apply_crop(s, 0, 0, 20, 20, overlap_thresh=0.2)
    if len(out3["boxes"]):
        kp = out3["keypoints"][0]
        outside = (s["keypoints"][0, :, 0] >= 20) | (s["keypoints"][0, :, 1] >= 20)
        assert (kp[outside, 2] == 0).all()


def _tiny_coco_json(tmp_path, kp_counts):
    """One image per entry of ``kp_counts``; entry = labeled keypoints."""
    import json

    images, anns = [], []
    for i, nkp in enumerate(kp_counts):
        images.append(
            {"id": i, "file_name": f"{i}.jpg", "height": 40, "width": 60}
        )
        kp = []
        for k in range(17):
            kp += [10.0 + k, 12.0 + k, 2.0 if k < nkp else 0.0]
        anns.append(
            {
                "id": i + 1,
                "image_id": i,
                "category_id": 1,
                "bbox": [5.0, 5.0, 20.0, 20.0],
                "area": 400.0,
                "iscrowd": 0,
                "keypoints": kp,
                "num_keypoints": nkp,
            }
        )
    path = tmp_path / "kp.json"
    path.write_text(
        json.dumps(
            {
                "images": images,
                "annotations": anns,
                "categories": [{"id": 1, "name": "person"}],
            }
        )
    )
    return str(path)


def test_min_keypoints_filter(tmp_path):
    """MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE semantics: drop
    training images with fewer labeled (v>0) keypoints than the minimum
    (upstream-D2 filter; the reference defines the key but never reads it)."""
    from detectron2_tensorflow_tpu.data.coco import CocoDataset

    ann = _tiny_coco_json(tmp_path, kp_counts=[0, 1, 5, 17])
    assert len(CocoDataset(ann, str(tmp_path), load_masks=False)) == 4
    assert (
        len(CocoDataset(ann, str(tmp_path), load_masks=False, min_keypoints=1))
        == 3
    )
    ds = CocoDataset(ann, str(tmp_path), load_masks=False, min_keypoints=2)
    assert len(ds) == 2
    # The survivors are the 5- and 17-keypoint images, in order.
    assert [int(img["id"]) for img, _ in ds.images] == [2, 3]


def test_pad_buckets_must_match_size_divisibility():
    import pytest

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.config.finalize import finalize

    cfg = get_cfg()
    cfg.INPUT.PAD_BUCKETS = ((800, 1340),)  # 1340 % 32 != 0
    with pytest.raises(ValueError, match="SIZE_DIVISIBILITY"):
        finalize(cfg, training=False)
