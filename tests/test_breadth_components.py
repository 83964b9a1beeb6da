import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.evaluation import (
    PanopticEvaluator,
    PascalVocEvaluator,
    draw_detections,
)


def test_panoptic_pq_perfect():
    ev = PanopticEvaluator({1: True, 2: False})
    gt = np.zeros((32, 32), np.int32)
    gt[4:16, 4:16] = 1  # thing segment id 1
    gt[20:30, 4:30] = 2  # stuff segment id 2
    segs = [
        {"id": 1, "category_id": 1},
        {"id": 2, "category_id": 2},
    ]
    ev.add_image(gt, segs, gt.copy(), [dict(s) for s in segs])
    m = ev.evaluate()
    assert abs(m["PQ"] - 100.0) < 1e-6
    assert abs(m["PQ_th"] - 100.0) < 1e-6
    assert abs(m["PQ_st"] - 100.0) < 1e-6


def test_panoptic_pq_miss_and_fp():
    ev = PanopticEvaluator({1: True})
    gt = np.zeros((16, 16), np.int32)
    gt[2:10, 2:10] = 1
    pred = np.zeros((16, 16), np.int32)
    pred[10:15, 10:15] = 1  # disjoint prediction: FP + FN
    ev.add_image(
        gt, [{"id": 1, "category_id": 1}], pred, [{"id": 1, "category_id": 1}]
    )
    m = ev.evaluate()
    assert m["PQ"] == 0.0


def test_panoptic_partial_iou():
    ev = PanopticEvaluator({1: True})
    gt = np.zeros((16, 16), np.int32)
    gt[0:8, 0:16] = 1  # area 128
    pred = np.zeros((16, 16), np.int32)
    pred[0:6, 0:16] = 1  # inter 96, union 128 -> IoU 0.75
    ev.add_image(
        gt, [{"id": 1, "category_id": 1}], pred, [{"id": 1, "category_id": 1}]
    )
    m = ev.evaluate()
    assert abs(m["SQ"] - 75.0) < 1e-4
    assert abs(m["RQ"] - 100.0) < 1e-4
    assert abs(m["PQ"] - 75.0) < 1e-4


def test_pascal_voc_ap_and_corloc():
    ev = PascalVocEvaluator(num_classes=2)
    gt = {
        "boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float64),
        "classes": np.array([0, 1]),
    }
    det = {
        "boxes": np.array([[0, 0, 10, 10], [100, 100, 120, 120]], np.float64),
        "scores": np.array([0.9, 0.8]),
        "classes": np.array([0, 1]),  # class 1 det is a miss
    }
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert abs(m["mAP"] - 50.0) < 1e-4  # class 0 perfect, class 1 zero
    assert abs(m["CorLoc"] - 50.0) < 1e-4


def test_pascal_voc_difficult_ignored():
    ev = PascalVocEvaluator(num_classes=1)
    gt = {
        "boxes": np.array([[0, 0, 10, 10]], np.float64),
        "classes": np.array([0]),
        "is_difficult": np.array([True]),
    }
    det = {
        "boxes": np.array([[0, 0, 10, 10]], np.float64),
        "scores": np.array([0.9]),
        "classes": np.array([0]),
    }
    ev.add_image(gt, det)
    m = ev.evaluate()
    # No countable GT at all -> no AP entry, mAP 0 by convention.
    assert m["mAP"] == 0.0


def test_pascal_voc_group_of_ignores_matched_detections():
    """group_of_weight=0 (reference default): a detection whose IoA with a
    group-of (crowd) box passes the threshold is neither TP nor FP, and the
    group-of box never counts as ground truth
    (reference per_image_evaluation.py:462-505, group-of stage)."""
    ev = PascalVocEvaluator(num_classes=1)
    gt = {
        "boxes": np.array([[0, 0, 10, 10], [50, 50, 150, 150]], np.float64),
        "classes": np.array([0, 0]),
        "is_group_of": np.array([False, True]),
    }
    det = {
        # det 2 is a small box fully inside the group-of box: IoU with it
        # is only 0.01 but IoA (inter / det area) is 1.0 -> group-matched.
        "boxes": np.array([[0, 0, 10, 10], [60, 60, 70, 70]], np.float64),
        "scores": np.array([0.9, 0.8]),
        "classes": np.array([0, 0]),
    }
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert abs(m["mAP"] - 100.0) < 1e-4  # the would-be FP was ignored


def test_pascal_voc_group_of_weight_fractional_fn():
    """group_of_weight>0: an UNMATCHED group-of box adds weight w to the
    GT count, acting as a fractional false negative (reference
    pascal_voc_evaluator.py:52-57 + _update_ground_truth_statistics)."""
    ev = PascalVocEvaluator(num_classes=1, group_of_weight=0.5)
    gt = {
        "boxes": np.array([[0, 0, 10, 10], [50, 50, 150, 150]], np.float64),
        "classes": np.array([0, 0]),
        "is_group_of": np.array([False, True]),
    }
    det = {  # only the normal box is detected
        "boxes": np.array([[0, 0, 10, 10]], np.float64),
        "scores": np.array([0.9]),
        "classes": np.array([0]),
    }
    ev.add_image(gt, det)
    m = ev.evaluate()
    # num_gt = 1 + 0.5; one perfect TP -> recall caps at 2/3, precision 1.
    assert abs(m["mAP"] - 100.0 * (1 / 1.5)) < 1e-4


def test_pascal_voc_group_of_weight_fractional_tp():
    """group_of_weight>0 with matches: the group-of box contributes ONE
    pseudo-detection at the BEST matched score with fractional TP credit w
    (reference per_image_evaluation.py:486-498: scores_group_of keeps the
    max; one entry per group-of box, not per matched detection)."""
    ev = PascalVocEvaluator(num_classes=1, group_of_weight=1.0)
    gt = {
        "boxes": np.array([[50, 50, 150, 150]], np.float64),
        "classes": np.array([0]),
        "is_group_of": np.array([True]),
    }
    det = {
        # two dets inside the group box (collapse to one pseudo-entry at
        # score 0.8) + one unmatched FP at score 0.9
        "boxes": np.array(
            [[60, 60, 70, 70], [80, 80, 95, 95], [300, 300, 320, 320]],
            np.float64,
        ),
        "scores": np.array([0.3, 0.8, 0.9]),
        "classes": np.array([0, 0, 0]),
    }
    ev.add_image(gt, det)
    m = ev.evaluate()
    # Entries sorted by score: FP@0.9 then pseudo-TP@0.8 (credit 1.0);
    # num_gt = 1.0 -> continuous-interpolation AP = 0.5. Two pseudo
    # entries (a dedupe bug) would push cum_tp past num_gt instead.
    assert abs(m["mAP"] - 50.0) < 1e-4


def test_pascal_voc_corloc_counts_group_of_and_difficult():
    """CorLoc follows the reference's separate rule (per_image_evaluation
    _compute_is_class_correctly_detected_in_image): the TOP-scoring
    detection against ALL class GT — group-of and difficult treated as
    normal boxes — and the denominator counts any image with class GT."""
    ev = PascalVocEvaluator(num_classes=1)
    # image A: only a group-of box; the top detection IoU-matches it
    ev.add_image(
        {
            "boxes": np.array([[0, 0, 100, 100]], np.float64),
            "classes": np.array([0]),
            "is_group_of": np.array([True]),
        },
        {
            "boxes": np.array([[0, 0, 100, 100]], np.float64),
            "scores": np.array([0.9]),
            "classes": np.array([0]),
        },
    )
    # image B: only a difficult box; top detection matches it too
    ev.add_image(
        {
            "boxes": np.array([[0, 0, 50, 50]], np.float64),
            "classes": np.array([0]),
            "is_difficult": np.array([True]),
        },
        {
            "boxes": np.array([[0, 0, 50, 50]], np.float64),
            "scores": np.array([0.8]),
            "classes": np.array([0]),
        },
    )
    # image C: a normal box the top detection misses
    ev.add_image(
        {
            "boxes": np.array([[0, 0, 20, 20]], np.float64),
            "classes": np.array([0]),
        },
        {
            "boxes": np.array([[200, 200, 260, 260]], np.float64),
            "scores": np.array([0.7]),
            "classes": np.array([0]),
        },
    )
    m = ev.evaluate()
    assert abs(m["CorLoc"] - 100.0 * (2 / 3)) < 1e-4


def test_draw_detections_runs():
    img = np.zeros((64, 64, 3), np.uint8)
    out = draw_detections(
        img,
        np.array([[4.0, 4.0, 30.0, 30.0]]),
        scores=np.array([0.9]),
        classes=np.array([2]),
        masks=np.ones((1, 64, 64), bool),
        class_names=["a", "b", "c"],
    )
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn


def test_dropblock():
    from detectron2_tensorflow_tpu.models.layers import DropBlock

    x = jnp.ones((2, 32, 32, 8))
    m = DropBlock(keep_prob=0.8, block_size=5)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=True)
    out = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    arr = np.asarray(out)
    assert (arr == 0).any()  # some blocks dropped
    assert abs(arr.mean() - 1.0) < 0.15  # renormalized expectation
    # eval mode: identity
    out_eval = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))


def test_tfrecords_roundtrip(tmp_path):
    from detectron2_tensorflow_tpu.data.records import TFRecordDataset, build_records
    from tests.test_data import SyntheticDataset

    ds = SyntheticDataset(n=4)
    paths = build_records(ds, str(tmp_path / "train.record"), num_shards=2)
    assert len(paths) == 2
    back = TFRecordDataset(str(tmp_path / "train.record-*"))
    assert len(back) == 4
    assert back.class_names is None  # no category_map.json sidecar yet
    import json as _json

    (tmp_path / "category_map.json").write_text(
        _json.dumps({"thing_classes": ["cat", "dog"]})
    )
    # Sidecar vocabulary feeds per-category AP (EVAL.INCLUDE_METRICS_PER_CATEGORY).
    assert TFRecordDataset(
        str(tmp_path / "train.record-*")
    ).class_names == ["cat", "dog"]
    ids = sorted(back[i]["image_id"] for i in range(4))
    assert ids == [0, 1, 2, 3]
    s0 = next(back[i] for i in range(4) if back[i]["image_id"] == 0)
    orig = ds[0]
    np.testing.assert_allclose(s0["boxes"], orig["boxes"], atol=0.51)
    np.testing.assert_array_equal(s0["classes"], orig["classes"])
    assert s0["masks"].shape == orig["masks"].shape
    # jpeg is lossy (and the synthetic background is per-pixel noise — the
    # worst case); the constant-colored object interior must survive well.
    b = orig["boxes"][0].astype(int)
    inner_err = np.abs(
        s0["image"][b[1] + 2 : b[3] - 2, b[0] + 2 : b[2] - 2].astype(int)
        - orig["image"][b[1] + 2 : b[3] - 2, b[0] + 2 : b[2] - 2].astype(int)
    ).mean()
    assert inner_err < 12, inner_err


def test_relation_module_permutation_consistency():
    """Attention must be content-based: permuting ROIs permutes outputs."""
    from detectron2_tensorflow_tpu.models.roi_heads.relation import (
        ObjectRelationModule,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 6, 32)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 100, (1, 6, 4)).astype(np.float32))
    boxes = jnp.concatenate(
        [jnp.minimum(boxes[..., :2], boxes[..., 2:]),
         jnp.maximum(boxes[..., :2], boxes[..., 2:])], -1,
    )
    m = ObjectRelationModule(features=32, num_groups=4, key_dim=8)
    v = m.init(jax.random.PRNGKey(0), x, boxes)
    out = m.apply(v, x, boxes)
    perm = jnp.array([3, 1, 5, 0, 2, 4])
    out_p = m.apply(v, x[:, perm], boxes[:, perm])
    np.testing.assert_allclose(
        np.asarray(out[:, perm]), np.asarray(out_p), atol=1e-4
    )


def test_panoptic_tfrecords_roundtrip(tmp_path):
    """Panoptic records: sem_seg id-map PNG (with -1 ignore) + instance
    fields round-trip through the shard writer (reference
    build_coco_pano.py:33-265)."""
    from detectron2_tensorflow_tpu.data.records import TFRecordDataset, build_records

    class PanoSet:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            h, w = 40, 60
            img = np.full((h, w, 3), 90, np.uint8)
            sem = np.full((h, w), -1, np.int32)
            sem[:20] = 0  # things region
            sem[20:, :30] = 3  # stuff class 3
            m = np.zeros((h, w), np.float32)
            m[2:18, 5:25] = 1
            return {
                "image": img,
                "image_id": i,
                "boxes": np.array([[5.0, 2.0, 25.0, 18.0]], np.float32),
                "classes": np.array([1], np.int32),
                "is_crowd": np.array([False]),
                "areas": np.array([320.0], np.float32),
                "masks": m[None],
                "sem_seg": sem,
            }

    paths = build_records(PanoSet(), str(tmp_path / "pano.record"), num_shards=1)
    back = TFRecordDataset(str(tmp_path / "pano.record-*"))
    s = back[0]
    orig = PanoSet()[0]
    np.testing.assert_array_equal(s["sem_seg"], orig["sem_seg"])  # incl. -1
    np.testing.assert_allclose(s["areas"], orig["areas"])
    np.testing.assert_allclose(s["boxes"], orig["boxes"], atol=0.51)
    assert s["masks"].shape == orig["masks"].shape


def test_draw_keypoints_panoptic_and_eval_image():
    from detectron2_tensorflow_tpu.evaluation.visualization import (
        draw_eval_image,
        draw_keypoints,
        draw_panoptic,
    )

    img = np.zeros((60, 80, 3), np.uint8)
    kps = np.zeros((1, 17, 3), np.float32)
    kps[0, :, 0] = np.linspace(10, 60, 17)
    kps[0, :, 1] = np.linspace(10, 50, 17)
    kps[0, :, 2] = 2
    out = draw_keypoints(img, kps, np.array([0.9]))
    assert out.shape == img.shape and out.sum() > 0

    pan = np.zeros((60, 80), np.int32)
    pan[10:30, 10:40] = 7
    out2 = draw_panoptic(img, pan, [{"id": 7, "category_id": 0}], ["cat"])
    assert out2.sum() > 0

    out3 = draw_eval_image(
        img,
        {
            "boxes": np.array([[5.0, 5.0, 30.0, 30.0]]),
            "scores": np.array([0.9]),
            "classes": np.array([0]),
            "keypoints": kps,
            "panoptic": pan,
            "segments": [{"id": 7, "category_id": 0}],
        },
        ["cat"],
    )
    assert out3.shape == img.shape and out3.sum() > 0


def test_duplicate_removal_targets_one_positive_per_gt():
    """Paper rule: per GT, the highest-scoring candidate with matching class
    at IoU >= thresh is the single positive."""
    from detectron2_tensorflow_tpu.models.roi_heads.relation import (
        duplicate_removal_targets,
    )

    # Three candidates on one GT (two class-0 high-IoU, one wrong class),
    # plus one candidate on a second GT and one invalid slot.
    cand_boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],   # IoU 1.0 with gt0, class 0, score .9
            [1.0, 0.0, 11.0, 10.0],   # IoU ~.82 with gt0, class 0, score .95
            [0.0, 0.0, 10.0, 10.0],   # class 1 -> ineligible for gt0
            [20.0, 20.0, 30.0, 30.0], # IoU 1.0 with gt1, class 2
            [0.0, 0.0, 10.0, 10.0],   # invalid slot
        ]
    )
    cand_classes = jnp.array([0, 0, 1, 2, 0])
    cand_scores = jnp.array([0.9, 0.95, 0.99, 0.5, 1.0])
    cand_valid = jnp.array([True, True, True, True, False])
    gt_boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    gt_classes = jnp.array([0, 2])
    gt_valid = jnp.array([True, True])
    t = duplicate_removal_targets(
        cand_boxes, cand_classes, cand_scores, cand_valid,
        gt_boxes, gt_classes, gt_valid, 0.5,
    )
    # Candidate 1 wins gt0 (higher score), candidate 3 wins gt1; the
    # wrong-class and invalid candidates stay negative.
    np.testing.assert_array_equal(np.asarray(t), [0.0, 1.0, 0.0, 1.0, 0.0])


def test_bench_mfu_helper():
    """bench.py's MFU diagnostic: flops/img * img_s / peak, None off-TPU or
    for unknown device kinds (the CPU backend here exercises the None path
    via the kind lookup)."""
    import sys

    sys.path.insert(0, ".")
    import bench

    class FakeCompiled:
        def cost_analysis(self):
            return {"flops": 450e9 * 8}  # 450 GFLOP/img at batch 8

    # CPU device kind is not in the peak table -> None.
    assert bench._mfu(FakeCompiled(), 150.0, 8) is None

    # Pin the arithmetic by faking the device kind lookup through the table.
    flops_per_img = 450e9
    peak = bench._PEAK_BF16_FLOPS["TPU v5e"]
    expected = round(flops_per_img * 150.0 / peak, 4)
    assert expected == round(450e9 * 150.0 / 394e12, 4)
