import numpy as np

from detectron2_tensorflow_tpu.evaluation import (
    CocoEvaluator,
    SemSegEvaluator,
    paste_masks,
)


def _img_gt(boxes, classes, crowd=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    return {
        "boxes": boxes,
        "classes": np.asarray(classes),
        "is_crowd": np.asarray(crowd if crowd is not None else [False] * len(boxes)),
    }


def _det(boxes, scores, classes):
    return {
        "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
        "scores": np.asarray(scores, np.float64),
        "classes": np.asarray(classes),
    }


def test_perfect_detections_give_ap_100():
    ev = CocoEvaluator(num_classes=3, iou_type="bbox")
    for _ in range(4):
        gt = _img_gt([[10, 10, 50, 50], [60, 60, 90, 95]], [0, 2])
        det = _det([[10, 10, 50, 50], [60, 60, 90, 95]], [0.9, 0.8], [0, 2])
        ev.add_image(gt, det)
    m = ev.evaluate()
    assert abs(m["AP"] - 100.0) < 1e-6, m
    assert abs(m["AP50"] - 100.0) < 1e-6
    assert abs(m["AR@100"] - 100.0) < 1e-6


def test_missed_half_gives_half_recall():
    ev = CocoEvaluator(num_classes=1, iou_type="bbox")
    gt = _img_gt([[10, 10, 50, 50], [100, 100, 150, 150]], [0, 0])
    det = _det([[10, 10, 50, 50]], [0.9], [0])  # one of two found
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert abs(m["AR@100"] - 50.0) < 1e-6
    # AP = mean precision over recall grid; precision 1.0 up to recall 0.5
    assert 45.0 < m["AP"] < 55.0


def test_false_positive_lowers_ap50():
    ev = CocoEvaluator(num_classes=1, iou_type="bbox")
    gt = _img_gt([[10, 10, 50, 50]], [0])
    # High-scoring FP ahead of the TP.
    det = _det([[200, 200, 240, 240], [10, 10, 50, 50]], [0.95, 0.9], [0, 0])
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert m["AP50"] < 60.0


def test_crowd_gt_is_ignored_not_counted():
    ev = CocoEvaluator(num_classes=1, iou_type="bbox")
    gt = _img_gt([[10, 10, 50, 50], [60, 60, 200, 200]], [0, 0], crowd=[False, True])
    # Detection matching the crowd region only: should be IGNORED, not FP.
    det = _det(
        [[10, 10, 50, 50], [70, 70, 190, 190]], [0.9, 0.85], [0, 0]
    )
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert abs(m["AP"] - 100.0) < 1e-6, m  # crowd neither GT nor FP


def test_iou_threshold_sweep():
    ev = CocoEvaluator(num_classes=1, iou_type="bbox")
    gt = _img_gt([[0, 0, 100, 100]], [0])
    # ~0.75 IoU detection: TP at t<=0.7, FP at t>=0.8 (IoU = 75/100... make it exact)
    det = _det([[0, 0, 100, 75]], [0.9], [0])  # IoU = 0.75
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert abs(m["AP50"] - 100.0) < 1e-6
    assert abs(m["AP75"] - 100.0) < 1e-6  # 0.75 >= 0.75 threshold... boundary
    # mean over thresholds: TP for t in {.5,...,.75} = 6/10 of thresholds
    assert abs(m["AP"] - 60.0) < 1e-5


def test_segm_evaluator_with_pasted_masks():
    ev = CocoEvaluator(num_classes=1, iou_type="segm")
    gt_mask = np.zeros((64, 64), bool)
    gt_mask[16:48, 16:48] = True
    gt = {
        "boxes": np.array([[16.0, 16.0, 48.0, 48.0]]),
        "classes": np.array([0]),
        "is_crowd": np.array([False]),
        "masks": gt_mask[None],
    }
    soft = np.ones((1, 28, 28), np.float32)
    det_masks = paste_masks(soft, np.array([[16.0, 16.0, 48.0, 48.0]]), 64, 64)
    det = {
        "boxes": np.array([[16.0, 16.0, 48.0, 48.0]]),
        "scores": np.array([0.9]),
        "classes": np.array([0]),
        "masks": det_masks,
    }
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert m["AP"] > 90.0, m


def test_sem_seg_eval():
    ev = SemSegEvaluator(num_classes=3, ignore_label=-1)
    gt = np.array([[0, 0, 1], [1, 2, -1]])
    pred = np.array([[0, 1, 1], [1, 2, 2]])
    ev.add_image(gt, pred)
    m = ev.evaluate()
    # class0: tp1 union2 -> 0.5; class1: tp2 union3; class2: tp1 union1
    want_miou = 100 * np.mean([0.5, 2 / 3, 1.0])
    assert abs(m["mIoU"] - want_miou) < 1e-6
    assert abs(m["pACC"] - 100 * 4 / 5) < 1e-6


def test_paste_masks_np_matches_device_version():
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.structures import paste_masks_in_image

    rng = np.random.default_rng(0)
    soft = rng.uniform(0, 1, (3, 28, 28)).astype(np.float32)
    boxes = np.array(
        [[5.2, 7.9, 40.7, 50.1], [0.0, 0.0, 64.0, 64.0], [30.0, 30.0, 33.0, 35.0]],
        np.float32,
    )
    np_out = paste_masks(soft, boxes, 64, 64)
    dev_out = np.asarray(
        paste_masks_in_image(jnp.asarray(soft), jnp.asarray(boxes), (64, 64))
    )
    agree = (np_out == dev_out).mean()
    assert agree > 0.995, agree  # border rounding may differ on rare pixels


def test_panoptic_pq_void_union_matches_panopticapi():
    """Golden PQ with a void-overlapping prediction: panopticapi subtracts
    the prediction's void intersection from the union
    (reference lib/panopticapi/evaluation.py:215)."""
    from detectron2_tensorflow_tpu.evaluation.panoptic_eval import PanopticEvaluator

    # 10x20 image: GT segment 1 covers cols 0..9, void covers cols 10..19.
    gt = np.zeros((10, 20), np.int64)
    gt[:, :10] = 1
    # Prediction covers cols 0..14 -> inter(gt)=100, inter(void)=50.
    pred = np.zeros((10, 20), np.int64)
    pred[:, :15] = 7
    ev = PanopticEvaluator({3: True})
    ev.add_image(
        gt, [{"id": 1, "category_id": 3}],
        pred, [{"id": 7, "category_id": 3}],
    )
    m = ev.evaluate()
    # union = 100 + 150 - 100 - 50 (void) = 100 -> IoU = 1.0 -> PQ = 100.
    assert abs(m["PQ"] - 100.0) < 1e-9
    assert abs(m["SQ"] - 100.0) < 1e-9


def test_coco_eval_area_ranges_use_annotation_area():
    """A GT whose BOX is large but whose annotation segment area is small
    must be gated into the 'small' range (pycocotools keys on gt['area'])."""
    from detectron2_tensorflow_tpu.evaluation import CocoEvaluator

    ev = CocoEvaluator(1, "bbox")
    gt = {
        "boxes": np.array([[0.0, 0.0, 100.0, 100.0]]),  # box area 10000
        "classes": np.array([0]),
        "is_crowd": np.array([False]),
        "areas": np.array([100.0]),  # tiny segment
    }
    det = {
        "boxes": np.array([[0.0, 0.0, 100.0, 100.0]]),
        "scores": np.array([0.9]),
        "classes": np.array([0]),
    }
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert m["APs"] > 0  # matched in the small range
    assert np.isnan(m["APl"]) or m["APl"] <= 0  # no large-range GT


def test_weighted_voc_pools_classes():
    """Weighted VOC mAP = corpus-level AP over all classes pooled
    (reference pascal_voc_evaluator.py:558-590)."""
    from detectron2_tensorflow_tpu.evaluation.pascal_voc_eval import (
        PascalVocEvaluator,
    )

    # class 0: 1 GT, matched at score 0.9. class 1: 1 GT, missed; one FP at 0.8.
    gt = {
        "boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64),
        "classes": np.array([0, 1]),
    }
    det = {
        "boxes": np.array([[0, 0, 10, 10], [40, 40, 50, 50]], np.float64),
        "scores": np.array([0.9, 0.8]),
        "classes": np.array([0, 1]),
    }
    plain = PascalVocEvaluator(2)
    plain.add_image(gt, det)
    m_plain = plain.evaluate()
    # per-class: AP0 = 1.0, AP1 = 0.0 -> mAP 50
    assert abs(m_plain["mAP"] - 50.0) < 1e-6

    weighted = PascalVocEvaluator(2, weighted=True)
    weighted.add_image(gt, det)
    m_w = weighted.evaluate()
    # pooled: scores [.9 tp, .8 fp], total gt 2:
    # precision-recall: (1/1, 0.5), (1/2, 0.5) -> AP = 0.5 * 1.0 = 0.5
    assert abs(m_w["mAP"] - 50.0) < 1e-6

    # Order matters for the pooled metric: make the FP outscore the TP.
    weighted2 = PascalVocEvaluator(2, weighted=True)
    det2 = {**det, "scores": np.array([0.7, 0.8])}
    weighted2.add_image(gt, det2)
    m_w2 = weighted2.evaluate()
    # pooled: fp at .8 then tp at .7 -> envelope precision at r=0.5 is 0.5
    assert abs(m_w2["mAP"] - 25.0) < 1e-6
    # while the unweighted mAP is unchanged by cross-class score order
    plain2 = PascalVocEvaluator(2)
    plain2.add_image(gt, det2)
    assert abs(plain2.evaluate()["mAP"] - 50.0) < 1e-6


def test_voc_instance_segmentation_matches_by_mask_iou():
    from detectron2_tensorflow_tpu.evaluation.pascal_voc_eval import (
        PascalVocEvaluator,
    )

    h, w = 20, 20
    gm = np.zeros((1, h, w), bool)
    gm[0, :10, :10] = True
    # detection box matches, mask disjoint -> mask evaluator must reject it
    dm = np.zeros((1, h, w), bool)
    dm[0, 10:, 10:] = True
    gt = {
        "boxes": np.array([[0, 0, 10, 10]], np.float64),
        "classes": np.array([0]),
        "masks": gm,
    }
    det = {
        "boxes": np.array([[0, 0, 10, 10]], np.float64),
        "scores": np.array([0.9]),
        "classes": np.array([0]),
        "masks": dm,
    }
    box_ev = PascalVocEvaluator(1)
    box_ev.add_image(gt, det)
    assert box_ev.evaluate()["mAP"] == 100.0
    mask_ev = PascalVocEvaluator(1, use_masks=True)
    mask_ev.add_image(gt, det)
    assert mask_ev.evaluate()["mAP"] == 0.0
    # and a correct mask scores
    mask_ev2 = PascalVocEvaluator(1, use_masks=True)
    mask_ev2.add_image(gt, {**det, "masks": gm})
    assert mask_ev2.evaluate()["mAP"] == 100.0


def test_build_detection_evaluators_dispatch():
    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.engine.evaluator import (
        build_detection_evaluators,
    )

    cfg = get_cfg()
    cfg.EVAL.METRICS = (
        "coco_detection_metrics",
        "coco_instance_segmentation_metrics",
        "pascal_voc_detection_metrics",
        "weighted_pascal_voc_detection_metrics",
        "pascal_voc_instance_segmentation_metrics",
        "weighted_pascal_voc_instance_segmentation_metrics",
        "coco_keypoint_metrics",
        "semantic_segmentation_metrics",  # routed elsewhere, not here
    )
    evs = build_detection_evaluators(cfg)
    assert set(evs) == {
        "bbox", "segm", "keypoints", "voc_bbox", "voc_bbox_weighted",
        "voc_segm", "voc_segm_weighted",
    }
    kinds = {p: k for p, (_, k) in evs.items()}
    assert kinds["voc_segm"] == "segm" and kinds["keypoints"] == "keypoints"

    cfg.EVAL.METRICS = ("no_such_metric",)
    import pytest

    with pytest.raises(ValueError):
        build_detection_evaluators(cfg)


def test_all_metrics_per_category_rows():
    """EVAL.ALL_METRICS_PER_CATEGORY (reference coco_evaluator.py:19-32):
    per-class rows for every summary metric, consistent with the means."""
    ev = CocoEvaluator(num_classes=2, iou_type="bbox",
                       class_names=["cat", "dog"], all_per_category=True)
    for _ in range(3):
        gt = _img_gt([[10, 10, 50, 50], [60, 60, 90, 95]], [0, 1])
        # class 0 perfect; class 1 always missed (a far-away false positive)
        det = _det([[10, 10, 50, 50], [200, 200, 230, 230]], [0.9, 0.8], [0, 1])
        ev.add_image(gt, det)
    m = ev.evaluate()
    assert abs(m["AP-cat"] - 100.0) < 1e-6, m
    assert abs(m["AP-dog"] - 0.0) < 1e-6, m
    assert abs(m["AP50-cat"] - 100.0) < 1e-6, m
    assert abs(m["AP50-dog"] - 0.0) < 1e-6, m
    assert abs(m["AP75-cat"] - 100.0) < 1e-6, m
    # per-class values must average to the summary metric
    assert abs(m["AP"] - (m["AP-cat"] + m["AP-dog"]) / 2) < 1e-6
    assert abs(m["AP50"] - (m["AP50-cat"] + m["AP50-dog"]) / 2) < 1e-6
    # area-range per-class rows exist for classes with GT in that range
    # (both boxes here are 'small'-to-'medium' sized: 40x40 and 30x35)
    assert any(k.startswith("APs-") or k.startswith("APm-") for k in m), m


def test_per_category_off_emits_no_class_rows():
    ev = CocoEvaluator(num_classes=2, iou_type="bbox",
                       class_names=["cat", "dog"])
    gt = _img_gt([[10, 10, 50, 50]], [0])
    det = _det([[10, 10, 50, 50]], [0.9], [0])
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert not any("-cat" in k or "-dog" in k for k in m), m
