"""Evaluation loop: predict on padded batches, un-resize, feed evaluators.

Replaces the reference's slim evaluation_loop + EvaluationHook
(/root/reference/lib/engine/evaluator.py:16-87, evaluation/evaluation.py:
71-297): the device produces fixed-shape detections in network-input
coordinates; the host rescales boxes to original resolution and pastes masks
there, then streams per-image results into the metric evaluators.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterable, List, Optional

import jax
import numpy as np

from ..evaluation.coco_eval import CocoEvaluator
from ..evaluation.np_masks import paste_masks

logger = logging.getLogger(__name__)


def evaluate(
    cfg,
    model,
    variables,
    dataset,
    data_iter: Iterable[Dict],
    max_images: Optional[int] = None,
) -> Dict[str, float]:
    """Run COCO box (and mask, if produced) evaluation.

    ``dataset``: the CocoDataset providing original-resolution GT by
    image_id; ``data_iter``: eval batches from build_dataloader.
    """
    num_classes = num_classes_of(cfg)
    box_eval = CocoEvaluator(num_classes, "bbox")
    mask_eval = None
    kp_eval = None

    gt_by_id = {}
    for img_info, _ in dataset.images:
        gt_by_id[img_info["id"]] = None  # filled lazily

    predict = jax.jit(model.predict)
    seen = set()
    n_done = 0
    for batch in data_iter:
        out = predict(variables, batch)
        out = jax.device_get(out)
        b = batch["image"].shape[0]
        for i in range(b):
            image_id = int(batch["image_id"][i])
            if image_id < 0 or image_id in seen:  # batch padding / dup
                continue
            seen.add(image_id)
            idx = _index_of(dataset, image_id)
            raw = dataset[idx]
            oh, ow = raw["image"].shape[:2]
            rh, rw = batch["image_size"][i]
            sx, sy = ow / float(rw), oh / float(rh)

            valid = np.asarray(out.is_valid[i])
            boxes = np.asarray(out.boxes[i])[valid]
            boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
            scores = np.asarray(out.scores[i])[valid]
            classes = np.asarray(out.pred_classes[i])[valid]

            gt = {
                "boxes": raw["boxes"],
                "classes": raw["classes"],
                "is_crowd": raw["is_crowd"],
                "areas": raw.get("areas"),
            }
            det = {"boxes": boxes, "scores": scores, "classes": classes}
            box_eval.add_image(gt, det)

            if "pred_masks" in out:
                if mask_eval is None:
                    mask_eval = CocoEvaluator(num_classes, "segm")
                soft = np.asarray(out.pred_masks[i])[valid]
                det_masks = paste_masks(soft, boxes, oh, ow)
                gt_m = dict(gt)
                gt_m["masks"] = raw.get(
                    "masks", np.zeros((len(raw["boxes"]), oh, ow))
                ).astype(bool)
                mask_eval.add_image(gt_m, {**det, "masks": det_masks})

            if "pred_keypoints" in out and "keypoints" in raw:
                if kp_eval is None:
                    kp_eval = CocoEvaluator(num_classes, "keypoints")
                kps = np.asarray(out.pred_keypoints[i])[valid].copy()
                kps[..., 0] *= sx
                kps[..., 1] *= sy
                gt_k = dict(gt)
                gt_k["keypoints"] = raw["keypoints"]
                kp_eval.add_image(gt_k, {**det, "keypoints": kps})
            n_done += 1
        if max_images is not None and n_done >= max_images:
            break
        if n_done and n_done % 100 == 0:
            logger.info("evaluated %d images", n_done)

    metrics = {f"bbox/{k}": v for k, v in box_eval.evaluate().items()}
    if mask_eval is not None:
        metrics.update({f"segm/{k}": v for k, v in mask_eval.evaluate().items()})
    if kp_eval is not None:
        metrics.update(
            {f"keypoints/{k}": v for k, v in kp_eval.evaluate().items()}
        )
    return metrics


def evaluate_panoptic(
    cfg,
    model,
    variables,
    dataset,
    data_iter: Iterable[Dict],
    max_images: Optional[int] = None,
) -> Dict[str, float]:
    """Panoptic-quality evaluation: predict -> fusion -> PQ.

    ``dataset``: CocoPanopticDataset (provides original-resolution GT maps
    and the thing/stuff category table).
    """
    import cv2

    from ..evaluation.panoptic_eval import PanopticEvaluator
    from ..models.meta_arch.rcnn import panoptic_fusion

    # PQ category table: use contiguous ids with a stuff offset so thing and
    # stuff ids don't collide (things: 0..T-1 -> ids; stuff: 1..S -> +1000).
    cat_table = {}
    for cid in dataset.thing_contiguous.values():
        cat_table[cid] = True
    for cid in dataset.stuff_contiguous.values():
        cat_table[1000 + cid] = False
    pq = PanopticEvaluator(cat_table)

    predict = jax.jit(model.predict)
    fuse = jax.jit(lambda o: panoptic_fusion(cfg, o))
    seen = set()
    n_done = 0
    for batch in data_iter:
        out = predict(variables, batch)
        pan_maps, infos = jax.device_get(fuse(out))
        b = batch["image"].shape[0]
        for i in range(b):
            image_id = int(batch["image_id"][i])
            if image_id < 0 or image_id in seen:
                continue
            seen.add(image_id)
            idx = _index_of(dataset, image_id)
            gt_map, gt_segments = dataset.get_panoptic_gt(idx)
            oh, ow = gt_map.shape
            rh, rw = [int(v) for v in batch["image_size"][i]]
            pred_map = np.asarray(pan_maps[i])[:rh, :rw]
            pred_map = cv2.resize(
                pred_map.astype(np.int32), (ow, oh),
                interpolation=cv2.INTER_NEAREST,
            )
            info = {k: np.asarray(v[i]) for k, v in infos.items()}
            segments = []
            for sid in range(len(info["valid"])):
                if not info["valid"][sid]:
                    continue
                cat = int(info["category_id"][sid])
                segments.append({
                    "id": sid,
                    "category_id": cat if info["is_thing"][sid] else 1000 + cat,
                })
            # GT segments into the same category-id space.
            gt_segs = []
            for seg in gt_segments:
                cid = seg["category_id"]
                if cid in dataset.thing_contiguous:
                    cat = dataset.thing_contiguous[cid]
                else:
                    cat = 1000 + dataset.stuff_contiguous[cid]
                gt_segs.append({
                    "id": seg["id"],
                    "category_id": cat,
                    "iscrowd": seg.get("iscrowd", 0),
                })
            pq.add_image(gt_map, gt_segs, pred_map, segments)
            n_done += 1
        if max_images is not None and n_done >= max_images:
            break
    return {f"panoptic/{k}": v for k, v in pq.evaluate().items()}


def num_classes_of(cfg) -> int:
    """Detection class count for the configured meta-architecture — single-
    stage detectors carry it in SINGLE_STAGE_HEAD, R-CNNs in ROI_HEADS
    (reading ROI_HEADS for a RetinaNet works on COCO only by coincidence)."""
    if cfg.MODEL.META_ARCHITECTURE == "SingleStageDetector":
        return cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES
    return cfg.MODEL.ROI_HEADS.NUM_CLASSES


def _index_of(dataset, image_id: int) -> int:
    if not hasattr(dataset, "_id_to_index"):
        dataset._id_to_index = {
            info["id"]: i for i, (info, _) in enumerate(dataset.images)
        }
    return dataset._id_to_index[image_id]


def check_expected_results(cfg, metrics: Dict[str, float]) -> List[str]:
    """Consume TEST.EXPECTED_RESULTS ([[task, metric, value, tol], ...]) —
    defined but never consumed in the reference (SURVEY §4); wired here."""
    failures = []
    for task, metric, value, tol in cfg.TEST.EXPECTED_RESULTS:
        key = f"{task}/{metric}"
        actual = metrics.get(key)
        if actual is None or abs(actual - value) > tol:
            failures.append(
                f"{key}: expected {value} ± {tol}, got {actual}"
            )
    return failures
