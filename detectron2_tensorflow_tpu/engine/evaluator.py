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
import jax.numpy as jnp
import numpy as np

from ..evaluation.coco_eval import CocoEvaluator
from ..evaluation.np_masks import fullframe_masks_to_image, paste_masks

logger = logging.getLogger(__name__)

# EVAL.METRICS vocabulary -> (task, factory). Mirrors the reference's
# registry (/root/reference/lib/evaluation/evaluation.py:18-35); the
# keypoint entry is an extension (the reference has no keypoint evaluator).
_DETECTION_METRICS = {
    "coco_detection_metrics": ("bbox", lambda n: CocoEvaluator(n, "bbox")),
    "coco_instance_segmentation_metrics": (
        "segm", lambda n: CocoEvaluator(n, "segm")),
    "coco_keypoint_metrics": (
        "keypoints", lambda n: CocoEvaluator(n, "keypoints")),
}


def _voc_factories(cfg):
    from ..evaluation.pascal_voc_eval import PascalVocEvaluator

    iou = cfg.EVAL.PASCAL_MATCHING_IOU_THRESH
    gow = cfg.EVAL.PASCAL_GROUP_OF_WEIGHT
    return {
        "pascal_voc_detection_metrics": (
            "voc_bbox",
            lambda n: PascalVocEvaluator(n, iou, group_of_weight=gow)),
        "weighted_pascal_voc_detection_metrics": (
            "voc_bbox_weighted",
            lambda n: PascalVocEvaluator(
                n, iou, weighted=True, group_of_weight=gow)),
        "pascal_voc_instance_segmentation_metrics": (
            "voc_segm",
            lambda n: PascalVocEvaluator(
                n, iou, use_masks=True, group_of_weight=gow)),
        "weighted_pascal_voc_instance_segmentation_metrics": (
            "voc_segm_weighted",
            lambda n: PascalVocEvaluator(
                n, iou, weighted=True, use_masks=True, group_of_weight=gow)),
    }


def build_predict(cfg, model):
    """jit ``model.predict``, data-parallel over the device mesh.

    Per-image inference is embarrassingly parallel, so with more than one
    local device the eval batch shards over the mesh's 'data' axis exactly
    like the train step (cfg.PARALLEL axes; the reference evaluates on one
    GPU only — evaluator.py:16-87). Outputs stay batch-sharded: the loop's
    ``device_get`` pulls each shard straight off its device with no
    gather collective. Single-device (and multi-process, where only
    process 0 evaluates) keeps the plain jit.
    """
    if jax.local_device_count() == 1 or jax.process_count() > 1:
        return jax.jit(model.predict)
    from ..parallel import (
        batch_sharding,
        create_mesh,
        get_active_mesh,
        set_active_mesh,
    )

    mesh = create_mesh(cfg.PARALLEL.DATA_AXIS, cfg.PARALLEL.MODEL_AXIS)
    ndata = mesh.shape["data"]
    bs = batch_sharding(mesh)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    sharded = jax.jit(model.predict, in_shardings=(rep, bs), out_shardings=bs)
    single = jax.jit(model.predict)  # compiled lazily, only if ever called

    def predict(variables, batch):
        # A batch that does not divide the data axis (small eval runs,
        # tests) falls back to single-device execution for that call.
        if batch["image"].shape[0] % ndata == 0:
            # Mosaic kernels can't be auto-partitioned by GSPMD; the ROI
            # kernels consult the active mesh AT TRACE TIME to wrap
            # themselves in shard_map over 'data'. Scope the registration
            # to this call (the first call traces) and restore whatever
            # was active, so eval never leaks a mesh into later
            # single-device jits (e.g. TTA's, or another caller's).
            prev = get_active_mesh()
            set_active_mesh(mesh)
            try:
                return sharded(variables, batch)
            finally:
                set_active_mesh(prev)
        return single(variables, batch)

    return predict


def build_detection_evaluators(cfg):
    """Instantiate the detection-family evaluators named by ``EVAL.METRICS``.

    Returns {prefix: (evaluator, kind)} where kind is bbox / segm /
    keypoints (the data each needs from the prediction stream).
    """
    num_classes = num_classes_of(cfg)
    table = dict(_DETECTION_METRICS)
    table.update(_voc_factories(cfg))
    out = {}
    for name in cfg.EVAL.METRICS:
        if name in ("semantic_segmentation_metrics",
                    "panoptic_segmentation_metrics"):
            continue  # routed by run_evaluation, not the detection loop
        if name not in table:
            raise ValueError(
                f"unknown EVAL.METRICS entry '{name}' "
                f"(known: {sorted(table) + ['semantic_segmentation_metrics', 'panoptic_segmentation_metrics']})"
            )
        prefix, factory = table[name]
        kind = ("segm" if "segm" in prefix or "instance" in name
                else "keypoints" if "keypoint" in name else "bbox")
        out[prefix] = (factory(num_classes), kind)
    return out


def evaluate(
    cfg,
    model,
    variables,
    dataset,
    data_iter: Iterable[Dict],
    max_images: Optional[int] = None,
    metric_logger=None,
    step: int = 0,
    results_writer=None,
) -> Dict[str, float]:
    """Run the detection-family evaluation loop.

    ``results_writer``: optional evaluation.coco_results.CocoResultsWriter —
    every kept detection is also recorded in COCO results-JSON form.

    Evaluators come from ``EVAL.METRICS``; with the default config
    (coco_detection_metrics only), mask and keypoint COCO evaluators are
    auto-added when the model produces those outputs.

    ``dataset``: the CocoDataset providing original-resolution GT by
    image_id; ``data_iter``: eval batches from build_dataloader.

    With a ``metric_logger``, the first EVAL.MAX_EXAMPLE_TO_DRAW images are
    annotated (boxes/masks/keypoints above MIN_VISUALIZATION_SCORE_THRESH)
    and written as TensorBoard image summaries (reference
    evaluation.py:288-297).
    """
    num_classes = num_classes_of(cfg)
    if cfg.MODEL.META_ARCHITECTURE == "ProposalNetwork":
        # RPN-only model: class-agnostic proposal recall (the D2
        # 'box_proposals' task) instead of per-class AP.
        from ..evaluation.coco_eval import ProposalEvaluator

        evaluators = {"box_proposals": (ProposalEvaluator(), "bbox")}
        auto_extend = False
    else:
        evaluators = build_detection_evaluators(cfg)
        auto_extend = tuple(cfg.EVAL.METRICS) == ("coco_detection_metrics",)

    if cfg.TEST.AUG.ENABLED:
        # Test-time augmentation: per-image multi-scale (+flip) NMS-merged
        # inference. Outputs live in the SAME (resized) frame as
        # model.predict, so the original-resolution un-scaling below
        # applies unchanged.
        from .tta import tta_predict

        def predict(variables, batch):
            outs = [
                tta_predict(
                    cfg, model, variables,
                    {k: v[i:i + 1] for k, v in batch.items()
                     if hasattr(v, "shape") and v.ndim >= 1},
                )
                for i in range(batch["image"].shape[0])
            ]
            return jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *outs
            )
    else:
        predict = build_predict(cfg, model)
    seen = set()
    n_done = 0
    n_drawn = 0
    fullframe = (
        cfg.MODEL.META_ARCHITECTURE == "SingleStageDetector"
        and cfg.MODEL.SINGLE_STAGE_HEAD.NAME == "SOLOv2Head"
    )
    max_draw = cfg.EVAL.MAX_EXAMPLE_TO_DRAW if metric_logger is not None else 0
    draw_thresh = cfg.EVAL.MIN_VISUALIZATION_SCORE_THRESH
    class_names = getattr(dataset, "class_names", None) or getattr(
        dataset, "thing_classes", None
    )
    if list(cfg.TEST.KEYPOINT_OKS_SIGMAS):
        # Per-keypoint OKS sigma override for non-COCO vocabularies.
        for ev, kind in evaluators.values():
            if isinstance(ev, CocoEvaluator) and kind == "keypoints":
                ev.kp_sigmas = np.asarray(
                    list(cfg.TEST.KEYPOINT_OKS_SIGMAS), np.float64
                )
    if (cfg.EVAL.INCLUDE_METRICS_PER_CATEGORY
            or cfg.EVAL.ALL_METRICS_PER_CATEGORY) and class_names:
        # Per-category metric rows (reference evaluation.py:107-108):
        # INCLUDE_* adds AP-<class>; ALL_* additionally emits AP50/AP75/
        # APs/m/l per class (reference coco_evaluator.py:29-32).
        for ev, _ in evaluators.values():
            if isinstance(ev, CocoEvaluator):
                ev.per_category = cfg.EVAL.INCLUDE_METRICS_PER_CATEGORY
                ev.all_per_category = cfg.EVAL.ALL_METRICS_PER_CATEGORY
                ev.class_names = list(class_names)
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

            gt_classes = np.asarray(raw["classes"])
            if cfg.EVAL.CLASS_AGNOSTIC:
                # Localization-only evaluation: zero out GT and predicted
                # classes before feeding the evaluators (reference
                # evaluation.py:97,226-227,267-268).
                gt_classes = np.zeros_like(gt_classes)
                classes = np.zeros_like(classes)
            gt = {
                "boxes": raw["boxes"],
                "classes": gt_classes,
                "is_crowd": raw["is_crowd"],
                # The VOC family reads crowd boxes as Open-Images group-of
                # boxes (reference pascal_voc_evaluator.py:145 maps
                # gt_is_crowd -> groundtruth_is_group_of_list).
                "is_group_of": raw["is_crowd"],
                "areas": raw.get("areas"),
            }
            det = {"boxes": boxes, "scores": scores, "classes": classes}

            if auto_extend:
                if "pred_masks" in out and "segm" not in evaluators:
                    evaluators["segm"] = (CocoEvaluator(num_classes, "segm"), "segm")
                if ("pred_keypoints" in out and "keypoints" in raw
                        and "keypoints" not in evaluators):
                    kp_ev = CocoEvaluator(num_classes, "keypoints")
                    if list(cfg.TEST.KEYPOINT_OKS_SIGMAS):
                        kp_ev.kp_sigmas = np.asarray(
                            list(cfg.TEST.KEYPOINT_OKS_SIGMAS), np.float64
                        )
                    evaluators["keypoints"] = (kp_ev, "keypoints")

            det_masks = None
            if "pred_masks" in out and any(
                k == "segm" for _, k in evaluators.values()
            ):
                soft = np.asarray(out.pred_masks[i])[valid]
                if fullframe:
                    # SOLOv2 emits whole-frame masks at the mask-feature
                    # stride, not box crops — pasting them into boxes
                    # (the R-CNN contract) would shrink the frame into
                    # each box and zero the mask AP.
                    det_masks = fullframe_masks_to_image(
                        soft, int(rh), int(rw), oh, ow
                    )
                else:
                    det_masks = paste_masks(soft, boxes, oh, ow)
            det_kps = None
            if "pred_keypoints" in out:
                det_kps = np.asarray(out.pred_keypoints[i])[valid].copy()
                det_kps[..., 0] *= sx
                det_kps[..., 1] *= sy

            for prefix, (ev, kind) in evaluators.items():
                if kind == "bbox":
                    ev.add_image(gt, det)
                elif kind == "segm":
                    if det_masks is None:
                        continue
                    gt_m = dict(gt)
                    gt_m["masks"] = raw.get(
                        "masks", np.zeros((len(raw["boxes"]), oh, ow))
                    ).astype(bool)
                    ev.add_image(gt_m, {**det, "masks": det_masks})
                elif kind == "keypoints":
                    if det_kps is None or "keypoints" not in raw:
                        continue
                    gt_k = dict(gt)
                    gt_k["keypoints"] = raw["keypoints"]
                    ev.add_image(gt_k, {**det, "keypoints": det_kps})

            if results_writer is not None:
                results_writer.add_image(
                    image_id, boxes, scores, classes, det_masks, det_kps
                )

            if n_drawn < max_draw:
                from ..evaluation.visualization import draw_eval_image

                annotated = draw_eval_image(
                    raw["image"],
                    {**det, "masks": det_masks, "keypoints": det_kps},
                    class_names,
                    draw_thresh,
                )
                metric_logger.log_image(
                    step, f"eval/image_{image_id}", annotated
                )
                n_drawn += 1
            n_done += 1
        if max_images is not None and n_done >= max_images:
            break
        if n_done and n_done % 100 == 0:
            logger.info("evaluated %d images", n_done)

    metrics = {}
    # Canonical prefixes first (bbox before segm) for stable reporting.
    for prefix in sorted(evaluators, key=lambda p: (p != "bbox", p)):
        ev, _ = evaluators[prefix]
        metrics.update({f"{prefix}/{k}": v for k, v in ev.evaluate().items()})
    return metrics


def evaluate_sem_seg(
    cfg,
    model,
    variables,
    dataset,
    data_iter: Iterable[Dict],
    max_images: Optional[int] = None,
) -> Dict[str, float]:
    """Semantic-segmentation evaluation loop: predict -> un-resize (nearest)
    to the original resolution -> confusion-matrix mIoU/mACC/pACC
    (reference sem_seg_evaluator.py:9-161 via EVAL.METRICS dispatch).

    ``dataset`` samples must carry an original-resolution ``sem_seg`` map
    (CocoPanopticDataset provides one).
    """
    import cv2

    from ..evaluation.sem_seg_eval import SemSegEvaluator

    ev = SemSegEvaluator(
        cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        ignore_label=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
    )
    if cfg.TEST.AUG.ENABLED:
        # Test-time augmentation: per-image multi-scale (+flip) NMS-merged
        # inference. Outputs live in the SAME (resized) frame as
        # model.predict, so the original-resolution un-scaling below
        # applies unchanged.
        from .tta import tta_predict

        def predict(variables, batch):
            outs = [
                tta_predict(
                    cfg, model, variables,
                    {k: v[i:i + 1] for k, v in batch.items()
                     if hasattr(v, "shape") and v.ndim >= 1},
                )
                for i in range(batch["image"].shape[0])
            ]
            return jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *outs
            )
    else:
        predict = build_predict(cfg, model)
    seen = set()
    n_done = 0
    for batch in data_iter:
        out = predict(variables, batch)
        sem = np.asarray(jax.device_get(out.sem_seg))
        b = batch["image"].shape[0]
        for i in range(b):
            image_id = int(batch["image_id"][i])
            if image_id < 0 or image_id in seen:
                continue
            seen.add(image_id)
            idx = _index_of(dataset, image_id)
            raw = dataset[idx]
            gt_map = raw["sem_seg"]
            oh, ow = gt_map.shape
            rh, rw = [int(v) for v in batch["image_size"][i]]
            # predictions are at the network's output stride; rescale the
            # content region to the original resolution.
            ph = int(round(rh * sem.shape[1] / batch["image"].shape[1]))
            pw = int(round(rw * sem.shape[2] / batch["image"].shape[2]))
            pred = cv2.resize(
                sem[i, :ph, :pw].astype(np.int32), (ow, oh),
                interpolation=cv2.INTER_NEAREST,
            )
            ev.add_image(gt_map, pred)
            n_done += 1
        if max_images is not None and n_done >= max_images:
            break
    return {f"sem_seg/{k}": v for k, v in ev.evaluate().items()}


def run_evaluation(
    cfg,
    model,
    variables,
    dataset,
    data_iter,
    max_images: Optional[int] = None,
    metric_logger=None,
    step: int = 0,
    results_writer=None,
) -> Dict[str, float]:
    """Dispatch on EVAL.METRICS across the three evaluation families
    (reference evaluation.py:18-35 registry + EvaluationHook routing).

    ``data_iter`` must be re-iterable (a factory callable or a list) when
    more than one family is requested.
    """
    names = tuple(cfg.EVAL.METRICS)
    families = []
    if any(n in _DETECTION_METRICS or "pascal" in n for n in names):
        families.append(evaluate)
    if "semantic_segmentation_metrics" in names:
        families.append(evaluate_sem_seg)
    if "panoptic_segmentation_metrics" in names:
        families.append(evaluate_panoptic)
    if not families:
        raise ValueError(f"EVAL.METRICS selects no evaluator: {names}")

    def fresh_iter():
        return data_iter() if callable(data_iter) else iter(data_iter)

    metrics = {}
    for fam in families:
        kwargs = {}
        if fam is evaluate:  # image summaries only on the detection loop
            kwargs = {"metric_logger": metric_logger, "step": step,
                      "results_writer": results_writer}
        metrics.update(
            fam(cfg, model, variables, dataset, fresh_iter(), max_images,
                **kwargs)
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

    predict = build_predict(cfg, model)
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
        if hasattr(dataset, "images"):
            dataset._id_to_index = {
                info["id"]: i for i, (info, _) in enumerate(dataset.images)
            }
        else:
            # Record-backed datasets expose image_id(i) instead of a COCO
            # images table (data/records.TFRecordDataset).
            dataset._id_to_index = {
                dataset.image_id(i): i for i in range(len(dataset))
            }
    return dataset._id_to_index[image_id]


# Upstream-D2 EXPECTED_RESULTS task names -> this framework's metric prefixes.
_TASK_ALIASES = {"panoptic_seg": "panoptic"}


def check_expected_results(cfg, metrics: Dict[str, float]) -> List[str]:
    """Consume TEST.EXPECTED_RESULTS ([[task, metric, value, tol], ...]) —
    defined but never consumed in the reference (SURVEY §4); wired here."""
    failures = []
    for task, metric, value, tol in cfg.TEST.EXPECTED_RESULTS:
        task = _TASK_ALIASES.get(task, task)
        key = f"{task}/{metric}"
        actual = metrics.get(key)
        if actual is None or abs(actual - value) > tol:
            failures.append(
                f"{key}: expected {value} ± {tol}, got {actual}"
            )
    return failures
