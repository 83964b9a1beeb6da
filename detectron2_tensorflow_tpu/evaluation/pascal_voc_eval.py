"""Pascal VOC detection evaluation (AP@IoU, CorLoc) in numpy.

Parity target: /root/reference/lib/evaluation/pascal_voc_evaluator.py:19-687
+ per_image_evaluation.py + metrics.py. Single-threshold greedy matching
with difficult-box ignoring, continuous-interpolation AP (VOC 2010+ style)
and CorLoc.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def compute_average_precision(precision: np.ndarray, recall: np.ndarray) -> float:
    """VOC 2010+ AP: area under the monotone precision envelope."""
    if len(precision) == 0:
        return 0.0
    rec = np.concatenate([[0.0], recall, [1.0]])
    prec = np.concatenate([[0.0], precision, [0.0]])
    prec = np.maximum.accumulate(prec[::-1])[::-1]
    idx = np.where(rec[1:] != rec[:-1])[0]
    return float(np.sum((rec[idx + 1] - rec[idx]) * prec[idx + 1]))


def _box_iou_1_to_many(db: np.ndarray, g_boxes: np.ndarray) -> np.ndarray:
    """IoU of one box against [M, 4] boxes (shared COCO matrix helper)."""
    from .coco_eval import box_iou_matrix

    return box_iou_matrix(db[None], g_boxes, np.zeros(len(g_boxes), bool))[0]


def _box_ioa_1_to_many(db: np.ndarray, g_boxes: np.ndarray) -> np.ndarray:
    """Intersection over the DETECTION's area (group-of matching rule,
    reference np_box_list_ops.ioa transposed — per_image_evaluation.py
    :386-387). Identical to COCO's crowd-GT semantics, so it reuses
    box_iou_matrix's iscrowd branch."""
    from .coco_eval import box_iou_matrix

    return box_iou_matrix(db[None], g_boxes, np.ones(len(g_boxes), bool))[0]


class PascalVocEvaluator:
    """Pascal VOC detection/instance-seg evaluator.

    ``weighted``: pool every class's (score, tp) pairs and compute one
    corpus-level AP against the total GT count instead of averaging
    per-class APs (reference pascal_voc_evaluator.py:558-590,
    use_weighted_mean_ap). ``use_masks``: match by mask IoU instead of box
    IoU (reference PascalInstanceSegmentationEvaluator).

    ``group_of_weight``: Open-Images-style group-of boxes (reference
    pascal_voc_evaluator.py:52-57 + per_image_evaluation.py:462-505).
    GT boxes flagged ``is_group_of`` are excluded from stage-1 IoU
    matching; stage 2 re-matches the surviving false positives against
    them by IoA (intersection / detection area). At weight 0 (default)
    any detection inside a group-of box is simply ignored; at weight > 0
    each group-of box with at least one matched detection contributes ONE
    pseudo-detection carrying fractional TP credit ``group_of_weight`` at
    the best matched score, and the box adds ``group_of_weight`` to the
    class GT count (so unmatched group-of boxes act as fractional FNs).
    """

    def __init__(
        self,
        num_classes: int,
        matching_iou_threshold: float = 0.5,
        class_names: Optional[List[str]] = None,
        weighted: bool = False,
        use_masks: bool = False,
        group_of_weight: float = 0.0,
    ):
        self.num_classes = num_classes
        self.iou_thresh = matching_iou_threshold
        self.class_names = class_names
        self.weighted = weighted
        self.use_masks = use_masks
        self.group_of_weight = float(group_of_weight)
        self._scores = [[] for _ in range(num_classes)]
        self._tp = [[] for _ in range(num_classes)]  # float TP credit
        self._num_gt = np.zeros(num_classes, np.float64)
        self._images_with_gt = np.zeros(num_classes, np.int64)
        self._images_correctly_detected = np.zeros(num_classes, np.int64)

    def add_image(self, gt: Dict, det: Dict) -> None:
        """gt: boxes/classes (+ is_difficult, is_group_of);
        det: boxes/scores/classes."""
        gt_boxes = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
        gt_classes = np.asarray(gt["classes"]).reshape(-1)
        difficult = np.asarray(
            gt.get("is_difficult", np.zeros(len(gt_boxes), bool))
        )
        group_of = np.asarray(
            gt.get("is_group_of", np.zeros(len(gt_boxes), bool))
        )
        dt_boxes = np.asarray(det["boxes"], np.float64).reshape(-1, 4)
        dt_scores = np.asarray(det["scores"], np.float64).reshape(-1)
        dt_classes = np.asarray(det["classes"]).reshape(-1)
        gt_masks = dt_masks = None
        if self.use_masks:
            gt_masks = np.asarray(gt["masks"], bool)
            dt_masks = np.asarray(det["masks"], bool)

        for c in range(self.num_classes):
            g_sel = gt_classes == c
            d_sel = dt_classes == c
            ng = g_sel & ~group_of  # stage-1 (IoU) ground truth
            go = g_sel & group_of  # stage-2 (IoA) group-of ground truth
            g_boxes = gt_boxes[ng]
            g_masks = gt_masks[ng] if self.use_masks else None
            g_diff = difficult[ng]
            go_boxes = gt_boxes[go]
            go_masks = gt_masks[go] if self.use_masks else None
            self._num_gt[c] += float((~g_diff).sum())
            self._num_gt[c] += self.group_of_weight * float(go.sum())
            # CorLoc denominator: any class GT at all (difficult and
            # group-of included — reference pascal_voc_evaluator.py
            # _update_ground_truth_statistics counts num_gt_imgs by
            # np.any(class_labels == c)).
            if g_sel.any():
                self._images_with_gt[c] += 1
            if not d_sel.any():
                continue
            order = np.argsort(-dt_scores[d_sel], kind="stable")
            d_boxes = dt_boxes[d_sel][order]
            d_masks = dt_masks[d_sel][order] if self.use_masks else None
            d_scores = dt_scores[d_sel][order]

            # CorLoc numerator (reference per_image_evaluation.py
            # _compute_is_class_correctly_detected_in_image): the single
            # TOP-SCORING detection against ALL class GT boxes — difficult
            # and group-of treated as normal boxes, plain IoU.
            if g_sel.any():
                if self.use_masks:
                    dm = d_masks[0].reshape(-1).astype(np.float64)
                    gm = gt_masks[g_sel].reshape(
                        int(g_sel.sum()), -1
                    ).astype(np.float64)
                    inter = gm @ dm
                    union = gm.sum(1) + dm.sum() - inter
                    top_iou = inter / np.maximum(union, 1e-10)
                else:
                    top_iou = _box_iou_1_to_many(d_boxes[0], gt_boxes[g_sel])
                if top_iou.max() >= self.iou_thresh:
                    self._images_correctly_detected[c] += 1

            matched = np.zeros(len(g_boxes), bool)
            # best matched detection score per group-of box (stage 2)
            go_scores = np.zeros(len(go_boxes), np.float64)
            for i, db in enumerate(d_boxes):
                # Stage 1: IoU match against non-group-of boxes.
                if len(g_boxes):
                    if self.use_masks:
                        dm = d_masks[i].reshape(-1).astype(np.float64)
                        gm = g_masks.reshape(len(g_masks), -1).astype(np.float64)
                        inter = gm @ dm
                        union = gm.sum(1) + dm.sum() - inter
                        iou = inter / np.maximum(union, 1e-10)
                    else:
                        iou = _box_iou_1_to_many(db, g_boxes)
                    j = int(np.argmax(iou))
                    if iou[j] >= self.iou_thresh:
                        if g_diff[j]:
                            continue  # matched a difficult box: ignore det
                        if not matched[j]:
                            matched[j] = True
                            self._scores[c].append(d_scores[i])
                            self._tp[c].append(1.0)
                            continue
                # Stage 2: this detection is a false positive so far —
                # try the group-of boxes by IoA (intersection / det area).
                if len(go_boxes):
                    if self.use_masks:
                        dm = d_masks[i].reshape(-1).astype(np.float64)
                        gm = go_masks.reshape(len(go_masks), -1).astype(
                            np.float64
                        )
                        ioa = (gm @ dm) / np.maximum(dm.sum(), 1e-10)
                    else:
                        ioa = _box_ioa_1_to_many(db, go_boxes)
                    j = int(np.argmax(ioa))
                    if ioa[j] >= self.iou_thresh:
                        # ignore the detection itself; credit the group box
                        go_scores[j] = max(go_scores[j], d_scores[i])
                        continue
                self._scores[c].append(d_scores[i])
                self._tp[c].append(0.0)
            if self.group_of_weight > 0:
                for s in go_scores[go_scores > 0]:
                    # one fractional-TP pseudo-detection per matched box
                    self._scores[c].append(float(s))
                    self._tp[c].append(self.group_of_weight)

    def evaluate(self) -> Dict[str, float]:
        aps, corlocs = [], []
        all_scores, all_tp = [], []
        out = {}
        for c in range(self.num_classes):
            if self._num_gt[c] == 0:
                continue
            scores = np.asarray(self._scores[c])
            tp = np.asarray(self._tp[c], np.float64)
            if self.weighted:
                all_scores.append(scores)
                all_tp.append(tp)
            order = np.argsort(-scores, kind="mergesort")
            tp = tp[order]
            cum_tp = np.cumsum(tp)
            # a label is FP iff it carries no TP credit (fractional
            # group-of credit counts as TP-only — reference metrics.py:42)
            cum_fp = np.cumsum(tp <= 0)
            recall = cum_tp / self._num_gt[c]
            precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-10)
            ap = compute_average_precision(precision, recall)
            aps.append(ap)
            if self._images_with_gt[c]:
                corlocs.append(
                    self._images_correctly_detected[c] / self._images_with_gt[c]
                )
            if self.class_names:
                out[f"AP-{self.class_names[c]}"] = 100 * ap
        if self.weighted:
            # Corpus-level AP: pool every class's detections against the
            # total GT count (reference use_weighted_mean_ap).
            scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
            tp = np.concatenate(all_tp) if all_tp else np.zeros(0)
            order = np.argsort(-scores, kind="mergesort")
            tp = tp[order]
            cum_tp = np.cumsum(tp)
            cum_fp = np.cumsum(tp <= 0)
            n_gt = max(float(self._num_gt.sum()), 1.0)
            recall = cum_tp / n_gt
            precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-10)
            out["mAP"] = 100 * compute_average_precision(precision, recall)
        else:
            out["mAP"] = 100 * float(np.mean(aps)) if aps else 0.0
        out["CorLoc"] = 100 * float(np.mean(corlocs)) if corlocs else 0.0
        return out
