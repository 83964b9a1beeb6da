"""Panoptic Quality (PQ) evaluation in numpy.

Replaces the reference's vendored panopticapi (/root/reference/lib/
panopticapi/evaluation.py:36-258) with a self-contained implementation of
the PQ metric (Kirillov et al. 2019): segments match iff IoU > 0.5 (at most
one match each, provable); PQ = sum(IoU_TP) / (TP + FP/2 + FN/2), averaged
over categories, with SQ/RQ decomposition and thing/stuff splits.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

VOID = 0


class PanopticEvaluator:
    def __init__(self, categories: Dict[int, bool]):
        """categories: {category_id: is_thing}."""
        self.categories = dict(categories)
        self.iou_sum = defaultdict(float)
        self.tp = defaultdict(int)
        self.fp = defaultdict(int)
        self.fn = defaultdict(int)

    def add_image(
        self,
        gt_map: np.ndarray,
        gt_segments: List[Dict],
        pred_map: np.ndarray,
        pred_segments: List[Dict],
    ) -> None:
        """Maps: [H, W] int segment ids (0 = void). Segments: dicts with
        ``id``, ``category_id`` (+ optional ``iscrowd`` on GT)."""
        gt_by_id = {s["id"]: s for s in gt_segments}
        pred_by_id = {s["id"]: s for s in pred_segments}

        # Pairwise intersections via a combined key histogram.
        combined = gt_map.astype(np.int64) * (pred_map.max() + 2) + pred_map
        keys, counts = np.unique(combined, return_counts=True)
        inter = {}
        base = int(pred_map.max() + 2)
        for k, c in zip(keys, counts):
            inter[(int(k) // base, int(k) % base)] = int(c)

        gt_areas = {s["id"]: int((gt_map == s["id"]).sum()) for s in gt_segments}
        pred_areas = {
            s["id"]: int((pred_map == s["id"]).sum()) for s in pred_segments
        }

        matched_gt, matched_pred = set(), set()
        for (gid, pid), i in inter.items():
            if gid == VOID or pid == VOID:
                continue
            g = gt_by_id.get(gid)
            p = pred_by_id.get(pid)
            if g is None or p is None or g.get("iscrowd", 0):
                continue
            if g["category_id"] != p["category_id"]:
                continue
            union = (
                gt_areas[gid]
                + pred_areas[pid]
                - i
                # panopticapi evaluation.py:215: the prediction's overlap
                # with GT void is excluded from the union.
                - inter.get((VOID, pid), 0)
            )
            iou = i / max(union, 1)
            if iou > 0.5:
                c = g["category_id"]
                self.iou_sum[c] += iou
                self.tp[c] += 1
                matched_gt.add(gid)
                matched_pred.add(pid)

        crowd_by_cat = {
            s["category_id"]: s["id"]
            for s in gt_segments
            if s.get("iscrowd", 0)
        }
        for s in gt_segments:
            if s["id"] in matched_gt or s.get("iscrowd", 0):
                continue
            self.fn[s["category_id"]] += 1
        for s in pred_segments:
            if s["id"] in matched_pred:
                continue
            # Predictions mostly covered by void or a same-class crowd region
            # are ignored (panopticapi rule).
            area = pred_areas[s["id"]]
            ignored = inter.get((VOID, s["id"]), 0)
            crowd_id = crowd_by_cat.get(s["category_id"])
            if crowd_id is not None:
                ignored += inter.get((crowd_id, s["id"]), 0)
            if area > 0 and ignored / area > 0.5:
                continue
            self.fp[s["category_id"]] += 1

    def evaluate(self) -> Dict[str, float]:
        def agg(cats):
            pq_list, sq_list, rq_list = [], [], []
            for c in cats:
                tp, fp, fn = self.tp[c], self.fp[c], self.fn[c]
                if tp + fp + fn == 0:
                    continue
                sq = self.iou_sum[c] / tp if tp else 0.0
                rq = tp / (tp + 0.5 * fp + 0.5 * fn)
                pq_list.append(sq * rq)
                sq_list.append(sq)
                rq_list.append(rq)
            n = max(len(pq_list), 1)
            return (
                100 * sum(pq_list) / n,
                100 * sum(sq_list) / n,
                100 * sum(rq_list) / n,
            )

        all_cats = list(self.categories)
        things = [c for c, t in self.categories.items() if t]
        stuff = [c for c, t in self.categories.items() if not t]
        pq, sq, rq = agg(all_cats)
        pq_th, sq_th, rq_th = agg(things)
        pq_st, sq_st, rq_st = agg(stuff)
        return {
            "PQ": pq, "SQ": sq, "RQ": rq,
            "PQ_th": pq_th, "SQ_th": sq_th, "RQ_th": rq_th,
            "PQ_st": pq_st, "SQ_st": sq_st, "RQ_st": rq_st,
        }
