"""Semantic segmentation evaluation: confusion-matrix mIoU / mACC / pACC.

Parity: /root/reference/lib/evaluation/sem_seg_evaluator.py:9-161.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class SemSegEvaluator:
    def __init__(self, num_classes: int, ignore_label: int = -1):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self._conf = np.zeros((num_classes, num_classes), np.int64)

    def add_image(self, gt: np.ndarray, pred: np.ndarray) -> None:
        """gt/pred: [H, W] int class maps at the same resolution."""
        valid = gt != self.ignore_label
        g = gt[valid].astype(np.int64)
        p = pred[valid].astype(np.int64)
        idx = g * self.num_classes + p
        self._conf += np.bincount(
            idx, minlength=self.num_classes**2
        ).reshape(self.num_classes, self.num_classes)

    def evaluate(self) -> Dict[str, float]:
        conf = self._conf.astype(np.float64)
        tp = np.diag(conf)
        gt_total = conf.sum(1)
        pred_total = conf.sum(0)
        union = gt_total + pred_total - tp
        present = gt_total > 0
        iou = np.where(union > 0, tp / np.maximum(union, 1e-10), 0.0)
        acc = np.where(gt_total > 0, tp / np.maximum(gt_total, 1e-10), 0.0)
        return {
            "mIoU": 100 * float(iou[present].mean()) if present.any() else 0.0,
            "mACC": 100 * float(acc[present].mean()) if present.any() else 0.0,
            "pACC": 100 * float(tp.sum() / max(gt_total.sum(), 1e-10)),
            "fwIoU": 100
            * float((iou * gt_total / max(gt_total.sum(), 1e-10)).sum()),
        }
