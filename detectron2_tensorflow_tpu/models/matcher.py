"""IoU matcher: assign each predicted element (anchor/proposal) a GT index.

Functional rewrite of the reference Matcher (/root/reference/lib/modeling/
matcher.py:8-173). Fixed-shape discipline: the match matrix is
``[G_max, A]`` with padded GT rows masked to -inf quality; outputs are dense
[A] arrays (matched GT index + label in {-1 ignore, 0 negative, 1 positive}
for RPN, or {0 bg, 1 fg} for ROI heads).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


class Matcher:
    """thresholds=[t1, ..., tk] ascending; labels has k+1 entries.

    quality < t1 -> labels[0]; t1 <= q < t2 -> labels[1]; ... q >= tk ->
    labels[k]. ``allow_low_quality_matches`` additionally marks, for every
    (valid) GT, the prediction(s) tying its best IoU as positive.
    """

    def __init__(
        self,
        thresholds: Sequence[float],
        labels: Sequence[int],
        allow_low_quality_matches: bool = False,
    ):
        thresholds = list(thresholds)
        assert all(low <= high for low, high in zip(thresholds[:-1], thresholds[1:]))
        assert len(labels) == len(thresholds) + 1
        assert all(l in (-1, 0, 1) for l in labels)
        self.thresholds = [-float("inf")] + thresholds + [float("inf")]
        self.labels = list(labels)
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self, match_quality_matrix: jnp.ndarray, gt_valid: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``match_quality_matrix``: [G, A] pairwise quality (rows = GT);
        ``gt_valid``: [G] bool. Returns (matched_idx [A], labels [A] int8).

        With zero valid GT every prediction gets labels[0] (background /
        negative) and matched_idx 0 — exactly what the all-masked argmax
        yields, no special-casing needed.
        """
        neg_inf = jnp.asarray(-1e10, match_quality_matrix.dtype)
        masked = jnp.where(
            gt_valid[:, None], match_quality_matrix, neg_inf
        )
        matched_vals = jnp.max(masked, axis=0)  # [A]
        matched_idx = jnp.argmax(masked, axis=0)  # [A]
        # Quality for thresholding: invalid-GT columns behave as quality 0.
        quality = jnp.where(matched_vals > neg_inf / 2, matched_vals, 0.0)

        labels = jnp.full(quality.shape, self.labels[0], jnp.int8)
        for lbl, lo, hi in zip(
            self.labels, self.thresholds[:-1], self.thresholds[1:]
        ):
            in_range = (quality >= lo) & (quality < hi)
            labels = jnp.where(in_range, jnp.int8(lbl), labels)

        if self.allow_low_quality_matches:
            # For each valid GT row, its best quality over predictions; the
            # predictions achieving it (ties included) become positive,
            # matching D2's set_low_quality_matches_.
            best_per_gt = jnp.max(masked, axis=1, keepdims=True)  # [G, 1]
            is_best = (masked >= best_per_gt) & gt_valid[:, None] & (
                best_per_gt > 0
            )
            pred_is_low_quality = jnp.any(is_best, axis=0)  # [A]
            labels = jnp.where(pred_is_low_quality, jnp.int8(1), labels)

        return matched_idx, labels
