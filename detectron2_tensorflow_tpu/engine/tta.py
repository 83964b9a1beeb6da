"""Test-time augmentation and precise-BN.

Both exist ONLY as config keys in the reference (TEST.AUG, TEST.PRECISE_BN —
defaults.py:755-761, no implementation in its lib/); implemented here.

TTA: predict at each TEST.AUG.MIN_SIZES scale (+ horizontal flip), map all
candidate boxes back to the original resolution, and merge with one final
class-aware NMS. Each scale is its own static shape (one jit compile per
scale — the fixed-shape discipline).

Precise-BN: re-estimate BatchNorm statistics as the true average over N
training batches (Rethinking-BN recipe) before evaluation.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import class_aware_nms
from ..structures import Instances


def _resize_batch(batch: Dict, min_size: int, max_size: int, bucket) -> Tuple[Dict, np.ndarray]:
    """Host-side resize of a (single-image) batch to a TTA scale."""
    import cv2

    image = np.asarray(batch["image"][0])
    h, w = [int(v) for v in batch["image_size"][0]]
    image = image[:h, :w]
    scale = min_size / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(image.astype(np.float32), (nw, nh))
    bh, bw = bucket
    out = np.zeros((1, bh, bw, 3), np.float32)
    out[0, :nh, :nw] = resized
    return (
        {"image": jnp.asarray(out), "image_size": jnp.asarray([[nh, nw]])},
        np.array([w / nw, h / nh], np.float32),
    )


def flip_content(scaled: Dict) -> Dict:
    """Horizontally flip only the CONTENT region [:nh, :nw] of a padded
    batch — reversing the whole padded canvas would move the image into the
    padding columns while image_size still claims it sits at [0, nw)."""
    nh, nw = [int(v) for v in scaled["image_size"][0]]
    img = np.asarray(scaled["image"])
    flipped = np.zeros_like(img)
    flipped[0, :nh, :nw] = img[0, :nh, :nw][:, ::-1]
    return {"image": jnp.asarray(flipped), "image_size": scaled["image_size"]}


def tta_predict(cfg, model, variables, batch: Dict) -> Instances:
    """Multi-scale (+flip) single-image inference with NMS merge.

    ``batch``: one image ("image" [1, H, W, 3], "image_size" [1, 2]).
    Returns merged detections at the ORIGINAL image resolution.
    """
    assert batch["image"].shape[0] == 1, "TTA operates per image"
    aug = cfg.TEST.AUG
    predict = jax.jit(model.predict)

    all_boxes, all_scores, all_classes, all_valid = [], [], [], []
    orig_w = float(batch["image_size"][0][1])

    def add(det, sx, sy, flipped, width):
        boxes = np.asarray(det.boxes[0], np.float32)
        if flipped:
            x0 = width - boxes[:, 2]
            x1 = width - boxes[:, 0]
            boxes = np.stack([x0, boxes[:, 1], x1, boxes[:, 3]], axis=1)
        boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
        all_boxes.append(boxes)
        all_scores.append(np.asarray(det.scores[0]))
        all_classes.append(np.asarray(det.pred_classes[0]))
        all_valid.append(np.asarray(det.is_valid[0]))

    # Pick one bucket large enough for every TTA scale of THIS image's
    # aspect ratio (resize_shortest_edge caps the long side at MAX_SIZE, so
    # a wide image can need width up to MAX_SIZE — a fixed 2*min_size bucket
    # would overflow). Quantize to 128 so distinct aspect ratios share
    # compiles.
    h0, w0 = [int(v) for v in batch["image_size"][0]]
    need_h = need_w = 32
    for min_size in aug.MIN_SIZES:
        scale = min_size / min(h0, w0)
        if max(h0, w0) * scale > aug.MAX_SIZE:
            scale = aug.MAX_SIZE / max(h0, w0)
        need_h = max(need_h, int(round(h0 * scale)))
        need_w = max(need_w, int(round(w0 * scale)))
    bucket = (-(-need_h // 128) * 128, -(-need_w // 128) * 128)
    for min_size in aug.MIN_SIZES:
        scaled, (sx, sy) = _resize_batch(batch, min_size, aug.MAX_SIZE, bucket)
        det = predict(variables, scaled)
        add(det, sx, sy, flipped=False, width=0)
        if aug.FLIP:
            flipped_batch = flip_content(scaled)
            det = predict(variables, flipped_batch)
            # Flip coordinates back in the SCALED frame (true width nw).
            nw = float(scaled["image_size"][0][1])
            add(det, sx, sy, flipped=True, width=nw)

    boxes = jnp.asarray(np.concatenate(all_boxes))
    scores = jnp.asarray(np.concatenate(all_scores))
    classes = jnp.asarray(np.concatenate(all_classes))
    valid = jnp.asarray(np.concatenate(all_valid))
    out_boxes, out_scores, out_idx, out_valid = class_aware_nms(
        boxes,
        scores,
        jnp.maximum(classes, 0),
        cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        cfg.TEST.DETECTIONS_PER_IMAGE,
        valid=valid,
    )
    merged = Instances(
        boxes=out_boxes[None],
        scores=jnp.where(out_valid, out_scores, 0.0)[None],
        pred_classes=jnp.where(out_valid, jnp.take(classes, out_idx), -1)[None],
        is_valid=out_valid[None],
    )
    # Mask TTA (D2 semantics): re-run the per-ROI heads on the MERGED boxes
    # at the original resolution (the reference's detected_instances path).
    if getattr(model, "predict_with_boxes", None) is not None and cfg.MODEL.MASK_ON:
        merged = jax.jit(model.predict_with_boxes)(variables, batch, merged)
    return merged


def precise_bn(model, variables, data_iter: Iterable[Dict], num_iters: int,
               momentum: float = 0.9) -> Dict:
    """Replace BatchNorm running stats with true averages over ``num_iters``
    batches (TEST.PRECISE_BN). No-op for models without batch_stats.

    Runs the feature trunk in train mode and recovers each batch's PURE
    moments from flax's EMA write ``updated = m*old + (1-m)*batch`` as
    ``batch = (updated - m*old) / (1-m)``, then averages those across
    batches (the Rethinking-BN recipe). Averaging the EMA-blended stats
    directly would keep ~m of the stale running statistics.
    """
    if "batch_stats" not in variables:
        return variables

    module = model.module
    method = "compute_features" if hasattr(module, "compute_features") else None
    old_stats = variables["batch_stats"]

    @jax.jit
    def stats_of(images):
        kwargs = {"method": method} if method else {}
        _, updated = module.apply(
            variables, images, train=True, mutable=["batch_stats"], **kwargs
        )
        return jax.tree.map(
            lambda upd, old: (upd - momentum * old) / (1.0 - momentum),
            updated["batch_stats"],
            old_stats,
        )

    sums = None
    n = 0
    for batch in data_iter:
        if n >= num_iters:
            break
        sums_i = stats_of(batch["image"].astype(jnp.float32))
        sums = sums_i if sums is None else jax.tree.map(jnp.add, sums, sums_i)
        n += 1
    if sums is None:
        return variables
    out = dict(variables)
    out["batch_stats"] = jax.tree.map(lambda x: x / n, sums)
    return out
