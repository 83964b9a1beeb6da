"""Full-pipeline numpy oracle: the system-level wiring check.

Every kernel is unit-tested layer-exact, but NMS tie-breaking, FPN level
assignment, box decode order, score routing and mask gathering could each
silently drift at the SYSTEM level (the risk VERDICT round 1 flags for the
converted-weight parity goal, which needs data this host doesn't have).
This test re-implements the ENTIRE post-feature inference pipeline in
sequential numpy — independent proposal selection (per-level top-k,
decode, clip, greedy NMS), pure-area FPN level assignment, the literal
D2 ROIAlign transcription, per-class box decode + sequential class-aware
NMS, and mask gathering — sharing only the network WEIGHTS (heads applied
through module.apply; their math is covered by the layer tests), and
demands the jitted model.predict produce the same detections.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.models import build_model
from detectron2_tensorflow_tpu.models.meta_arch.rcnn import (
    _RCNNDrivers,
    _build_rcnn_parts,
)
from tests.test_end_to_end import tiny_rcnn_cfg
from tests.test_roi_align import roi_align_reference

pytestmark = pytest.mark.slow  # full-detector jit compiles

LOG_CLAMP = float(np.log(1000.0 / 16.0))


def np_decode(deltas, boxes, weights):
    """Numpy transcription of the D2 box decode (xyxy, log clamp)."""
    deltas = deltas.reshape(len(boxes), -1, 4)
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, LOG_CLAMP)
    dh = np.minimum(deltas[..., 3] / wh, LOG_CLAMP)
    pcx = dx * w[:, None] + cx[:, None]
    pcy = dy * h[:, None] + cy[:, None]
    pw = np.exp(dw) * w[:, None]
    ph = np.exp(dh) * h[:, None]
    return np.stack(
        [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], axis=-1
    )


def np_clip(boxes, hw):
    h, w = hw
    out = boxes.copy()
    out[..., 0] = np.clip(out[..., 0], 0, w)
    out[..., 1] = np.clip(out[..., 1], 0, h)
    out[..., 2] = np.clip(out[..., 2], 0, w)
    out[..., 3] = np.clip(out[..., 3], 0, h)
    return out


def np_iou(a, b):
    x0 = np.maximum(a[0], b[:, 0])
    y0 = np.maximum(a[1], b[:, 1])
    x1 = np.minimum(a[2], b[:, 2])
    y1 = np.minimum(a[3], b[:, 3])
    inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
    aa = (a[2] - a[0]) * (a[3] - a[1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa + ab - inter, 1e-10)


def np_greedy_nms(boxes, scores, thresh, max_out):
    """Exact sequential greedy NMS, score-descending."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        if len(keep) >= max_out:
            break
        ious = np_iou(boxes[i], boxes)
        sup |= ious > thresh
        sup[i] = True
    return np.asarray(keep, np.int64)


def test_full_inference_pipeline_matches_numpy_oracle():
    cfg = tiny_rcnn_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 128, 160, 3)).astype(np.float32)
    batch = {
        "image": jnp.asarray(img),
        "image_size": jnp.asarray([[128, 160]], jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(42), batch)

    got = jax.device_get(jax.jit(model.predict)(variables, batch))

    # ---- oracle --------------------------------------------------------
    module, rpn_drv, roi_drv, neck_shapes, dtype = _build_rcnn_parts(cfg)
    drv = _RCNNDrivers(cfg, module, rpn_drv, roi_drv, neck_shapes, dtype, False)
    feats, logits, deltas = jax.device_get(
        jax.jit(lambda v, b: drv.features_and_rpn(v, b, False))(variables, batch)
    )
    hw = (128, 160)
    anchors = [
        np.asarray(a)
        for a in rpn_drv.anchor_generator(
            [(l.shape[1], l.shape[2]) for l in logits]
        )
    ]

    # RPN proposal selection, sequentially per level.
    cand_b, cand_s = [], []
    for logit, delta, anc in zip(logits, deltas, anchors):
        s = logit[0].reshape(-1)
        d = delta[0].reshape(-1, 4)
        k = min(cfg.MODEL.RPN.PRE_NMS_TOPK_TEST, len(s))
        top = np.argsort(-s, kind="stable")[:k]
        boxes = np_clip(np_decode(d[top], anc[top], (1, 1, 1, 1))[:, 0], hw)
        wpos = (boxes[:, 2] - boxes[:, 0] > 0) & (boxes[:, 3] - boxes[:, 1] > 0)
        boxes, ss = boxes[wpos], s[top][wpos]
        keep = np_greedy_nms(
            boxes, ss, cfg.MODEL.RPN.NMS_THRESH,
            min(cfg.MODEL.RPN.POST_NMS_TOPK_TEST, k),
        )
        cand_b.append(boxes[keep])
        cand_s.append(ss[keep])
    all_b = np.concatenate(cand_b)
    all_s = np.concatenate(cand_s)
    order = np.argsort(-all_s, kind="stable")[: cfg.MODEL.RPN.POST_NMS_TOPK_TEST]
    proposals = all_b[order]

    # Pooling oracle: pure-area FPN assignment + the documented extent-tier
    # routing (overflowing boxes sample a 2x/4x avgpooled alias of the SAME
    # level), then literal-D2 ROIAlign — all in numpy.
    from detectron2_tensorflow_tpu.models.poolers import (
        _EXTENT_MARGIN,
        plan_patch,
    )

    max_img = max(cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN,
                  cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST)
    patch, _ = plan_patch(max_img, 32)
    bound = patch - _EXTENT_MARGIN
    strides = [4, 8, 16, 32]
    fnames = ["p2", "p3", "p4", "p5"]

    def np_avgpool2x(f):
        hh, ww = f.shape[0] // 2 * 2, f.shape[1] // 2 * 2
        return f[:hh, :ww].reshape(
            hh // 2, 2, ww // 2, 2, f.shape[-1]
        ).mean(axis=(1, 3))

    planes = [np.asarray(feats[n][0], np.float32) for n in fnames]
    planes += [np_avgpool2x(pl) for pl in planes]  # tier-1 aliases
    planes.append(np_avgpool2x(planes[7]))  # tier-2: 4x top
    plane_strides = strides + [2 * st for st in strides] + [4 * strides[-1]]

    def oracle_pool(boxes, out_size):
        areas = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
            boxes[:, 3] - boxes[:, 1], 0, None
        )
        base = np.clip(
            np.floor(4 + np.log2(np.sqrt(areas) / 224 + 1e-8)), 2, 5
        ).astype(int) - 2
        max_side = np.maximum(
            boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
        )
        extent = max_side / np.asarray(strides)[base]
        idx = np.where(extent > bound, base + 4, base)
        idx = np.where(extent > 2 * bound, 8, idx)
        out = np.zeros(
            (len(boxes), out_size, out_size, planes[0].shape[-1]), np.float32
        )
        for i, (box, lv) in enumerate(zip(boxes, idx)):
            # sampling_ratio=0: D2's adaptive rule — the production default
            # (ROI_BOX/MASK_HEAD.POOLER_SAMPLING_RATIO=0). The grid derives
            # from the box extent at the ROUTED plane's stride, exactly as
            # plan_rois computes it.
            out[i] = roi_align_reference(
                planes[lv], box[None], 1.0 / plane_strides[lv], out_size, 0
            )[0]
        return out

    pooled = oracle_pool(proposals, 7)

    # Box head on oracle-pooled features (shared weights; layer-tested).
    scores_l, ds_l, _ = jax.device_get(
        jax.jit(
            lambda v, p: module.apply(v, p, stage=0, train=False, method="box")
        )(variables, jnp.asarray(pooled, dtype))
    )
    probs = np.asarray(jax.nn.softmax(jnp.asarray(scores_l), -1))[:, :-1]
    k = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    decoded = np_clip(
        np_decode(ds_l, proposals, cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS), hw
    )  # [P, K, 4]

    # Flatten (proposal, class) candidates; class-aware sequential NMS.
    flat_s = probs.reshape(-1)
    flat_c = np.tile(np.arange(k), len(proposals))
    flat_b = decoded.reshape(-1, 4)
    sel = flat_s > cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST
    fb, fs, fc = flat_b[sel], flat_s[sel], flat_c[sel]
    # per-class greedy NMS then global sort
    keep_all = []
    for c in range(k):
        csel = np.nonzero(fc == c)[0]
        if not len(csel):
            continue
        keep = np_greedy_nms(
            fb[csel], fs[csel], cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST, len(csel)
        )
        keep_all.extend(csel[keep])
    keep_all = np.asarray(keep_all, np.int64)
    order = np.argsort(-fs[keep_all], kind="stable")[
        : cfg.TEST.DETECTIONS_PER_IMAGE
    ]
    want_boxes = fb[keep_all][order]
    want_scores = fs[keep_all][order]
    want_classes = fc[keep_all][order]

    # ---- compare -------------------------------------------------------
    valid = np.asarray(got.is_valid[0])
    gb = np.asarray(got.boxes[0])[valid]
    gs = np.asarray(got.scores[0])[valid]
    gc = np.asarray(got.pred_classes[0])[valid]
    assert len(gb) == len(want_boxes), (len(gb), len(want_boxes))
    np.testing.assert_allclose(gs, want_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(gc, want_classes)
    np.testing.assert_allclose(gb, want_boxes, rtol=1e-3, atol=0.05)

    # Mask branch: oracle-pool the DETECTED boxes at 14x14, run the mask
    # head, gather each detection's class channel.
    mpooled = oracle_pool(want_boxes, 14)
    mlogits = jax.device_get(
        jax.jit(lambda v, m: module.apply(v, m, train=False, method="mask"))(
            variables, jnp.asarray(mpooled, dtype)
        )
    )
    want_masks = 1 / (1 + np.exp(
        -mlogits[np.arange(len(want_classes)), :, :, want_classes]
    ))
    got_masks = np.asarray(got.pred_masks[0])[valid]
    np.testing.assert_allclose(got_masks, want_masks, rtol=1e-3, atol=2e-3)
