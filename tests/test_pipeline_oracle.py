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


def np_class_aware_nms(boxes, scores, classes, thresh, max_out):
    """Sequential transcription of ops.nms.class_aware_nms: the class-offset
    trick (reference fast_rcnn.py:138-146) reduces per-class NMS to one
    greedy sweep in global score order."""
    max_coord = float(np.max(np.where(np.isfinite(boxes), boxes, 0.0))) + 1.0
    shifted = boxes + (classes.astype(boxes.dtype) * max_coord)[:, None]
    keep = np_greedy_nms(shifted, scores, thresh, max_out)
    return keep


def np_avgpool2x(f):
    hh, ww = f.shape[0] // 2 * 2, f.shape[1] // 2 * 2
    return f[:hh, :ww].reshape(
        hh // 2, 2, ww // 2, 2, f.shape[-1]
    ).mean(axis=(1, 3))


def make_oracle_pool(planes_np, strides, max_img, canonical_level=4):
    """Independent numpy transcription of the production pooling route
    (models/poolers.py plan_rois): pure-area FPN level rule + extent-tier
    alias routing + literal-D2 adaptive ROIAlign. Works for any number of
    base levels (FPN 4-level and C4/DC5 single-level alike)."""
    import math

    from detectron2_tensorflow_tpu.models.poolers import (
        _EXTENT_MARGIN,
        plan_patch,
    )

    patch, _ = plan_patch(max_img, strides[-1])
    bound = patch - _EXTENT_MARGIN
    base_l = len(strides)
    planes = [np.asarray(p, np.float32) for p in planes_np]
    planes += [np_avgpool2x(p) for p in planes[:base_l]]
    planes.append(np_avgpool2x(planes[2 * base_l - 1]))
    plane_strides = list(strides) + [2 * s for s in strides] + [4 * strides[-1]]
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    strides_arr = np.asarray(strides, np.float32)

    def pool(boxes, out_size):
        w = np.clip(boxes[:, 2] - boxes[:, 0], 0, None)
        h = np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
        lvl = np.floor(
            canonical_level + np.log2(np.sqrt(w * h) / 224 + 1e-8)
        )
        base = np.clip(lvl, min_level, max_level).astype(int) - min_level
        max_side = np.maximum(w, h)
        extent = max_side / strides_arr[base]
        idx = np.where(extent > bound, base + base_l, base)
        idx = np.where(extent > 2 * bound, 2 * base_l, idx)
        out = np.zeros(
            (len(boxes), out_size, out_size, planes[0].shape[-1]), np.float32
        )
        for i, (box, lv) in enumerate(zip(boxes, idx)):
            out[i] = roi_align_reference(
                planes[lv], box[None], 1.0 / plane_strides[lv], out_size, 0
            )[0]
        return out

    return pool


def np_rpn_proposals(logits, deltas, anchors, hw, pre_k, post_k, nms_thresh):
    """Sequential transcription of models/rpn.py RPN.proposals for image 0:
    per level top-k -> decode -> clip -> nonempty mask -> greedy NMS; then
    cross-level top-k to the fixed budget."""
    cand_b, cand_s = [], []
    for logit, delta, anc in zip(logits, deltas, anchors):
        s = logit[0].reshape(-1)
        d = delta[0].reshape(-1, 4)
        k = min(pre_k, len(s))
        top = np.argsort(-s, kind="stable")[:k]
        boxes = np_clip(np_decode(d[top], anc[top], (1, 1, 1, 1))[:, 0], hw)
        wpos = (boxes[:, 2] - boxes[:, 0] > 0) & (boxes[:, 3] - boxes[:, 1] > 0)
        boxes, ss = boxes[wpos], s[top][wpos]
        keep = np_greedy_nms(boxes, ss, nms_thresh, min(post_k, k))
        cand_b.append(boxes[keep])
        cand_s.append(ss[keep])
    all_b = np.concatenate(cand_b)
    all_s = np.concatenate(cand_s)
    order = np.argsort(-all_s, kind="stable")[:post_k]
    return all_b[order]


def np_fast_rcnn_inference(probs, decoded, score_thresh, nms_thresh, max_out):
    """probs [P, K] (softmax, background dropped); decoded [P, K, 4]."""
    k = probs.shape[1]
    flat_s = probs.reshape(-1)
    flat_c = np.tile(np.arange(k), len(probs))
    flat_b = decoded.reshape(-1, 4)
    sel = flat_s > score_thresh
    fb, fs, fc = flat_b[sel], flat_s[sel], flat_c[sel]
    keep = np_class_aware_nms(fb, fs, fc, nms_thresh, max_out)
    order = keep[np.argsort(-fs[keep], kind="stable")]
    return fb[order], fs[order], fc[order]


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


# ---------------------------------------------------------------------------
# Per-family oracles (VERDICT r2 #2): the same independent-sequential-numpy
# discipline for every inference family whose post-feature pipeline differs
# from the FPN R-CNN covered above.
# ---------------------------------------------------------------------------


def test_retinanet_inference_matches_numpy_oracle():
    """RetinaNet: per-level top-k -> sigmoid -> decode -> class-offset NMS
    (reference single_stage_heads/retinanet.py:285-387). The oracle does one
    full sort over HWA*K per level (the production two-stage top-k must be
    exactly equivalent), sequential greedy NMS with the offset trick."""
    from detectron2_tensorflow_tpu.models.meta_arch.common import (
        preprocess_images,
    )
    from detectron2_tensorflow_tpu.models.meta_arch.single_stage import (
        _build_backbone_neck,
    )
    from detectron2_tensorflow_tpu.models.single_stage.retinanet import RetinaNet
    from tests.test_retinanet import retinanet_cfg

    cfg = retinanet_cfg()
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = 0.3
    model = build_model(cfg)
    rng = np.random.default_rng(7)
    hw = (64, 96)
    batch = {
        "image": jnp.asarray(
            rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32)
        ),
        "image_size": jnp.asarray([list(hw)], jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), batch)
    got = jax.device_get(jax.jit(model.predict)(variables, batch))

    # Head outputs (shared weights; layer math covered by unit tests).
    images = preprocess_images(
        batch["image"], cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
        cfg.MODEL.INPUT_FORMAT, jnp.float32,
    )
    logits, deltas = jax.device_get(
        jax.jit(lambda v, im: model.module.apply(v, im, train=False))(
            variables, images
        )
    )
    _, _, neck_shapes, _ = _build_backbone_neck(cfg)
    drv = RetinaNet(cfg, neck_shapes)
    anchors = [
        np.asarray(a)
        for a in drv.anchor_generator([(l.shape[1], l.shape[2]) for l in logits])
    ]

    cand_b, cand_s, cand_c = [], [], []
    for logit, delta, anc in zip(logits, deltas, anchors):
        k_cls = drv.num_classes
        per_pos = logit[0].reshape(-1, k_cls)
        s = 1.0 / (1.0 + np.exp(-per_pos.reshape(-1)))
        k = min(drv.topk_candidates, s.size)
        top = np.argsort(-s, kind="stable")[:k]
        anchor_idx = top // k_cls
        cls = top % k_cls
        boxes = np_decode(
            delta[0].reshape(-1, 4)[anchor_idx], anc[anchor_idx], (1, 1, 1, 1)
        )[:, 0]
        boxes = np_clip(boxes, hw)
        sel = s[top] > drv.score_thresh
        cand_b.append(boxes[sel])
        cand_s.append(s[top][sel])
        cand_c.append(cls[sel])
    fb = np.concatenate(cand_b)
    fs = np.concatenate(cand_s)
    fc = np.concatenate(cand_c)
    keep = np_class_aware_nms(
        fb, fs, fc, drv.nms_thresh, drv.detections_per_image
    )
    order = keep[np.argsort(-fs[keep], kind="stable")]

    valid = np.asarray(got.is_valid[0])
    assert valid.sum() == len(order), (valid.sum(), len(order))
    assert valid.any(), "vacuous: no valid RetinaNet detections"
    np.testing.assert_allclose(
        np.asarray(got.scores[0])[valid], fs[order], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.pred_classes[0])[valid], fc[order]
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes[0])[valid], fb[order], rtol=1e-3, atol=0.05
    )


def _rcnn_oracle_common(cfg, seed, hw=(128, 160)):
    """Build model + random batch; return (cfg pieces, jitted outputs,
    numpy features, proposals-from-oracle)."""
    model = build_model(cfg)
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32)
    batch = {
        "image": jnp.asarray(img),
        "image_size": jnp.asarray([list(hw)], jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), batch)
    got = jax.device_get(jax.jit(model.predict)(variables, batch))

    module, rpn_drv, roi_drv, neck_shapes, dtype = _build_rcnn_parts(cfg)
    drv = _RCNNDrivers(cfg, module, rpn_drv, roi_drv, neck_shapes, dtype, False)
    feats, logits, deltas = jax.device_get(
        jax.jit(lambda v, b: drv.features_and_rpn(v, b, False))(variables, batch)
    )
    anchors = [
        np.asarray(a)
        for a in rpn_drv.anchor_generator(
            [(l.shape[1], l.shape[2]) for l in logits]
        )
    ]
    proposals = np_rpn_proposals(
        logits, deltas, anchors, hw,
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
        cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
        cfg.MODEL.RPN.NMS_THRESH,
    )
    return model, variables, got, module, feats, proposals, hw


def test_c4_inference_matches_numpy_oracle():
    """C4/Res5: single-level pooling (res4, stride 16, extent-tier aliases)
    -> shared res5 transform -> mean-pool predictor -> class-aware NMS ->
    mask via the SAME res5 on detected boxes (reference roi_heads.py:261-408).
    """
    from detectron2_tensorflow_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/COCO-InstanceSegmentation/mask_rcnn_R_50_C4_1x.yaml"
    )
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TRAIN = (128,)
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN = 160
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST = 128
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST = 160

    model, variables, got, module, feats, proposals, hw = _rcnn_oracle_common(
        cfg, seed=11
    )

    max_img = max(cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN,
                  cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST)
    pool = make_oracle_pool([feats["res4"][0]], [16], max_img)
    res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    pooled = pool(proposals, res)

    scores_l, ds_l, _ = jax.device_get(
        jax.jit(
            lambda v, p: module.apply(v, p, stage=0, train=False, method="box")
        )(variables, jnp.asarray(pooled))
    )
    probs = np.asarray(jax.nn.softmax(jnp.asarray(scores_l), -1))[:, :-1]
    kcls = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    decoded = np_clip(
        np_decode(ds_l, proposals, cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS), hw
    )
    want_boxes, want_scores, want_classes = np_fast_rcnn_inference(
        probs, decoded, cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST, cfg.TEST.DETECTIONS_PER_IMAGE,
    )

    valid = np.asarray(got.is_valid[0])
    assert valid.sum() == len(want_boxes), (valid.sum(), len(want_boxes))
    assert valid.any(), "vacuous: no valid detections"
    np.testing.assert_allclose(
        np.asarray(got.scores[0])[valid], want_scores, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.pred_classes[0])[valid], want_classes
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes[0])[valid], want_boxes, rtol=1e-3, atol=0.05
    )

    # Mask branch: pool DETECTED boxes, res5 again, mask head, class gather.
    mpooled = pool(want_boxes, res)
    _, _, rf = jax.device_get(
        jax.jit(
            lambda v, p: module.apply(v, p, stage=0, train=False, method="box")
        )(variables, jnp.asarray(mpooled))
    )
    mlogits = jax.device_get(
        jax.jit(lambda v, m: module.apply(v, m, train=False, method="mask"))(
            variables, jnp.asarray(rf)
        )
    )
    cls_idx = np.clip(want_classes, 0, kcls - 1)
    want_masks = 1 / (1 + np.exp(
        -mlogits[np.arange(len(want_classes)), :, :, cls_idx]
    ))
    got_masks = np.asarray(got.pred_masks[0])[valid]
    np.testing.assert_allclose(got_masks, want_masks, rtol=1e-3, atol=2e-3)


def test_cascade_inference_matches_numpy_oracle():
    """Cascade R-CNN: 3 stages, each re-pooling the previous stage's decoded
    boxes with its own Box2BoxTransform; inference averages softmax scores
    over stages and decodes the LAST stage's class-agnostic deltas
    (reference cascade_rcnn.py:101-120)."""
    cfg = tiny_rcnn_cfg()
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05

    model, variables, got, module, feats, proposals, hw = _rcnn_oracle_common(
        cfg, seed=13
    )

    max_img = max(cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN,
                  cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST)
    fnames = ["p2", "p3", "p4", "p5"]
    pool = make_oracle_pool(
        [feats[n][0] for n in fnames], [4, 8, 16, 32], max_img
    )
    res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    stage_weights = [
        tuple(w) for w in cfg.MODEL.ROI_BOX_CASCADE_HEAD.BBOX_REG_WEIGHTS
    ]
    num_stages = len(cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS)

    boxes = proposals
    stage_probs = []
    ds_l = None
    for k in range(num_stages):
        pooled = pool(boxes, res)
        scores_l, ds_l, _ = jax.device_get(
            jax.jit(
                lambda v, p, k=k: module.apply(
                    v, p, stage=k, train=False, method="box"
                )
            )(variables, jnp.asarray(pooled))
        )
        stage_probs.append(np.asarray(jax.nn.softmax(jnp.asarray(scores_l), -1)))
        if k + 1 < num_stages:
            boxes = np_clip(
                np_decode(ds_l, boxes, stage_weights[k])[:, 0], hw
            )

    mean_probs = sum(stage_probs) / num_stages
    probs = mean_probs[:, :-1]
    kcls = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    # cls-agnostic: one decoded box broadcast over classes.
    final = np_clip(np_decode(ds_l, boxes, stage_weights[-1])[:, 0], hw)
    decoded = np.broadcast_to(final[:, None, :], (len(final), kcls, 4))
    want_boxes, want_scores, want_classes = np_fast_rcnn_inference(
        probs, decoded, cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST, cfg.TEST.DETECTIONS_PER_IMAGE,
    )

    valid = np.asarray(got.is_valid[0])
    assert valid.sum() == len(want_boxes), (valid.sum(), len(want_boxes))
    assert valid.any(), "vacuous: no valid detections"
    np.testing.assert_allclose(
        np.asarray(got.scores[0])[valid], want_scores, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.pred_classes[0])[valid], want_classes
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes[0])[valid], want_boxes, rtol=1e-3, atol=0.05
    )


def np_matrix_nms(masks, labels, scores, sigma, kernel):
    """Numpy transcription of SOLOv2 Matrix NMS (reference nms.py:29-83)."""
    n = len(masks)
    flat = masks.reshape(n, -1).astype(np.float32)
    areas = flat.sum(axis=1)
    inter = flat @ flat.T
    union = areas[:, None] + areas[None, :] - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1e-6), 0.0)
    upper = np.triu(np.ones((n, n), bool), k=1)
    same = labels[:, None] == labels[None, :]
    decay_iou = np.where(upper & same, iou, 0.0)
    compensate = decay_iou.max(axis=0)
    if kernel == "gaussian":
        decay = np.exp(-(decay_iou**2 - compensate[:, None] ** 2) * sigma)
    else:
        decay = (1.0 - decay_iou) / np.maximum(1.0 - compensate[:, None], 1e-6)
    return scores * np.minimum(decay.min(axis=0), 1.0)


def test_solov2_inference_matches_numpy_oracle():
    """SOLOv2: point-NMS -> top-k -> dynamic conv -> maskness rescore ->
    matrix NMS -> mask-extent boxes (reference solo_v2.py:476-627)."""
    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.models.meta_arch.common import (
        preprocess_images,
    )
    from detectron2_tensorflow_tpu.models.meta_arch.single_stage import (
        _build_backbone_neck,
    )
    from detectron2_tensorflow_tpu.models.single_stage.solov2 import SOLOv2

    cfg = get_cfg()
    cfg.merge_from_file("configs/COCO-InstanceSegmentation/solo_v2_R_50_FPN_1x.yaml")
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 3
    cfg.MODEL.SOLO.NUM_GRIDS = [12, 10, 8, 6, 4]
    cfg.MODEL.SOLO.TOPK_CANDIDATES_TEST = 32
    # Random-init sigmoid scores sit near the 0.01 prior; keep candidates.
    cfg.MODEL.SOLO.SCORE_THRESH_TEST = 0.005
    cfg.MODEL.SOLO.UPDATE_SCORE_THRESH_TEST = 0.001
    cfg.TEST.DETECTIONS_PER_IMAGE = 8

    model = build_model(cfg)
    rng = np.random.default_rng(17)
    hw = (128, 160)
    batch = {
        "image": jnp.asarray(
            rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32)
        ),
        "image_size": jnp.asarray([list(hw)], jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(5), batch)
    got = jax.device_get(jax.jit(model.predict)(variables, batch))

    images = preprocess_images(
        batch["image"], cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
        cfg.MODEL.INPUT_FORMAT, jnp.float32,
    )
    cate, kernels, mask_feat = jax.device_get(
        jax.jit(lambda v, im: model.module.apply(v, im, train=False))(
            variables, images
        )
    )
    _, _, neck_shapes, _ = _build_backbone_neck(cfg)
    drv = SOLOv2(cfg, neck_shapes)

    # Point NMS per level (strict 2x2 local maxima), flatten, global top-k.
    scores_l, kerns_l = [], []
    for logit, kern in zip(cate, kernels):
        s = 1.0 / (1.0 + np.exp(-np.asarray(logit[0], np.float32)))
        gh, gw, kc = s.shape
        padded = np.full((gh + 1, gw + 1, kc), -np.inf, np.float32)
        padded[:gh, :gw] = s
        pooled = np.maximum(
            np.maximum(padded[:gh, :gw], padded[1 : gh + 1, :gw]),
            np.maximum(padded[:gh, 1 : gw + 1], padded[1 : gh + 1, 1 : gw + 1]),
        )
        # reduce_window pads [(1,0),(1,0)]: window covers (y..y+1, x..x+1)
        # AFTER a leading pad, i.e. neighbors (y-1..y, x-1..x).
        padded2 = np.full((gh + 1, gw + 1, kc), -np.inf, np.float32)
        padded2[1:, 1:] = s
        pooled = np.stack([
            padded2[y : y + 2, x : x + 2].max(axis=(0, 1))
            for y in range(gh) for x in range(gw)
        ]).reshape(gh, gw, kc)
        s = np.where(s == pooled, s, 0.0)
        scores_l.append(s.reshape(-1, kc))
        kerns_l.append(np.asarray(kern[0]).reshape(-1, kern.shape[-1]))
    scores = np.concatenate(scores_l, 0)
    kerns = np.concatenate(kerns_l, 0)
    flat = scores.reshape(-1)
    k = min(drv.topk, flat.size)
    top = np.argsort(-flat, kind="stable")[:k]
    top_scores = flat[top]
    cell = top // drv.num_classes
    cls = top % drv.num_classes
    sel_kern = kerns[cell]
    mf = np.asarray(mask_feat[0], np.float32)
    pred = 1.0 / (1.0 + np.exp(-np.einsum("pe,hwe->phw", sel_kern, mf)))
    binary = pred > drv.mask_thresh
    areas = binary.sum(axis=(1, 2)).astype(np.float32)
    maskness = (pred * binary).sum(axis=(1, 2)) / np.maximum(areas, 1e-6)
    scores2 = top_scores * maskness
    valid = (top_scores > drv.score_thresh) & (areas > 0)
    scores2 = np.where(valid, scores2, 0.0)

    order = np.argsort(-scores2, kind="stable")
    binary_sorted = binary[order]
    decayed = np_matrix_nms(
        binary_sorted.astype(np.float32), cls[order], scores2[order],
        drv.nms_sigma, drv.nms_kernel,
    )
    gated = np.where(decayed > drv.update_thresh, decayed, 0.0)
    keep = np.argsort(-gated, kind="stable")[: drv.detections_per_image]
    keep_scores = gated[keep]
    final_masks = binary_sorted[keep]
    final_cls = cls[order][keep]
    final_valid = keep_scores > 0

    got_valid = np.asarray(got.is_valid[0])
    assert got_valid.any(), "vacuous: no valid SOLOv2 detections"
    np.testing.assert_array_equal(got_valid, final_valid)
    np.testing.assert_allclose(
        np.asarray(got.scores[0])[got_valid], keep_scores[final_valid],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(got.pred_classes[0])[got_valid], final_cls[final_valid]
    )
    np.testing.assert_array_equal(
        np.asarray(got.pred_masks[0])[got_valid],
        final_masks[final_valid],
    )
    # Boxes from mask extents * 4 (stride-4 mask resolution).
    hm, wm = final_masks.shape[1:]
    for i in np.nonzero(final_valid)[0]:
        ys, xs = np.nonzero(final_masks[i])
        want = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        np.testing.assert_allclose(
            np.asarray(got.boxes[0])[i], np.asarray(want, np.float32) * 4.0,
            atol=1e-4,
        )


def test_yolov4_inference_matches_numpy_oracle():
    """YOLOv4: grid decode (center = (cell_index + scale*sigmoid - 0.5*(s-1))
    * stride, size = exp(twh) * cell-anchor wh), score = sigmoid(conf) *
    sigmoid(cls), score-max filter, CLASS-AGNOSTIC greedy NMS — reference
    yolov4_outputs.py:208-264 (_get_predictions) and :331-390 (inference).
    Documented deviation: this build clips boxes to the image before NMS
    (D2 convention); the reference leaves them unclipped."""
    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.models.meta_arch.common import (
        preprocess_images,
    )
    from detectron2_tensorflow_tpu.models.meta_arch.single_stage import (
        _build_backbone_neck,
    )
    from detectron2_tensorflow_tpu.models.single_stage.yolov4 import YOLOv4

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/COCO-Detection/yolov4_D_53_PAN_1x.yaml"
    )
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 4
    cfg.MODEL.NECK.OUT_CHANNELS = 32
    cfg.MODEL.YOLOV4.CONV_DIMS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    # Random-init probs sit near sigmoid(0)^2 = 0.25; keep candidates.
    cfg.MODEL.YOLOV4.SCORE_THRESH_TEST = 0.2

    model = build_model(cfg)
    rng = np.random.default_rng(23)
    hw = (64, 96)
    batch = {
        "image": jnp.asarray(
            rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32)
        ),
        "image_size": jnp.asarray([list(hw)], jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(7), batch)
    got = jax.device_get(jax.jit(model.predict)(variables, batch))

    images = preprocess_images(
        batch["image"], cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
        cfg.MODEL.INPUT_FORMAT, jnp.float32,
    )
    preds = jax.device_get(
        jax.jit(lambda v, im: model.module.apply(v, im, train=False))(
            variables, images
        )
    )
    _, _, neck_shapes, _ = _build_backbone_neck(cfg)
    drv = YOLOv4(cfg, neck_shapes)

    all_boxes, all_scores, all_cls = [], [], []
    for level, p in enumerate(preds):
        p = np.asarray(p[0], np.float32)
        hh, ww = p.shape[:2]
        a = drv.num_anchors
        k_cls = drv.num_classes
        p = p.reshape(hh, ww, a, 5 + k_cls)
        stride = drv.strides[level]
        s = drv.scale_yx[level]
        cell = np.asarray(drv.anchor_generator.cell_anchors[level])
        wh_anchor = cell[:, 2:] - cell[:, :2]  # [A, 2] (w, h)
        sig = lambda t: 1.0 / (1.0 + np.exp(-t))
        gx = np.arange(ww, dtype=np.float32)[None, :, None]
        gy = np.arange(hh, dtype=np.float32)[:, None, None]
        cx = (gx + s * sig(p[..., 0]) - 0.5 * (s - 1)) * stride
        cy = (gy + s * sig(p[..., 1]) - 0.5 * (s - 1)) * stride
        pw = np.exp(p[..., 2]) * wh_anchor[None, None, :, 0]
        ph = np.exp(p[..., 3]) * wh_anchor[None, None, :, 1]
        boxes = np.stack(
            [cx - pw / 2, cy - ph / 2, cx + pw / 2, cy + ph / 2], axis=-1
        ).reshape(-1, 4)
        prob = sig(p[..., 4:5]) * sig(p[..., 5:])  # [h, w, a, K]
        all_boxes.append(boxes)
        all_scores.append(prob.reshape(-1, k_cls))
    boxes = np.concatenate(all_boxes, 0)
    probs = np.concatenate(all_scores, 0)
    score = probs.max(axis=-1)
    cls = probs.argmax(axis=-1)
    k = min(drv.topk_pre_nms, score.shape[0])
    top = np.argsort(-score, kind="stable")[:k]
    tb = np_clip(boxes[top], hw)
    ts = score[top]
    tc = cls[top]
    sel = ts > drv.score_thresh
    keep = np_greedy_nms(
        tb[sel], ts[sel], drv.nms_thresh, drv.detections_per_image
    )

    valid = np.asarray(got.is_valid[0])
    assert valid.any(), "vacuous: no valid YOLOv4 detections"
    assert valid.sum() == len(keep), (valid.sum(), len(keep))
    np.testing.assert_allclose(
        np.asarray(got.scores[0])[valid], ts[sel][keep], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.pred_classes[0])[valid], tc[sel][keep]
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes[0])[valid], tb[sel][keep], rtol=1e-3, atol=0.05
    )


def np_paste_masks(masks, boxes, image_size, threshold=0.5):
    """Numpy transcription of structures/masks.paste_masks_in_image
    (separable hat-weight bilinear, half-pixel centers, zero padding)."""
    h, w = image_size
    out = []
    for mask, box in zip(masks, boxes):
        mh, mw = mask.shape
        x0, y0, x1, y1 = box

        def wmat(size, lo, hi, m):
            pix = np.arange(size, dtype=np.float64) + 0.5
            coord = (pix - lo) / max(hi - lo, 1e-4) * m - 0.5
            cells = np.arange(m, dtype=np.float64)
            return np.maximum(0.0, 1.0 - np.abs(coord[:, None] - cells[None, :]))

        wy = wmat(h, y0, y1, mh)
        wx = wmat(w, x0, x1, mw)
        out.append(wy @ mask.astype(np.float64) @ wx.T > threshold)
    return np.stack(out)


def test_panoptic_fusion_matches_numpy_oracle():
    """PanopticFPN fusion: sorted-instance overlay (intersect/mask_area <
    overlap_threshold acceptance, first-come pixel ownership) then
    stuff-area fill for labels 1..K-1 — reference panoptic_fpn.py:160-296.
    Tie conventions pinned here: segment ids increment only on ACCEPTED
    segments (the reference increments always — an id-labeling choice that
    PQ ignores), stuff fills at area >= limit (upstream D2's rule; the TF
    reference uses strict >), score gate is >= (measure-zero on floats).
    Includes a stuff class with area EXACTLY == the limit to pin >=."""
    from detectron2_tensorflow_tpu.models.sem_seg import (
        combine_semantic_and_instance_outputs,
    )
    from detectron2_tensorflow_tpu.structures import Instances

    rng = np.random.default_rng(31)
    h, w = 64, 80
    d = 6
    num_stuff = 5
    # Overlapping boxes with a score ladder; two invalid slots; solid-ish
    # mask probabilities so pasted masks have real area and real overlaps.
    boxes = np.stack([
        [8, 8, 40, 40], [10, 10, 42, 44], [30, 20, 70, 60],
        [5, 35, 35, 62], [50, 5, 78, 30], [0, 0, 12, 12],
    ]).astype(np.float32)
    scores = np.asarray([0.9, 0.8, 0.85, 0.55, 0.45, 0.7], np.float32)
    classes = np.asarray([2, 1, 0, 3, 2, 1], np.int32)
    is_valid = np.asarray([1, 1, 1, 1, 1, 0], bool)
    masks = rng.uniform(0.4, 1.0, (d, 14, 14)).astype(np.float32)
    masks[1, :3] = 0.0  # carve structure so overlap fractions vary
    masks[3, :, :4] = 0.0

    # Sem-seg map from coarse blocks (label 3 reassigned below so its FREE
    # area lands exactly on the stuff_area_limit, pinning the >= rule).
    sem = rng.integers(0, num_stuff, (8, 10)).astype(np.int32)
    sem = np.kron(sem, np.ones((8, 8), np.int32))
    sem[sem == 3] = 4
    sem[:, :2] = 0
    conf_thresh = 0.5

    # ---- sequential numpy oracle: instance overlay first ----------------
    pasted = np_paste_masks(masks, boxes, (h, w))
    order_scores = np.where(is_valid, scores, -1.0)
    order = np.argsort(-order_scores, kind="stable")
    pixel = np.zeros((h, w), np.int32)
    next_id = 1
    cap = d + num_stuff + 1
    cat = np.full(cap, -1, np.int32)
    thing = np.zeros(cap, bool)
    segsc = np.zeros(cap, np.float32)
    segval = np.zeros(cap, bool)
    for det_i in order:
        mask = pasted[det_i]
        sc = order_scores[det_i]
        area = mask.sum()
        free = mask & (pixel == 0)
        ok = (
            sc >= conf_thresh and area > 0
            and free.sum() / max(area, 1) > 1 - 0.5
        )
        if ok:
            pixel[free] = next_id
            cat[next_id] = classes[det_i]
            thing[next_id] = True
            segsc[next_id] = sc
            segval[next_id] = True
            next_id += 1

    # Give label 3 a free-pixel count of EXACTLY stuff_area_limit: take
    # unoccupied thing-label (0) pixels — they are skipped by the fusion.
    stuff_area_limit = 150
    free0 = np.nonzero((sem.reshape(-1) == 0) & (pixel.reshape(-1) == 0))[0]
    assert len(free0) >= stuff_area_limit
    flat = sem.reshape(-1)
    flat[free0[:stuff_area_limit]] = 3
    # And cap label 2's FREE area strictly below the limit (reassign its
    # excess free pixels to label 4) so one stuff class is area-rejected.
    free2 = np.nonzero((flat == 2) & (pixel.reshape(-1) == 0))[0]
    flat[free2[stuff_area_limit - 1 :]] = 4
    sem = flat.reshape(h, w)
    assert ((sem == 3) & (pixel == 0)).sum() == stuff_area_limit
    n_free2 = ((sem == 2) & (pixel == 0)).sum()
    assert 0 < n_free2 < stuff_area_limit, n_free2

    for c in range(1, num_stuff):
        region = (sem == c) & (pixel == 0)
        if region.sum() >= stuff_area_limit:
            pixel[region] = next_id
            cat[next_id] = c
            thing[next_id] = False
            segval[next_id] = True
            next_id += 1

    det = Instances(
        boxes=jnp.asarray(boxes)[None],
        scores=jnp.asarray(scores)[None],
        pred_classes=jnp.asarray(classes)[None],
        is_valid=jnp.asarray(is_valid)[None],
        pred_masks=jnp.asarray(masks)[None],
    )

    got_map, got_info = jax.jit(
        lambda dd, ss: jax.vmap(
            lambda one_d, one_s: combine_semantic_and_instance_outputs(
                one_d, one_s, overlap_threshold=0.5,
                stuff_area_limit=stuff_area_limit,
                instances_confidence_threshold=conf_thresh,
                num_stuff_classes=num_stuff,
            )
        )(dd, ss)
    )(det, jnp.asarray(sem)[None])
    got_map = np.asarray(got_map[0])
    got_info = {k: np.asarray(v[0]) for k, v in got_info.items()}

    # The ==limit class must be ACCEPTED (>= convention, upstream D2 rule).
    assert segval[cat == 3].any(), "label-3 (area == limit) not accepted"

    # Non-vacuity: at least 2 thing segments accepted, at least 1 rejected
    # by the overlap rule or validity, and at least 1 stuff segment each
    # accepted and (area-capped) rejected.
    n_things = (segval & thing).sum()
    n_stuff = (segval & ~thing).sum()
    assert n_things >= 2, n_things
    assert n_things < is_valid.sum(), "no instance was rejected"
    assert n_stuff >= 1, n_stuff
    assert n_stuff < num_stuff - 1, "no stuff class was area-rejected"

    np.testing.assert_array_equal(got_map, pixel)
    np.testing.assert_array_equal(got_info["category_id"][:cap], cat)
    np.testing.assert_array_equal(got_info["is_thing"][:cap], thing)
    np.testing.assert_array_equal(got_info["valid"][:cap], segval)
    np.testing.assert_allclose(got_info["score"][:cap], segsc, rtol=1e-5)


def test_relation_duplicate_removal_matches_numpy_oracle():
    """Relation Networks learned NMS (the reference defines the config keys
    at defaults.py:441-452 and the modules in relation_module.py but never
    wires removal; this build does — STATUS.md §2.4). System-level contract
    pinned here: candidate construction (per-proposal argmax class, decoded
    best-class box, score-desc top-k of 4x detections), appearance gather by
    candidate index, final score = cls_score * sigmoid(keep logit) gated by
    score_thresh, plain top-k — NO greedy suppression. The relation/rank
    embedding math itself is pinned by tests/test_relation_paper.py."""
    cfg = tiny_rcnn_cfg()
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.ROI_HEADS.NAME = "RelationROIHeads"
    cfg.MODEL.ROI_BOX_RELATION_HEAD.DUPLICATE_REMOVAL_ON = True
    cfg.MODEL.ROI_BOX_RELATION_HEAD.NUM_GROUPS = 4
    cfg.MODEL.ROI_BOX_RELATION_HEAD.NMS_NUM_GROUP = 4
    cfg.MODEL.ROI_BOX_RELATION_HEAD.KEY_DIM = 16
    cfg.MODEL.ROI_BOX_RELATION_HEAD.RANK_EMBEDDING_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    # Random-init softmax scores hover near 1/(K+1); keep candidates.
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05

    model, variables, got, module, feats, proposals, hw = _rcnn_oracle_common(
        cfg, seed=37
    )

    max_img = max(cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN,
                  cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST)
    pool = make_oracle_pool(
        [feats[n][0] for n in ["p2", "p3", "p4", "p5"]], [4, 8, 16, 32],
        max_img,
    )
    res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    pooled = pool(proposals, res)
    n = len(proposals)

    # Box head + predictor via module.apply (RelationBoxHead consumes the
    # proposal geometry; its attention math is unit-pinned elsewhere).
    scores_l, ds_l, app = jax.device_get(
        jax.jit(
            lambda v, p, bx: module.apply(
                v, p, stage=0, train=False, method="box",
                boxes=bx[None], boxes_valid=jnp.ones((1, bx.shape[0]), bool),
            )
        )(variables, jnp.asarray(pooled), jnp.asarray(proposals))
    )
    probs_full = np.asarray(jax.nn.softmax(jnp.asarray(scores_l), -1))
    kcls = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    probs = probs_full[:, :kcls]
    decoded = np_clip(
        np_decode(ds_l, proposals, cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS), hw
    )  # [N, K, 4]

    # Candidates: per proposal the argmax foreground class + its box; then
    # score-desc top-k (k = min(P, 4 * detections_per_image)).
    cls = probs.argmax(axis=-1)
    best = probs[np.arange(n), cls]
    cb_full = decoded[np.arange(n), cls]
    k = min(4 * cfg.TEST.DETECTIONS_PER_IMAGE, n)
    idx = np.argsort(-best, kind="stable")[:k]
    cs = best[idx]
    cc = cls[idx]
    cb = cb_full[idx]
    cv = cs > 0

    # Keep logits from the dup-removal module fed with ORACLE candidates.
    keep = np.asarray(
        jax.jit(
            lambda v, a, s, b, va: module.apply(
                v, a, s, b, va, method="dup_removal"
            )
        )(
            variables, jnp.asarray(app[idx])[None], jnp.asarray(cs)[None],
            jnp.asarray(cb)[None], jnp.asarray(cv)[None],
        )
    )[0]  # [k, T] — one keep logit per IoU-threshold head
    final = cs * (1.0 / (1.0 + np.exp(-keep))).mean(axis=-1)
    final = np.where(cv & (cs > cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST), final, 0.0)
    order = np.argsort(-final, kind="stable")[: cfg.TEST.DETECTIONS_PER_IMAGE]
    want_scores = final[order]
    want_valid = want_scores > 0

    got_valid = np.asarray(got.is_valid[0])
    assert want_valid.any(), "vacuous: no valid relation detections"
    np.testing.assert_array_equal(got_valid, want_valid)
    # Tolerance note: keep logits pass candidate boxes through
    # sinusoid_embedding(100 * geometry), so the ~1e-5-px box drift between
    # the real pooler and the numpy oracle pool amplifies ~100x into the
    # attention bias; observed rel drift is ~2e-2 worst-case across the
    # multi-threshold keep heads (random-init sigmoids sit at different
    # slopes per head). The embedding formulas themselves are pinned
    # exactly in tests/test_relation_paper.py.
    np.testing.assert_allclose(
        np.asarray(got.scores[0])[got_valid], want_scores[want_valid],
        rtol=3e-2, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(got.pred_classes[0])[got_valid], cc[order][want_valid]
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes[0])[got_valid], cb[order][want_valid],
        rtol=1e-3, atol=0.05,
    )
