"""TTA, precise-BN, and the panoptic evaluation loop (all config-key-only
vestiges in the reference, implemented here)."""

import json
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.engine.tta import precise_bn, tta_predict
from detectron2_tensorflow_tpu.models import build_model

pytestmark = pytest.mark.slow  # full-detector jit compiles



def _tiny_rcnn_cfg():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml"
    )
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 6
    return cfg


def test_tta_predict_merges_scales():
    cfg = _tiny_rcnn_cfg()
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 128
    cfg.TEST.AUG.FLIP = True
    model = build_model(cfg)
    batch = {
        "image": jnp.full((1, 64, 96, 3), 100.0),
        "image_size": jnp.array([[64, 96]]),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = tta_predict(cfg, model, variables, batch)
    assert out.boxes.shape == (1, 6, 4)
    b = np.asarray(out.boxes[0])
    v = np.asarray(out.is_valid[0])
    # merged boxes live at the ORIGINAL resolution
    assert b[v][:, 2].max() <= 96 + 1e-2
    assert b[v][:, 3].max() <= 64 + 1e-2
    # scores stay sorted desc over valid entries
    s = np.asarray(out.scores[0])[v]
    assert np.all(np.diff(s) <= 1e-6)


def test_flip_content_keeps_padding_zero():
    from detectron2_tensorflow_tpu.engine.tta import flip_content

    img = np.zeros((1, 8, 16, 3), np.float32)
    img[0, :4, :6] = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
    scaled = {"image": jnp.asarray(img), "image_size": jnp.array([[4, 6]])}
    out = flip_content(scaled)
    got = np.asarray(out["image"])
    # content mirrored in place
    np.testing.assert_allclose(got[0, :4, :6], img[0, :4, :6][:, ::-1])
    # padding untouched — the image must NOT move into the padding columns
    assert got[0, :, 6:].sum() == 0 and got[0, 4:].sum() == 0


def test_tta_wide_image_does_not_overflow_bucket():
    # A wide image resized under MAX_SIZE can need width >> 2*min(MIN_SIZES);
    # the bucket must grow with the aspect ratio instead of crashing.
    cfg = _tiny_rcnn_cfg()
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (32,)
    cfg.TEST.AUG.MAX_SIZE = 256
    cfg.TEST.AUG.FLIP = False
    model = build_model(cfg)
    batch = {
        "image": jnp.full((1, 32, 256, 3), 90.0),
        "image_size": jnp.array([[32, 256]]),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = tta_predict(cfg, model, variables, batch)
    assert out.boxes.shape == (1, 6, 4)


def test_precise_bn_recovers_true_moments():
    """precise_bn must yield the TRUE batch-moment averages, not the
    EMA-blended stats (which keep ~momentum of the stale values)."""
    import types

    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9
            )(x)

    mod = Net()
    x0 = jnp.zeros((4, 8, 8, 3), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x0, train=True)
    # Poison the running stats so EMA blending is detectable.
    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(
        lambda v: v + 100.0, variables["batch_stats"]
    )

    rng = np.random.default_rng(1)
    data = [rng.normal(5.0, 2.0, (4, 8, 8, 3)).astype(np.float32) for _ in range(4)]

    def batches():
        for d in data:
            yield {"image": jnp.asarray(d)}

    model = types.SimpleNamespace(module=mod)
    updated = precise_bn(model, variables, batches(), num_iters=4)
    got_mean = np.asarray(updated["batch_stats"]["BatchNorm_0"]["mean"])
    got_var = np.asarray(updated["batch_stats"]["BatchNorm_0"]["var"])
    want_mean = np.mean([d.mean(axis=(0, 1, 2)) for d in data], axis=0)
    want_var = np.mean([d.var(axis=(0, 1, 2)) for d in data], axis=0)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_var, want_var, rtol=1e-3, atol=1e-3)


def test_precise_bn_updates_stats():
    cfg = _tiny_rcnn_cfg()
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    model = build_model(cfg)
    batch = {
        "image": jnp.full((2, 64, 64, 3), 100.0),
        "image_size": jnp.array([[64, 64], [64, 64]]),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    assert "batch_stats" in variables

    def batches():
        rng = np.random.default_rng(0)
        while True:
            yield {
                "image": jnp.asarray(
                    rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
                ),
                "image_size": jnp.array([[64, 64], [64, 64]]),
            }

    updated = precise_bn(model, variables, batches(), num_iters=3)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updated["batch_stats"])
    changed = any(bool(jnp.any(a != b)) for a, b in zip(before, after))
    assert changed
    # params untouched
    assert jax.tree.all(
        jax.tree.map(lambda a, b: bool((a == b).all()), variables["params"], updated["params"])
    )


def test_panoptic_eval_loop(tmp_path):
    from detectron2_tensorflow_tpu.data import build_dataloader
    from detectron2_tensorflow_tpu.data.panoptic import CocoPanopticDataset, id_to_rgb
    from detectron2_tensorflow_tpu.engine.evaluator import evaluate_panoptic

    # tiny on-disk panoptic dataset
    os.makedirs(tmp_path / "pano", exist_ok=True)
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    h, w = 80, 120
    for i in range(2):
        cv2.imwrite(str(tmp_path / "imgs" / f"{i}.jpg"), np.full((h, w, 3), 60, np.uint8))
        seg = np.zeros((h, w), np.int64)
        seg[10:40, 10:50] = 5
        seg[50:80, :] = 9
        cv2.imwrite(
            str(tmp_path / "pano" / f"{i}.png"),
            cv2.cvtColor(id_to_rgb(seg), cv2.COLOR_RGB2BGR),
        )
    pano_json = {
        "images": [
            {"id": i, "file_name": f"{i}.jpg", "height": h, "width": w}
            for i in range(2)
        ],
        "annotations": [
            {
                "image_id": i,
                "file_name": f"{i}.png",
                "segments_info": [
                    {"id": 5, "category_id": 1, "iscrowd": 0, "area": 1200},
                    {"id": 9, "category_id": 10, "iscrowd": 0, "area": 3600},
                ],
            }
            for i in range(2)
        ],
        "categories": [
            {"id": 1, "name": "cat", "isthing": 1},
            {"id": 10, "name": "grass", "isthing": 0},
        ],
    }
    with open(tmp_path / "pano.json", "w") as f:
        json.dump(pano_json, f)
    ds = CocoPanopticDataset(
        str(tmp_path / "pano.json"), str(tmp_path / "pano"), str(tmp_path / "imgs")
    )

    cfg = _tiny_rcnn_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 2
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST = 64
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST = 128
    cfg.TRANSFORM.RESIZE.MINI_MASK_SIZE = 28
    cfg.INPUT.PAD_BUCKETS = ((64, 128),)
    cfg.INPUT.MAX_GT_INSTANCES = 4
    cfg.SOLVER.IMS_PER_BATCH = 2
    model = build_model(cfg)

    eval_iter = build_dataloader(cfg, ds, training=False)
    eval_iter = ({k: jnp.asarray(v) for k, v in b.items()} for b in eval_iter)
    first = next(eval_iter)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), first)

    def chain():
        yield first
        yield from eval_iter

    metrics = evaluate_panoptic(cfg, model, variables, ds, chain())
    # random weights -> PQ near 0, but the full pipeline must produce metrics
    for k in ("panoptic/PQ", "panoptic/SQ", "panoptic/RQ"):
        assert k in metrics and np.isfinite(metrics[k])

    # EVAL.METRICS dispatch: one call produces every requested family
    # (detection + instance-seg + semantic + panoptic), like the reference's
    # panoptic_fpn quick_schedules gate.
    from detectron2_tensorflow_tpu.engine.evaluator import run_evaluation

    cfg.EVAL.METRICS = (
        "coco_detection_metrics",
        "coco_instance_segmentation_metrics",
        "semantic_segmentation_metrics",
        "panoptic_segmentation_metrics",
    )

    def fresh():
        it = build_dataloader(cfg, ds, training=False)
        return ({k: jnp.asarray(v) for k, v in b.items()} for b in it)

    all_metrics = run_evaluation(cfg, model, variables, ds, fresh)
    for k in ("bbox/AP", "segm/AP", "sem_seg/mIoU", "panoptic/PQ"):
        assert k in all_metrics and np.isfinite(all_metrics[k]), sorted(all_metrics)


def test_tta_attaches_masks_via_given_boxes():
    """TTA must produce pred_masks for MASK_ON models by re-running the
    mask head on the merged boxes (the reference's detected_instances
    inference path, rcnn.py:93-122)."""
    cfg = _tiny_rcnn_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (48,)
    cfg.TEST.AUG.MAX_SIZE = 96
    cfg.TEST.AUG.FLIP = False
    model = build_model(cfg)
    batch = {
        "image": jnp.full((1, 64, 96, 3), 100.0),
        "image_size": jnp.array([[64, 96]]),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = tta_predict(cfg, model, variables, batch)
    assert "pred_masks" in out
    assert out.pred_masks.shape[:2] == (1, 6)
    m = np.asarray(out.pred_masks[0])
    assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()


def test_eval_loop_dispatches_tta():
    """TEST.AUG.ENABLED must route the evaluation loop's prediction through
    the per-image multi-scale merge (round-2: the knob previously only
    worked via direct tta_predict calls, never from eval)."""
    from detectron2_tensorflow_tpu.data import build_dataloader
    from detectron2_tensorflow_tpu.engine.evaluator import evaluate
    from test_data import SyntheticDataset

    cfg = _tiny_rcnn_cfg()
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 128
    cfg.TEST.AUG.FLIP = False  # halve the compile count; flip covered above
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST = 64
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST = 128
    cfg.INPUT.PAD_BUCKETS = ((64, 128), (128, 64))
    cfg.SOLVER.IMS_PER_BATCH = 2

    ds = SyntheticDataset(n=4, num_classes=3)
    model = build_model(cfg)
    it = build_dataloader(cfg, ds, training=False)
    batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in it]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0])
    metrics = evaluate(cfg, model, variables, ds, iter(batches))
    assert "bbox/AP" in metrics and np.isfinite(metrics["bbox/AP"]), metrics
