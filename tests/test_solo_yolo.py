import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.models import build_model

pytestmark = pytest.mark.slow  # full-detector jit compiles



def _batch(b=1, h=64, w=64, g=2):
    return {
        "image": jnp.full((b, h, w, 3), 90.0),
        "image_size": jnp.tile(jnp.array([[h, w]]), (b, 1)),
        "gt_boxes": jnp.tile(
            jnp.array([[[4.0, 4.0, 30.0, 30.0], [30.0, 30.0, 60.0, 58.0]]]), (b, 1, 1)
        ),
        "gt_classes": jnp.tile(jnp.array([[1, 3]]), (b, 1)),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_is_crowd": jnp.zeros((b, g), bool),
        "gt_masks": jnp.ones((b, g, 28, 28)),
    }


def test_solov2():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/COCO-InstanceSegmentation/solo_v2_R_50_FPN_1x.yaml"
    )
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 4
    cfg.MODEL.SOLO.NUM_GRIDS = [12, 10, 8, 6, 4]
    cfg.MODEL.SOLO.MASK_KERNEL_CONVS_DIM = 64
    cfg.MODEL.SOLO.MASK_KERNEL_NUM_CONVS = 2
    cfg.MODEL.SOLO.MASK_FEATURE_CONVS_DIM = 32
    cfg.MODEL.SOLO.MASK_FEATURE_OUT_DIMS = 32
    cfg.MODEL.SOLO.TOPK_CANDIDATES_TEST = 50
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    model = build_model(cfg)
    batch = _batch()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    total, (losses, _) = jax.jit(model.loss_fn)(
        variables, batch, jax.random.PRNGKey(1), {}
    )
    assert set(losses) == {"loss_ins", "loss_cate"}
    assert np.isfinite(float(total)), losses
    out = jax.jit(model.predict)(variables, batch)
    assert out.boxes.shape == (1, 8, 4)
    assert out.pred_masks.shape[1] == 8  # stride-4 masks
    assert bool(jnp.isfinite(out.scores).all())

    # dice+bce (saturation-safe from-scratch variant) adds a positive BCE
    # term on the same predictions and must stay differentiable/finite.
    cfg.MODEL.SOLO.INS_LOSS_TYPE = "dice+bce"
    model2 = build_model(cfg)
    total2, (losses2, _) = jax.jit(model2.loss_fn)(
        variables, batch, jax.random.PRNGKey(1), {}
    )
    assert np.isfinite(float(total2))
    assert float(losses2["loss_ins"]) > float(losses["loss_ins"])


def test_yolov4():
    cfg = get_cfg()
    cfg.merge_from_file("/root/reference/configs/COCO-Detection/yolov4_D_53_PAN_1x.yaml")
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 4
    cfg.MODEL.NECK.OUT_CHANNELS = 32
    cfg.MODEL.YOLOV4.CONV_DIMS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    model = build_model(cfg)
    batch = _batch(h=64, w=64)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    # darknet + PAN structural checks
    p = variables["params"]
    assert "backbone" in p and "neck" in p and "head" in p
    assert "res5" in p["backbone"]
    total, (losses, _) = jax.jit(model.loss_fn)(
        variables, batch, jax.random.PRNGKey(1), {}
    )
    assert set(losses) == {"box_loss", "conf_loss", "cls_loss"}
    assert np.isfinite(float(total)), {k: float(v) for k, v in losses.items()}
    out = jax.jit(model.predict)(variables, batch)
    assert out.boxes.shape == (1, 8, 4)
    b = np.asarray(out.boxes[0])
    assert b[:, 2].max() <= 64 + 1e-3  # clipped


def test_yolo_anchor_generator_shapes():
    from detectron2_tensorflow_tpu.models.anchors import YOLOAnchorGenerator

    gen = YOLOAnchorGenerator(
        sizes=[[[12, 16], [19, 36], [40, 28]]], strides=[8]
    )
    anchors = np.asarray(gen([(2, 2)])[0])
    assert anchors.shape == (12, 4)
    # first anchor: centered at (4, 4), w=12 h=16
    np.testing.assert_allclose(anchors[0], [4 - 6, 4 - 8, 4 + 6, 4 + 8])
