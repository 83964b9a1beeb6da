import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.models import build_model

pytestmark = pytest.mark.slow  # full-detector jit compiles



def test_keypoint_rcnn_end_to_end():
    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/COCO-Keypoints/keypoint_rcnn_R_50_FPN_1x.yaml")
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = (64, 64)
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 50
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 5

    model = build_model(cfg)
    b, g, k = 1, 2, 17
    kp = np.zeros((b, g, k, 3), np.float32)
    kp[0, 0, :, 0] = np.linspace(10, 28, k)  # xs inside box 0
    kp[0, 0, :, 1] = np.linspace(10, 28, k)
    kp[0, 0, :, 2] = 2  # visible
    batch = {
        "image": jnp.full((b, 64, 64, 3), 90.0),
        "image_size": jnp.array([[64, 64]]),
        "gt_boxes": jnp.array([[[8.0, 8.0, 30.0, 30.0], [32.0, 32.0, 60.0, 60.0]]]),
        "gt_classes": jnp.zeros((b, g), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_keypoints": jnp.asarray(kp),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    total, (losses, _) = jax.jit(model.loss_fn)(
        variables, batch, jax.random.PRNGKey(1), {}
    )
    assert "loss_keypoint" in losses
    assert np.isfinite(float(total)), losses

    out = jax.jit(model.predict)(variables, batch)
    assert out.pred_keypoints.shape == (1, 5, 17, 3)
    # keypoint coords live inside their detection boxes
    kps = np.asarray(out.pred_keypoints[0])
    boxes = np.asarray(out.boxes[0])
    valid = np.asarray(out.is_valid[0])
    for i in range(5):
        if not valid[i]:
            continue
        assert (kps[i, :, 0] >= boxes[i, 0] - 1e-3).all()
        assert (kps[i, :, 0] <= boxes[i, 2] + 1e-3).all()


def test_oks_matrix_values():
    from detectron2_tensorflow_tpu.evaluation.coco_eval import oks_matrix

    gt_kp = np.zeros((1, 17, 3))
    gt_kp[0, :, 0] = 50.0
    gt_kp[0, :, 1] = 50.0
    gt_kp[0, :, 2] = 2
    gt_areas = np.array([10000.0])  # COCO annotation segment area
    # Perfect prediction -> OKS 1; far prediction -> ~0.
    dt = np.stack([gt_kp[0], gt_kp[0] + [300, 300, 0]])
    oks = oks_matrix(dt, gt_kp, gt_areas, np.array([False]))
    assert abs(oks[0, 0] - 1.0) < 1e-9
    assert oks[1, 0] < 1e-4

    # OKS is keyed on the SEGMENT area: a smaller area must shrink the
    # similarity of an imperfect prediction (pycocotools uses gt['area'],
    # not the enclosing-box area).
    near = gt_kp[0:1] + [3.0, 3.0, 0.0]
    oks_big = oks_matrix(near, gt_kp, np.array([10000.0]), np.array([False]))
    oks_small = oks_matrix(near, gt_kp, np.array([2500.0]), np.array([False]))
    assert oks_small[0, 0] < oks_big[0, 0]


def test_keypoint_coco_ap():
    from detectron2_tensorflow_tpu.evaluation import CocoEvaluator

    ev = CocoEvaluator(1, "keypoints")
    gt_kp = np.zeros((1, 17, 3))
    gt_kp[0, :, 0] = np.linspace(10, 90, 17)
    gt_kp[0, :, 1] = 50
    gt_kp[0, :, 2] = 2
    gt = {
        "boxes": np.array([[0.0, 0.0, 100.0, 100.0]]),
        "classes": np.array([0]),
        "is_crowd": np.array([False]),
        "keypoints": gt_kp,
    }
    det = {
        "boxes": gt["boxes"],
        "scores": np.array([0.9]),
        "classes": np.array([0]),
        "keypoints": gt_kp.copy(),
    }
    ev.add_image(gt, det)
    m = ev.evaluate()
    assert abs(m["AP"] - 100.0) < 1e-6
