import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.models import build_model

pytestmark = pytest.mark.slow  # full-detector jit compiles



def mask_rcnn_cfg():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml"
    )
    # Shrink everything for the 1-core CPU test host.
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    return cfg


@pytest.fixture(scope="module")
def rcnn():
    cfg = mask_rcnn_cfg()
    model = build_model(cfg)
    batch = {
        "image": jnp.full((2, 64, 96, 3), 100.0),
        "image_size": jnp.array([[64, 96], [60, 80]]),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return model, variables, batch


def _gt(batch):
    return {
        **batch,
        "gt_boxes": jnp.tile(
            jnp.array([[[8.0, 8.0, 40.0, 44.0], [50.0, 20.0, 90.0, 56.0]]]), (2, 1, 1)
        ),
        "gt_classes": jnp.array([[1, 3], [2, 0]]),
        "gt_valid": jnp.ones((2, 2), bool),
        "gt_masks": jnp.ones((2, 2, 28, 28), jnp.float32),
    }


def test_mask_rcnn_predict(rcnn):
    model, variables, batch = rcnn
    out = jax.jit(model.predict)(variables, batch)
    assert out.boxes.shape == (2, 8, 4)
    assert out.pred_masks.shape == (2, 8, 28, 28)
    assert bool(jnp.isfinite(out.boxes).all())
    # masks are probabilities
    assert float(out.pred_masks.min()) >= 0.0 and float(out.pred_masks.max()) <= 1.0
    # clipped to true image size for image 1 (60 x 80)
    b1 = np.asarray(out.boxes[1])
    assert b1[:, 2].max() <= 80 + 1e-3 and b1[:, 3].max() <= 60 + 1e-3


def test_mask_rcnn_losses_complete_and_finite(rcnn):
    model, variables, batch = rcnn
    total, (losses, _) = jax.jit(model.loss_fn)(
        variables, _gt(batch), jax.random.PRNGKey(1), {}
    )
    assert set(losses) == {
        "loss_cls",
        "loss_box_reg",
        "loss_mask",
        "loss_rpn_cls",
        "loss_rpn_loc",
    }
    assert np.isfinite(float(total))


def test_mask_rcnn_grads_flow_everywhere_trainable(rcnn):
    model, variables, batch = rcnn
    grads = jax.jit(
        jax.grad(
            lambda p: model.loss_fn(
                {**variables, "params": p}, _gt(batch), jax.random.PRNGKey(2), {}
            )[0]
        )
    )(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    zero_groups = set()
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        if not bool(jnp.any(g != 0)):
            zero_groups.add(name.split("'")[1])
    # Only frozen stages may have all-zero grads.
    assert zero_groups <= {"backbone"}, zero_groups


def test_proposal_network_meta_arch():
    cfg = mask_rcnn_cfg()
    cfg.MODEL.META_ARCHITECTURE = "ProposalNetwork"
    model = build_model(cfg)
    batch = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "image_size": jnp.array([[64, 64]]),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = jax.jit(model.predict)(variables, batch)
    assert out.boxes.shape[2] == 4
