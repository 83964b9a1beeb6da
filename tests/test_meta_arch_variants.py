import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.models import build_model

pytestmark = pytest.mark.slow  # full-detector jit compiles



def _small_common(cfg):
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 50
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 5
    return cfg


def _batch(b=1, h=64, w=64, g=2, with_sem_seg=False):
    out = {
        "image": jnp.full((b, h, w, 3), 90.0),
        "image_size": jnp.tile(jnp.array([[h, w]]), (b, 1)),
        "gt_boxes": jnp.tile(
            jnp.array([[[4.0, 4.0, 30.0, 30.0], [30.0, 30.0, 60.0, 58.0]]]), (b, 1, 1)
        ),
        "gt_classes": jnp.tile(jnp.array([[1, 3]]), (b, 1)),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_masks": jnp.ones((b, g, 28, 28)),
    }
    if with_sem_seg:
        out["gt_sem_seg"] = jnp.zeros((b, h, w), jnp.int32)
    return out


def _run(cfg, with_sem_seg=False, mask_key="loss_mask"):
    model = build_model(cfg)
    batch = _batch(with_sem_seg=with_sem_seg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = jax.jit(model.predict)(variables, batch)
    total, (losses, _) = jax.jit(model.loss_fn)(
        variables, batch, jax.random.PRNGKey(1), {}
    )
    assert np.isfinite(float(total)), losses
    return out, losses


def test_mask_rcnn_c4():
    cfg = _small_common(get_cfg())
    cfg.merge_from_file(
        "/root/reference/configs/COCO-InstanceSegmentation/mask_rcnn_R_50_C4_1x.yaml"
    )
    _small_common(cfg)
    out, losses = _run(cfg)
    assert "loss_mask" in losses and "loss_cls" in losses
    # C4 mask head: pool 14 -> res5 (/2) 7 -> deconv (x2) 14
    assert out.pred_masks.shape[-1] == 14
    assert out.boxes.shape == (1, 5, 4)


def test_faster_rcnn_dc5():
    cfg = _small_common(get_cfg())
    cfg.merge_from_file(
        "/root/reference/configs/COCO-Detection/faster_rcnn_R_50_DC5_1x.yaml"
    )
    _small_common(cfg)
    out, losses = _run(cfg)
    assert "loss_mask" not in losses
    assert out.boxes.shape == (1, 5, 4)


def test_cascade_mask_rcnn():
    cfg = _small_common(get_cfg())
    cfg.merge_from_file(
        "/root/reference/configs/Misc/cascade_mask_rcnn_R_50_FPN_1x.yaml"
    )
    _small_common(cfg)
    out, losses = _run(cfg)
    for k in range(3):
        assert f"loss_cls_stage{k}" in losses
        assert f"loss_box_reg_stage{k}" in losses
    assert "loss_mask" in losses
    assert out.boxes.shape == (1, 5, 4)


def test_semantic_segmentor():
    cfg = _small_common(get_cfg())
    cfg.merge_from_file(
        "/root/reference/configs/COCO-PanopticSegmentation/Base-Panoptic-FPN.yaml"
    )
    _small_common(cfg)
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 6
    out, losses = _run(cfg, with_sem_seg=True)
    assert set(losses) == {"loss_sem_seg"}
    assert out.sem_seg.shape == (1, 64, 64)
    assert int(out.sem_seg.max()) < 6


def test_panoptic_fpn_with_fusion():
    from detectron2_tensorflow_tpu.models.meta_arch.rcnn import panoptic_fusion

    cfg = _small_common(get_cfg())
    cfg.merge_from_file(
        "/root/reference/configs/COCO-PanopticSegmentation/Base-Panoptic-FPN.yaml"
    )
    _small_common(cfg)
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 6
    model = build_model(cfg)
    batch = _batch(with_sem_seg=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    total, (losses, _) = jax.jit(model.loss_fn)(
        variables, batch, jax.random.PRNGKey(1), {}
    )
    assert "loss_sem_seg" in losses and "loss_mask" in losses
    out = jax.jit(model.predict)(variables, batch)
    assert "sem_seg" in out and "pred_masks" in out
    pan_map, info = jax.jit(lambda o: panoptic_fusion(cfg, o))(out)
    assert pan_map.shape == (1, 64, 64)
    assert info["category_id"].shape[0] == 1


def test_relation_rcnn_with_learned_duplicate_removal():
    """RelationROIHeads + DUPLICATE_REMOVAL_ON: NMS-free inference (score =
    cls score * sigmoid(keep logit)) and the one-positive-per-GT BCE loss.
    Consumes the reference's orphan DUPLICATE_REMOVAL_IOU /
    RANK_EMBEDDING_DIM / NMS_NUM_GROUP keys."""
    cfg = _small_common(get_cfg())
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_HEADS.NAME = "RelationROIHeads"
    cfg.MODEL.ROI_BOX_RELATION_HEAD.DUPLICATE_REMOVAL_ON = True
    cfg.MODEL.ROI_BOX_RELATION_HEAD.NUM_GROUPS = 4
    cfg.MODEL.ROI_BOX_RELATION_HEAD.NMS_NUM_GROUP = 4
    cfg.MODEL.ROI_BOX_RELATION_HEAD.KEY_DIM = 16
    cfg.MODEL.ROI_BOX_RELATION_HEAD.RANK_EMBEDDING_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    out, losses = _run(cfg)
    assert "loss_dup" in losses and np.isfinite(float(losses["loss_dup"]))
    assert out.boxes.shape == (1, 5, 4)
    # Valid detections carry positive multiplied scores and real classes.
    v = np.asarray(out.is_valid[0])
    assert (np.asarray(out.scores[0])[v] > 0).all()
    assert (np.asarray(out.pred_classes[0])[~v] == -1).all()
