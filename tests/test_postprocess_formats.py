"""MODEL.SEGMENTATION_OUTPUT formats (reference postprocessing.py:9-100)."""

import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.models.meta_arch.postprocess import (
    detector_postprocess,
    sem_seg_postprocess,
)
from detectron2_tensorflow_tpu.structures import Instances


def _dets():
    masks = np.zeros((1, 2, 28, 28), np.float32)
    masks[0, 0] = 1.0  # full-box mask
    masks[0, 1, :14] = 1.0  # top half
    boxes = np.array([[[8.0, 8.0, 24.0, 24.0], [0.0, 0.0, 32.0, 16.0]]], np.float32)
    return Instances(
        boxes=jnp.asarray(boxes),
        scores=jnp.asarray([[0.9, 0.8]]),
        pred_classes=jnp.asarray([[1, 2]]),
        is_valid=jnp.asarray([[True, True]]),
        pred_masks=jnp.asarray(masks),
    )


def _batch(h=64, w=64, th=32, tw=32):
    return {
        "image": jnp.zeros((1, h, w, 3), jnp.float32),
        "image_size": jnp.asarray([[th, tw]], jnp.int32),
    }


def test_raw_format_binarizes_at_head_resolution():
    cfg = get_cfg()
    cfg.MODEL.SEGMENTATION_OUTPUT.FORMAT = "raw"
    out = detector_postprocess(cfg, _dets(), _batch())
    assert out.pred_masks.shape == (1, 2, 28, 28)
    assert out.pred_masks.dtype == jnp.uint8
    assert int(out.pred_masks[0, 0].sum()) == 28 * 28


def test_conventional_format_pastes_at_input_resolution():
    cfg = get_cfg()
    cfg.MODEL.SEGMENTATION_OUTPUT.FORMAT = "conventional"
    out = detector_postprocess(cfg, _dets(), _batch())
    m = np.asarray(out.pred_masks)
    assert m.shape == (1, 2, 64, 64)
    # full-box mask covers ~the box [8, 24)^2 and nothing far outside
    assert m[0, 0, 10:22, 10:22].all()
    assert m[0, 0, 30:, 30:].sum() == 0


def test_fixed_format_rescales_boxes_to_canvas():
    cfg = get_cfg()
    cfg.MODEL.SEGMENTATION_OUTPUT.FORMAT = "fixed"
    cfg.MODEL.SEGMENTATION_OUTPUT.FIXED_RESOLUTION = 128
    # true image is 32x32 -> boxes scale by 4 into the 128-canvas
    out = detector_postprocess(cfg, _dets(), _batch(th=32, tw=32))
    m = np.asarray(out.pred_masks)
    assert m.shape == (1, 2, 128, 128)
    # box [8, 24) * 4 = [32, 96): interior fully covered
    assert m[0, 0, 40:88, 40:88].all()
    assert m[0, 0, :24].sum() == 0


def test_sem_seg_postprocess_zeroes_padding_and_fixed_resizes():
    cfg = get_cfg()
    sem = np.full((1, 8, 8), 3, np.int32)
    batch = {
        "image": jnp.zeros((1, 8, 8, 3)),
        "image_size": jnp.asarray([[4, 8]], jnp.int32),
    }
    cfg.MODEL.SEGMENTATION_OUTPUT.FORMAT = "conventional"
    out = np.asarray(sem_seg_postprocess(cfg, jnp.asarray(sem), batch))
    assert (out[0, :4] == 3).all() and (out[0, 4:] == 0).all()

    cfg.MODEL.SEGMENTATION_OUTPUT.FORMAT = "fixed"
    cfg.MODEL.SEGMENTATION_OUTPUT.FIXED_RESOLUTION = 16
    out = np.asarray(sem_seg_postprocess(cfg, jnp.asarray(sem), batch))
    # the CONTENT region (all 3s) fills the whole fixed canvas
    assert out.shape == (1, 16, 16)
    assert (out == 3).all()


def test_serving_postprocess_sem_seg_outputs():
    from detectron2_tensorflow_tpu.export.export import serving_postprocess

    sem = np.zeros((1, 16, 16), np.int32)
    sem[0, :8] = 2  # class 2 covers half the image
    det = Instances(
        boxes=jnp.zeros((1, 3, 4)),
        scores=jnp.zeros((1, 3)),
        pred_classes=jnp.zeros((1, 3), jnp.int32),
        is_valid=jnp.zeros((1, 3), bool),
        sem_seg=jnp.asarray(sem),
    )
    out = serving_postprocess(det, jnp.asarray([16, 16]), num_sem_classes=4)
    classes = np.asarray(out["sem_seg_classes"][0])
    areas = np.asarray(out["sem_seg_areas"][0])
    assert classes[0] == 0 and classes[2] == 2  # classes 0 and 2 visible
    assert classes[1] == -1 and classes[3] == -1
    assert abs(areas[2] - 0.5) < 1e-6
