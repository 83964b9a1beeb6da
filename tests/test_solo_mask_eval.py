"""SOLOv2 mask evaluation regression: full-frame masks must NOT be pasted.

SOLOv2 inference emits whole-frame masks at the mask-feature stride
(models/single_stage/solov2.py), unlike R-CNN's box-cropped 28x28 masks.
The evaluator used to run both through box-paste, which squashes the whole
frame into each detection box and zeroes SOLOv2's mask AP. These tests pin
the correct routing with a stub model whose prediction exactly matches GT:
mask AP must be 100.
"""

import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.engine.evaluator import evaluate
from detectron2_tensorflow_tpu.evaluation.np_masks import (
    fullframe_masks_to_image,
    paste_masks,
)
from detectron2_tensorflow_tpu.structures import Instances

BOX = (8.0, 16.0, 40.0, 48.0)  # xyxy inside a 64x64 image


class _RectDataset:
    def __init__(self):
        mask = np.zeros((64, 64), np.float32)
        x0, y0, x1, y1 = map(int, BOX)
        mask[y0:y1, x0:x1] = 1
        self._sample = {
            "image": np.zeros((64, 64, 3), np.uint8),
            "image_id": 0,
            "boxes": np.array([BOX], np.float32),
            "classes": np.array([0], np.int32),
            "is_crowd": np.zeros(1, bool),
            "masks": mask[None],
        }
        self.images = [({"id": 0, "file_name": "0.jpg"}, [])]

    def __len__(self):
        return 1

    def __getitem__(self, i):
        return dict(self._sample)


class _StubSolo:
    """Predicts exactly the GT box + a full-frame stride-4 mask of it."""

    def predict(self, variables, batch):
        frame = np.zeros((16, 16), np.float32)  # 64/4
        x0, y0, x1, y1 = (int(v / 4) for v in BOX)
        frame[y0:y1, x0:x1] = 1
        return Instances(
            boxes=jnp.asarray([[BOX]], jnp.float32),
            scores=jnp.asarray([[0.9]]),
            pred_classes=jnp.asarray([[0]], jnp.int32),
            pred_masks=jnp.asarray(frame[None, None]),
            is_valid=jnp.asarray([[True]]),
        )


def _solo_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SingleStageDetector"
    cfg.MODEL.SINGLE_STAGE_HEAD.NAME = "SOLOv2Head"
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 3
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST = 64
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 4
    return cfg


def _batch():
    return {
        "image": jnp.zeros((1, 64, 64, 3)),
        "image_size": jnp.asarray([[64, 64]]),
        "image_id": jnp.asarray([0]),
    }


def test_solov2_mask_eval_routes_fullframe():
    cfg = _solo_cfg()
    metrics = evaluate(cfg, _StubSolo(), {}, _RectDataset(), [_batch()])
    assert metrics["bbox/AP"] == 100.0, metrics
    assert metrics["segm/AP"] == 100.0, metrics


def test_detector_postprocess_fullframe_formats():
    from detectron2_tensorflow_tpu.models.meta_arch.postprocess import (
        detector_postprocess,
    )

    cfg = _solo_cfg()
    det = _StubSolo().predict({}, None)
    batch = _batch()

    cfg.MODEL.SEGMENTATION_OUTPUT.FORMAT = "conventional"
    out = detector_postprocess(cfg, det, batch)
    m = np.asarray(out.pred_masks[0, 0])
    assert m.shape == (64, 64)
    x0, y0, x1, y1 = map(int, BOX)
    assert m[(y0 + y1) // 2, (x0 + x1) // 2] == 1
    assert m[2, 2] == 0 and m[60, 60] == 0

    cfg = _solo_cfg()
    cfg.MODEL.SEGMENTATION_OUTPUT.FORMAT = "fixed"
    cfg.MODEL.SEGMENTATION_OUTPUT.FIXED_RESOLUTION = 32
    out = detector_postprocess(cfg, det, batch)
    m = np.asarray(out.pred_masks[0, 0])
    assert m.shape == (32, 32)
    # content == whole image here, so the box maps to half-scale coords
    assert m[16, 12] == 1 and m[2, 2] == 0


def test_fullframe_helper_matches_direct_upsample():
    frame = np.zeros((2, 16, 16), np.float32)
    frame[:, 4:12, 2:10] = 1
    out = fullframe_masks_to_image(frame, 64, 64, 64, 64, stride=4)
    assert out.shape == (2, 64, 64)
    # Interior of the region is solid; exterior is empty.
    assert out[0, 20:44, 12:36].all()
    assert not out[0, :12].any() and not out[0, :, 44:].any()
    # The old path (box paste of a full frame) would NOT reproduce GT.
    pasted = paste_masks(frame, np.array([[8, 16, 40, 48]] * 2, np.float32),
                         64, 64)
    gt = np.zeros((64, 64), bool)
    gt[16:48, 8:40] = True
    iou_paste = (pasted[0] & gt).sum() / max((pasted[0] | gt).sum(), 1)
    assert iou_paste < 0.5  # documents the failure the fix removes
