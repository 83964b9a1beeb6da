"""Exporter end-to-end: Orbax + StableHLO + SavedModel with the raw and
encoded-image serving signatures (reference exporter/{base,detection,
placeholder,postprocessing}.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.export.export import export
from detectron2_tensorflow_tpu.models import build_model

pytestmark = pytest.mark.slow  # full-detector jit compiles


def _tiny_cfg():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml"
    )
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 5
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST = 64
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST = 96
    return cfg


def test_export_artifacts_and_serving_signatures(tmp_path):
    cfg = _tiny_cfg()
    model = build_model(cfg)
    batch = {
        "image": jnp.zeros((1, 64, 96, 3), jnp.float32),
        "image_size": jnp.asarray([[64, 96]], jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    arts = export(cfg, model, variables, str(tmp_path), serving_size=(64, 96),
                  class_names=["a", "b", "c"])
    assert os.path.isdir(arts["checkpoint"])
    assert os.path.isfile(arts["stablehlo"])
    assert os.path.isfile(arts["model_info"])
    assert os.path.isfile(arts["label_map"])

    # StableHLO round trip: deserialize and run.
    from jax import export as jax_export

    with open(arts["stablehlo"], "rb") as f:
        reloaded = jax_export.deserialize(f.read())
    img = np.random.default_rng(0).integers(0, 255, (1, 64, 96, 3), np.uint8)
    out = reloaded.call(jnp.asarray(img), jnp.asarray([[64, 96]], np.int32))
    assert "detection_boxes" in out and out["detection_boxes"].shape == (1, 5, 4)
    assert "detection_masks" in out
    # conventional (default) format: image-space binary masks
    assert out["detection_masks"].shape == (1, 5, 64, 96)

    # SavedModel with BOTH signatures, if tensorflow is importable.
    if "saved_model" not in arts:
        pytest.skip(f"SavedModel unavailable: {arts.get('saved_model_error')}")
    import tensorflow as tf

    sm = tf.saved_model.load(arts["saved_model"])
    raw = sm.serve(tf.constant(img), tf.constant([[64, 96]], tf.int32))
    assert raw["detection_scores"].shape == (1, 5)

    png = tf.io.encode_png(tf.constant(img[0])).numpy()
    enc = sm.serve_encoded(tf.constant(png))
    assert enc["detection_boxes"].shape == (1, 5, 4)
    # normalized boxes stay in [0, 1]
    b = enc["detection_boxes"].numpy()
    assert (b >= -1e-5).all() and (b <= 1 + 1e-5).all()

    # Batched encoded-images signature (reference placeholder.py:9-44 —
    # dead code there; wired here): outputs stack along the batch.
    enc2 = sm.serve_encoded_batch(tf.constant([png, png]))
    assert enc2["detection_boxes"].shape == (2, 5, 4)
    np.testing.assert_allclose(
        enc2["detection_boxes"].numpy()[0], b[0], atol=1e-6
    )
