"""Serving export: jitted fixed-shape inference -> portable artifacts.

Replaces the reference's frozen-graph/SavedModel exporter (/root/reference/
lib/exporter/base.py:26-126, detection.py:16-82, postprocessing.py:10-201).
TPU-native equivalents:

  * the serving function is ONE jitted program at a static padded shape
    (raw uint8 RGB image in, named detection outputs out — same output
    contract as the reference's Detection exporter);
  * artifacts: an Orbax checkpoint of the variables, a StableHLO module
    (``jax.export``) runnable from any PJRT runtime, optionally a jax2tf
    SavedModel when tensorflow is importable, plus label_index.map and
    model_info.json exactly like the reference.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..structures import boxes as box_ops
from ..utils import Registry

EXPORTER_REGISTRY = Registry("EXPORTER")


def serving_postprocess(detections, image_size, label_offset: int = 1) -> Dict:
    """Normalize/sort outputs into the serving contract
    (reference exporter/postprocessing.py:10-201)."""
    boxes = box_ops.to_normalized(detections.boxes, image_size)
    valid = detections.is_valid
    out = {
        "num_detections": jnp.sum(valid.astype(jnp.int32), axis=-1),
        "detection_boxes": jnp.where(valid[..., None], boxes, 0.0),
        "detection_scores": jnp.where(valid, detections.scores, 0.0),
        "detection_classes": jnp.where(
            valid, detections.pred_classes + label_offset, 0
        ),
    }
    if "pred_masks" in detections:
        out["detection_masks"] = jnp.where(
            valid[..., None, None], detections.pred_masks, 0.0
        )
    return out


@EXPORTER_REGISTRY.register(name="Detection")
class DetectionExporter:
    """Single-image serving graph at a fixed (H, W) bucket."""

    def __init__(self, cfg):
        self.cfg = cfg

    def build_serving_fn(self, model, serving_size) -> Callable:
        cfg = self.cfg
        h, w = serving_size
        label_offset = cfg.SERVING_MODEL.LABEL_OFFSET

        def serve(variables, image_uint8, image_size):
            """image_uint8: [1, H, W, 3] raw RGB; image_size: [1, 2] true hw."""
            batch = {
                "image": image_uint8.astype(jnp.float32),
                "image_size": image_size,
            }
            detections = model.predict(variables, batch)
            return serving_postprocess(detections, image_size[0], label_offset)

        return serve

    def __call__(self, model, variables, output_dir: str,
                 serving_size=(800, 1344), class_names=None) -> Dict[str, str]:
        os.makedirs(output_dir, exist_ok=True)
        cfg = self.cfg
        h, w = serving_size
        serve = self.build_serving_fn(model, serving_size)
        example_image = jnp.zeros((1, h, w, 3), jnp.uint8)
        example_size = jnp.asarray([[h, w]], jnp.int32)

        artifacts = {}

        # 1) Orbax checkpoint of the variables.
        import orbax.checkpoint as ocp

        ckpt_path = os.path.join(os.path.abspath(output_dir), "checkpoint")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(ckpt_path, jax.device_get(variables), force=True)
        ckptr.wait_until_finished()
        artifacts["checkpoint"] = ckpt_path

        # 2) StableHLO module with the variables closed over (frozen-graph
        #    equivalent: one self-contained program).
        from jax import export as jax_export

        closed = jax.jit(lambda img, size: serve(variables, img, size))
        exported = jax_export.export(closed)(example_image, example_size)
        hlo_path = os.path.join(output_dir, "model.stablehlo")
        with open(hlo_path, "wb") as f:
            f.write(exported.serialize())
        artifacts["stablehlo"] = hlo_path

        # 3) Optional jax2tf SavedModel (serving parity with the reference).
        try:
            import tensorflow as tf
            from jax.experimental import jax2tf

            tf_fn = tf.function(
                jax2tf.convert(closed, with_gradient=False),
                input_signature=[
                    tf.TensorSpec((1, h, w, 3), tf.uint8, name="image"),
                    tf.TensorSpec((1, 2), tf.int32, name="image_size"),
                ],
                autograph=False,
            )
            tf_module = tf.Module()
            tf_module.serve = tf_fn
            sm_path = os.path.join(output_dir, "saved_model")
            tf.saved_model.save(
                tf_module, sm_path, signatures={"serving_default": tf_fn}
            )
            artifacts["saved_model"] = sm_path
        except Exception as e:  # noqa: BLE001 — export must not hard-require tf
            artifacts["saved_model_error"] = str(e)

        # 4) Label map + model info (reference base.py:74-99).
        if class_names:
            with open(os.path.join(output_dir, "label_index.map"), "w") as f:
                offset = cfg.SERVING_MODEL.LABEL_OFFSET
                for i, name in enumerate(class_names):
                    f.write(f"{i + offset}:{name}\n")
            artifacts["label_map"] = os.path.join(output_dir, "label_index.map")
        info = {
            "meta_architecture": cfg.MODEL.META_ARCHITECTURE,
            "serving_size": list(serving_size),
            "label_offset": cfg.SERVING_MODEL.LABEL_OFFSET,
            "input": "uint8 RGB [1, H, W, 3] + true (h, w) int32 [1, 2]",
            "outputs": [
                "num_detections", "detection_boxes (normalized xyxy)",
                "detection_scores", "detection_classes",
            ],
        }
        with open(os.path.join(output_dir, "model_info.json"), "w") as f:
            json.dump(info, f, indent=2)
        artifacts["model_info"] = os.path.join(output_dir, "model_info.json")
        return artifacts


def export(cfg, model, variables, output_dir, serving_size=(800, 1344),
           class_names=None):
    """Public entry: dispatch on SERVING_MODEL.TYPE (reference base.py:16-27)."""
    exporter_cls = EXPORTER_REGISTRY.get(cfg.SERVING_MODEL.TYPE)
    return exporter_cls(cfg)(model, variables, output_dir, serving_size, class_names)
