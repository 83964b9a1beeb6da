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

Not exported: test-time augmentation. TTA (engine/tta.py) is a per-image
host-side loop over scales/flips — upstream D2 semantics — and has no
batched fixed-shape serving form; export the plain predict signature and
apply TTA in the client if needed.
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


def serving_postprocess(detections, image_size, label_offset: int = 1,
                        num_sem_classes: int = 0,
                        stuff_area_limit: float = 0.001) -> Dict:
    """Normalize/sort outputs into the serving contract
    (reference exporter/postprocessing.py:10-201). Mask tensors should
    already carry the configured SEGMENTATION_OUTPUT format (the exporter
    applies detector_postprocess/sem_seg_postprocess before this)."""
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
            valid[..., None, None], detections.pred_masks, 0
        )
    if "sem_seg" in detections and num_sem_classes > 0:
        # Semantic-seg serving outputs (reference postprocessing.py:110-160):
        # the class map itself plus, per image, the classes whose area
        # fraction exceeds the limit and those fractions. Class-NAME strings
        # and PNG encoding live in the SavedModel wrapper (string dtypes).
        sem = detections.sem_seg
        onehot = jax.nn.one_hot(sem, num_sem_classes)
        areas = onehot.mean(axis=(1, 2))  # [B, C] area fractions
        show = areas > stuff_area_limit
        out["sem_seg"] = sem.astype(jnp.int32)
        out["sem_seg_classes"] = jnp.where(
            show, jnp.arange(num_sem_classes)[None, :], -1
        )
        out["sem_seg_areas"] = jnp.where(show, areas, 0.0)
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
        has_sem_seg = cfg.MODEL.META_ARCHITECTURE in (
            "PanopticFPN", "SemanticSegmentor"
        )
        num_sem = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES if has_sem_seg else 0

        def serve(variables, image_uint8, image_size):
            """image_uint8: [1, H, W, 3] raw RGB; image_size: [1, 2] true hw."""
            from ..models.meta_arch.postprocess import (
                detector_postprocess,
                sem_seg_postprocess,
            )

            batch = {
                "image": image_uint8.astype(jnp.float32),
                "image_size": image_size,
            }
            detections = model.predict(variables, batch)
            # Emit masks per MODEL.SEGMENTATION_OUTPUT.FORMAT (reference
            # rcnn.py:124-133 applies this inside the serving graph).
            detections = detector_postprocess(cfg, detections, batch)
            if "sem_seg" in detections:
                detections = detections.replace(
                    sem_seg=sem_seg_postprocess(cfg, detections.sem_seg, batch)
                )
            return serving_postprocess(
                detections, image_size[0], label_offset, num_sem
            )

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
        # SERVING_MODEL.FROZEN_GRAPH_FILE_NAME names the self-contained
        # program artifact (reference base.py:77 wrote the frozen .pb under
        # it); the TF1 default gets a .stablehlo extension here.
        hlo_name = cfg.SERVING_MODEL.FROZEN_GRAPH_FILE_NAME or "model.stablehlo"
        if hlo_name.endswith(".pb"):
            hlo_name = hlo_name[:-3] + ".stablehlo"
        hlo_path = os.path.join(output_dir, hlo_name)
        with open(hlo_path, "wb") as f:
            f.write(exported.serialize())
        artifacts["stablehlo"] = hlo_path

        # 3) Optional jax2tf SavedModel (serving parity with the reference).
        #    Two signatures: raw image tensor, and the reference's
        #    encoded-image-string entry with in-graph decode + shortest-edge
        #    resize + pad (exporter/placeholder.py:9-82). Sem-seg maps are
        #    additionally PNG-encoded with class names attached
        #    (exporter/postprocessing.py:110-160).
        try:
            import tensorflow as tf
            from jax.experimental import jax2tf

            core = jax2tf.convert(closed, with_gradient=False)
            tf_fn = tf.function(
                core,
                input_signature=[
                    tf.TensorSpec((1, h, w, 3), tf.uint8, name="image"),
                    tf.TensorSpec((1, 2), tf.int32, name="image_size"),
                ],
                autograph=False,
            )

            min_dim = cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST
            max_dim = cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST
            sem_names = class_names if class_names else []

            def serve_encoded(encoded_image):
                """[] tf.string JPEG/PNG bytes -> detections (in-graph
                decode + resize-shortest-edge + pad to the serving bucket)."""
                img = tf.image.decode_image(encoded_image, channels=3)
                img.set_shape([None, None, 3])
                shape = tf.shape(img)[:2]
                short = tf.cast(tf.reduce_min(shape), tf.float32)
                long_ = tf.cast(tf.reduce_max(shape), tf.float32)
                scale = tf.minimum(min_dim / short, max_dim / long_)
                nh = tf.cast(tf.cast(shape[0], tf.float32) * scale, tf.int32)
                nw = tf.cast(tf.cast(shape[1], tf.float32) * scale, tf.int32)
                nh = tf.minimum(nh, h)
                nw = tf.minimum(nw, w)
                resized = tf.image.resize(img, (nh, nw), antialias=True)
                padded = tf.image.pad_to_bounding_box(resized, 0, 0, h, w)
                out = core(
                    tf.cast(padded, tf.uint8)[None],
                    tf.stack([nh, nw])[None],
                )
                if "sem_seg" in out:
                    sem = tf.cast(out["sem_seg"][0], tf.uint8)
                    out["sem_seg_png"] = tf.io.encode_png(sem[..., None])
                    if sem_names:
                        table = tf.constant(list(sem_names), tf.string)
                        ids = tf.maximum(out["sem_seg_classes"][0], 0)
                        names = tf.gather(table, tf.minimum(ids, len(sem_names) - 1))
                        valid = out["sem_seg_classes"][0] >= 0
                        out["sem_seg_class_names"] = tf.where(
                            valid, names, tf.fill(tf.shape(names), "")
                        )
                return out

            tf_enc = tf.function(
                serve_encoded,
                input_signature=[tf.TensorSpec([], tf.string, name="encoded_image")],
                autograph=False,
            )

            # Batched encoded-images signature (the reference defines
            # build_batched_input_placeholder at exporter/placeholder.py:9-44
            # but never wires it): per-element decode+resize+pad via map_fn
            # over the single-image entry; outputs stack along the batch.
            def _one(enc):
                out = serve_encoded(enc)
                return {
                    k: (v[0] if v.shape.rank and v.shape[0] == 1 else v)
                    for k, v in out.items()
                }

            one_cf = tf.function(_one, autograph=False).get_concrete_function(
                tf.TensorSpec([], tf.string)
            )
            out_sig = tf.nest.map_structure(
                lambda t: tf.TensorSpec(t.shape, t.dtype),
                one_cf.structured_outputs,
            )
            tf_enc_batch = tf.function(
                lambda encoded_images: tf.map_fn(
                    _one, encoded_images, fn_output_signature=out_sig
                ),
                input_signature=[
                    tf.TensorSpec([None], tf.string, name="encoded_images")
                ],
                autograph=False,
            )

            tf_module = tf.Module()
            tf_module.serve = tf_fn
            tf_module.serve_encoded = tf_enc
            tf_module.serve_encoded_batch = tf_enc_batch
            sm_path = os.path.join(output_dir, "saved_model")
            tf.saved_model.save(
                tf_module, sm_path,
                signatures={
                    "serving_default": tf_fn,
                    "serving_encoded_image": tf_enc,
                    "serving_encoded_images": tf_enc_batch,
                },
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
        prefix = cfg.SERVING_MODEL.INPUT_OUTPUT_TENSOR_PREFIX
        out_names = [
            "num_detections", "detection_boxes (normalized xyxy)",
            "detection_scores", "detection_classes",
        ]
        info = {
            "meta_architecture": cfg.MODEL.META_ARCHITECTURE,
            "serving_size": list(serving_size),
            "label_offset": cfg.SERVING_MODEL.LABEL_OFFSET,
            "input": "uint8 RGB [1, H, W, 3] + true (h, w) int32 [1, 2]",
            # reference base.py:97 records the tensor-name prefix so
            # serving clients can reconstruct the fully-qualified names.
            "input_output_tensor_prefix": prefix,
            "outputs": [
                (f"{prefix}/{n}" if prefix else n) for n in out_names
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
