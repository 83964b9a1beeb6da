"""Shared meta-architecture plumbing: preprocessing and the model wrapper API.

Every meta-architecture is exposed as a :class:`DetectorModel`: a thin pure-
functional wrapper pairing a flax trunk module with loss/inference drivers.
The wrapper's three entry points (``init`` / ``loss_fn`` / ``predict``) are
what the engine jits — the reference's global training-phase flag
(lib/utils/tf_utils.py:5-16) dissolves into explicit methods.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def preprocess_images(images: jnp.ndarray, pixel_mean, pixel_std, input_format: str,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Normalize raw [B, H, W, 3] RGB images, then flip to BGR if the weights
    expect it (reference rcnn.py:146-157 order: normalize, then flip)."""
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    images = (images.astype(jnp.float32) - mean) / std
    if input_format == "BGR":
        images = images[..., ::-1]
    return images.astype(dtype)


class StatsTape:
    """Accumulates BatchNorm running-stat updates across apply calls.

    Training applies touch different submodules; each may emit
    ``batch_stats`` updates. The tape merges them; the train step folds the
    result back into the model state (TrainState.model_state).
    """

    def __init__(self, variables):
        self.track = "batch_stats" in variables
        self.updates: Dict = {}

    def apply(self, module, variables, *args, **kwargs):
        if not self.track or not kwargs.get("train", False):
            return module.apply(variables, *args, **kwargs)
        out, new = module.apply(
            variables, *args, mutable=["batch_stats"], **kwargs
        )
        _deep_update(self.updates, dict(new.get("batch_stats", {})))
        return out

    def state(self) -> Dict:
        return {"batch_stats_updates": self.updates} if self.updates else {}


def _deep_update(dst: Dict, src: Dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


class DetectorModel:
    """(module, drivers) bundle with a uniform functional API.

    * ``init(rng, batch)`` -> variables
    * ``loss_fn(variables, batch, rng, state)`` -> (total_loss, (loss_dict, new_state))
    * ``predict(variables, batch)`` -> batched Instances (+ optional extras)

    ``batch``: dict with "image" [B, H, W, 3] raw pixels, "image_size" [B, 2]
    true (h, w), and gt_* fields during training. ``state``: auxiliary
    training state (e.g. RetinaNet's EMA loss normalizer) threaded
    functionally.
    """

    def __init__(self, module, init_fn, loss_fn, predict_fn, initial_state=None,
                 predict_with_boxes=None):
        self.module = module
        self._init = init_fn
        self.loss_fn = loss_fn
        self.predict = predict_fn
        # Optional: inference on GIVEN boxes (the reference's
        # detected_instances path, rcnn.py:93-122) — recompute per-ROI
        # outputs (masks/keypoints) for externally supplied detections.
        self.predict_with_boxes = predict_with_boxes
        self.initial_state = initial_state if initial_state is not None else {}

    def init(self, rng, batch):
        return self._init(rng, batch)
