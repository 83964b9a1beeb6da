"""Checkpoint restore + pretrained initialization.

Replaces the reference trainer's init_fn machinery
(/root/reference/lib/engine/trainer.py:70-107: restore PRETRAINS weights
with name/shape-compatibility filtering) and its auto-resume
(trainer.py:191-197: MonitoredTrainingSession restores the latest
checkpoint in train_dir). Here:

  * ``load_pretrained`` dispatches on the PRETRAINS.* keys to the foreign
    converters (Detectron2 pickle / caffe2 backbone / mmdet / darknet) or an
    Orbax variables checkpoint, overlaying leaves that exist in the model
    with matching shapes and WARNING on (rather than raising for) the rest —
    the fine-tune contract where heads are re-initialized.
  * ``restore_variables`` loads an Orbax checkpoint (either a plain
    variables tree from convert_weights.py/export, or a training-loop
    checkpoint holding {params, model_state, ...}).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def overlay_compatible(variables: Dict, restored: Dict) -> Dict:
    """Overlay ``restored`` leaves onto ``variables`` wherever the name path
    exists with a matching shape; log a warning for every skipped leaf
    (reference trainer.py:86-101 shape-filtered Saver)."""

    def merge(dst, src, path):
        out = dict(dst)
        for k, v in src.items():
            p = f"{path}/{k}"
            if isinstance(v, dict):
                if not isinstance(dst.get(k), dict):
                    logger.warning("pretrained subtree %s not in model — skipped", p)
                    continue
                out[k] = merge(dst[k], v, p)
            else:
                if k not in dst or isinstance(dst[k], dict):
                    logger.warning("pretrained leaf %s not in model — skipped", p)
                    continue
                if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    logger.warning(
                        "pretrained leaf %s has shape %s, model wants %s — skipped",
                        p, tuple(np.shape(v)), tuple(np.shape(dst[k])),
                    )
                    continue
                out[k] = jnp.asarray(v, dst[k].dtype)
        return out

    out = dict(variables)
    for coll, sub in restored.items():
        if coll not in variables:
            logger.warning("pretrained collection %s not in model — skipped", coll)
            continue
        out[coll] = merge(variables[coll], sub, coll)
    return out


def restore_variables(path: str, variables: Optional[Dict] = None) -> Dict:
    """Restore an Orbax checkpoint directory into a variables tree.

    Accepts both layouts: a training-loop checkpoint ({params, model_state,
    opt_state, aux, step} — the optimizer state is dropped) and a plain
    variables tree ({params, frozen, batch_stats, ...}).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # CheckpointManager step dirs nest the pytree under the 'default' item.
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")
    restored = ocp.StandardCheckpointer().restore(path)
    if "params" in restored and "model_state" in restored:
        restored = {"params": restored["params"], **restored["model_state"]}
    if variables is None:
        return restored
    return overlay_compatible(variables, restored)


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Path of the newest Orbax step directory under ``checkpoint_dir``
    (the reference's tf.train.latest_checkpoint)."""
    step = latest_step(checkpoint_dir)
    if step is None:
        return None
    return os.path.join(os.path.abspath(checkpoint_dir), str(step))

def latest_step(checkpoint_dir: str) -> Optional[int]:
    if not os.path.isdir(checkpoint_dir):
        return None
    steps = [
        int(d) for d in os.listdir(checkpoint_dir)
        if d.isdigit() and os.path.isdir(os.path.join(checkpoint_dir, d))
    ]
    return max(steps) if steps else None


def load_pretrained(cfg, model, variables: Dict) -> Dict:
    """Initialize ``variables`` from the configured PRETRAINS source
    (reference trainer.py:70-107). Returns the (possibly updated) tree.

    Precedence mirrors convert_weights.py: an already-converted Orbax
    checkpoint (PRETRAINS.WEIGHTS) wins; otherwise the foreign-format keys
    each route to their converter.
    """
    root = cfg.PRETRAINS.ROOT

    def missing(path):
        # Reference YAMLs ship PRETRAINS paths for *their* checkout; a
        # missing file downgrades to training from scratch with a warning
        # rather than crashing (matches the reference's optional init_fn).
        if not os.path.exists(path):
            logger.warning("PRETRAINS source %s not found — skipped", path)
            return True
        return False

    if cfg.PRETRAINS.WEIGHTS:
        path = os.path.join(root, cfg.PRETRAINS.WEIGHTS)
        if not missing(path):
            logger.info("initializing from Orbax checkpoint %s", path)
            return restore_variables(path, variables)

    if cfg.PRETRAINS.DETECTRON2:
        from ..convert.d2 import convert_d2_weights, load_state_dict

        path = os.path.join(root, cfg.PRETRAINS.DETECTRON2)
        if missing(path):
            return variables
        logger.info("initializing from Detectron2 checkpoint %s", path)
        sd = load_state_dict(path)
        converted, leftovers = convert_d2_weights(sd, cfg)
        if leftovers:
            logger.warning("unconverted checkpoint keys: %s", leftovers)
        if cfg.PRETRAINS.ONLY_BACKBONE:
            converted = _backbone_only(converted)
        return overlay_compatible(variables, converted)

    if cfg.PRETRAINS.BACKBONE:
        path = os.path.join(root, cfg.PRETRAINS.BACKBONE)
        if missing(path):
            return variables
        logger.info("initializing backbone from %s", path)
        if path.endswith(".pkl"):
            from ..convert.backbone import (
                convert_caffe2_backbone,
                load_caffe2_pickle,
            )

            converted, leftovers = convert_caffe2_backbone(load_caffe2_pickle(path))
        else:
            from ..convert.d2 import load_state_dict
            from ..convert.torchvision import convert_torchvision_backbone

            converted, leftovers = convert_torchvision_backbone(load_state_dict(path))
        if leftovers:
            logger.warning("unconverted backbone blobs: %s", leftovers)
        return overlay_compatible(variables, converted)

    if cfg.PRETRAINS.MMDET:
        from ..convert.d2 import load_state_dict
        from ..convert.solo import convert_solo_weights

        path = os.path.join(root, cfg.PRETRAINS.MMDET)
        if missing(path):
            return variables
        logger.info("initializing from mmdet checkpoint %s", path)
        converted, leftovers = convert_solo_weights(load_state_dict(path), cfg)
        if leftovers:
            logger.warning("unconverted mmdet keys: %s", leftovers)
        return overlay_compatible(variables, converted)

    if cfg.PRETRAINS.DARKNET:
        import json

        from ..convert.darknet import convert_darknet_weights, read_darknet_blob

        path = os.path.join(root, cfg.PRETRAINS.DARKNET)
        if missing(path):
            return variables
        logger.info("initializing from darknet weights %s", path)
        with open(path + ".json") as f:
            manifest = json.load(f)
        converted, _ = convert_darknet_weights(read_darknet_blob(path), manifest)
        return overlay_compatible(variables, converted)

    return variables


def _backbone_only(converted: Dict) -> Dict:
    """Keep only backbone subtrees (PRETRAINS.ONLY_BACKBONE — the reference
    filters restore names to the backbone scope, trainer.py:77-80)."""
    out = {}
    for coll, sub in converted.items():
        kept = {
            k: v for k, v in sub.items()
            if isinstance(v, dict) and k.startswith("backbone")
        }
        if kept:
            out[coll] = kept
    return out
