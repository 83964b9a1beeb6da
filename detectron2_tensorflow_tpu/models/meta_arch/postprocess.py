"""Inference output formats (MODEL.SEGMENTATION_OUTPUT).

Implements the reference's detector_postprocess / sem_seg_postprocess
(/root/reference/lib/modeling/postprocessing.py:9-100, consumed at
rcnn.py:124-133) as jit-friendly static-shape transforms:

  * ``raw``          — masks stay at the head resolution (28x28),
                       binarized to uint8.
  * ``fixed``        — masks pasted into a fixed square canvas
                       (SEGMENTATION_OUTPUT.FIXED_RESOLUTION); boxes are
                       rescaled per image by output/true-image-shape so the
                       canvas is resolution-independent.
  * ``conventional`` — masks pasted at their true box coordinates into the
                       network-input-shaped canvas.

The in-repo eval loop deliberately keeps the ``raw`` device output and
pastes on the host (paste once per kept detection, at original resolution)
— these formats are the SERVING contract, applied by the exporter and by
``DetectorModel.predict`` callers that ask for postprocessed output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...structures.masks import paste_masks_in_image


def detector_postprocess(cfg, detections, batch, mask_threshold: float = 0.5):
    """Apply MODEL.SEGMENTATION_OUTPUT.FORMAT to ``detections.pred_masks``.

    ``detections``: Instances with boxes [B, N, 4] (network-input coords)
    and soft pred_masks [B, N, m, m]. Returns detections with pred_masks
    replaced per the format (uint8 binary in every case).
    """
    if "pred_masks" not in detections:
        return detections
    fmt = cfg.MODEL.SEGMENTATION_OUTPUT.FORMAT
    masks = detections.pred_masks
    boxes = detections.boxes

    if fmt == "raw":
        return detections.replace(
            pred_masks=(masks > mask_threshold).astype(jnp.uint8)
        )

    # SOLOv2 emits WHOLE-FRAME masks at the mask-feature stride
    # (single_stage/solov2.py), not box crops — box-pasting them would
    # shrink the frame into each box. Its image-space formats are plain
    # upsamples of the frame (content region for "fixed").
    if (cfg.MODEL.META_ARCHITECTURE == "SingleStageDetector"
            and cfg.MODEL.SINGLE_STAGE_HEAD.NAME == "SOLOv2Head"):
        h, w = batch["image"].shape[1:3]
        b, n = masks.shape[:2]
        if fmt == "conventional":
            up = jax.image.resize(
                masks.astype(jnp.float32), (b, n, h, w), "bilinear"
            )
            return detections.replace(
                pred_masks=(up > mask_threshold).astype(jnp.uint8)
            )
        if fmt == "fixed":
            # Sample the content region [0:rh, 0:rw] of the frame at r x r
            # uniform points (bilinear, per-image dynamic extent).
            r = cfg.MODEL.SEGMENTATION_OUTPUT.FIXED_RESOLUTION
            mh, mw = masks.shape[2:]
            sy = batch["image_size"][:, 0].astype(jnp.float32) * (mh / h)
            sx = batch["image_size"][:, 1].astype(jnp.float32) * (mw / w)

            def sample(frame, ch, cw):
                ys = (jnp.arange(r) + 0.5) * ch / r - 0.5
                xs = (jnp.arange(r) + 0.5) * cw / r - 0.5
                yy = jnp.broadcast_to(ys[:, None], (r, r))
                xx = jnp.broadcast_to(xs[None, :], (r, r))
                coords = jnp.stack([yy, xx])
                return jax.vmap(
                    lambda m: jax.scipy.ndimage.map_coordinates(
                        m.astype(jnp.float32), coords, order=1, mode="nearest"
                    )
                )(frame)

            up = jax.vmap(sample)(masks, sy, sx)
            return detections.replace(
                pred_masks=(up > mask_threshold).astype(jnp.uint8)
            )

    if fmt == "conventional":
        h, w = batch["image"].shape[1:3]
        pasted = jax.vmap(
            lambda m, b: paste_masks_in_image(m, b, (h, w), mask_threshold)
        )(masks, boxes)
        return detections.replace(pred_masks=pasted.astype(jnp.uint8))

    if fmt == "fixed":
        r = cfg.MODEL.SEGMENTATION_OUTPUT.FIXED_RESOLUTION
        # Rescale boxes by output/true-image-shape per image (reference
        # postprocessing.py:37-45), then paste into the fixed canvas.
        sizes = batch["image_size"].astype(jnp.float32)  # [B, 2] (h, w)
        scale = r / sizes  # [B, 2]
        sc = jnp.stack(
            [scale[:, 1], scale[:, 0], scale[:, 1], scale[:, 0]], axis=-1
        )  # [B, 4] x-y-x-y
        scaled = boxes * sc[:, None, :]
        pasted = jax.vmap(
            lambda m, b: paste_masks_in_image(m, b, (r, r), mask_threshold)
        )(masks, scaled)
        return detections.replace(pred_masks=pasted.astype(jnp.uint8))

    raise ValueError(f"unknown SEGMENTATION_OUTPUT.FORMAT '{fmt}'")


def sem_seg_postprocess(cfg, sem_seg, batch):
    """Format the semantic map per SEGMENTATION_OUTPUT.FORMAT (reference
    postprocessing.py:62-100): ``fixed`` resizes the content region to the
    fixed square; ``raw``/``conventional`` keep the network-input canvas
    (padding region zeroed).

    ``sem_seg``: [B, H, W] int class map at network-input resolution.
    """
    fmt = cfg.MODEL.SEGMENTATION_OUTPUT.FORMAT
    h, w = sem_seg.shape[1:3]
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    sizes = batch["image_size"]
    content = (ys < sizes[:, 0, None, None]) & (xs < sizes[:, 1, None, None])
    sem_seg = jnp.where(content, sem_seg, 0)
    if fmt != "fixed":
        return sem_seg
    r = cfg.MODEL.SEGMENTATION_OUTPUT.FIXED_RESOLUTION
    # Nearest-neighbor resize of each image's CONTENT region to [r, r]:
    # index map scaled by true size (static shapes; per-image gather).
    def one(seg, size):
        sy = size[0].astype(jnp.float32) / r
        sx = size[1].astype(jnp.float32) / r
        iy = jnp.clip((jnp.arange(r) + 0.5) * sy, 0, h - 1).astype(jnp.int32)
        ix = jnp.clip((jnp.arange(r) + 0.5) * sx, 0, w - 1).astype(jnp.int32)
        return seg[iy][:, ix]

    return jax.vmap(one)(sem_seg, sizes)
