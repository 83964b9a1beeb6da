"""End-to-end integration: synthetic data -> train steps -> eval loop.

The quick_schedules "instant test" idea from the reference (SURVEY §4) done
as a real harness: losses must be finite and decrease over a few steps, and
the eval loop must produce metrics end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.data import build_dataloader
from detectron2_tensorflow_tpu.engine import (
    build_train_step,
    create_train_state,
    evaluate,
)
from detectron2_tensorflow_tpu.models import build_model
from tests.test_data import SyntheticDataset, small_cfg

pytestmark = pytest.mark.slow  # full-detector jit compiles



def tiny_rcnn_cfg():
    cfg = small_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml"
    )
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TRAIN = (64,)
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN = 128
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST = 64
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST = 128
    cfg.TRANSFORM.RESIZE.MINI_MASK_SIZE = 28
    cfg.INPUT.PAD_BUCKETS = ((64, 128), (128, 64))
    cfg.INPUT.MAX_GT_INSTANCES = 8
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.SOLVER.BASE_LR = 0.002
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.AUTO_SCALE_LR_SCHEDULE = False
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.RESNETS.NORM = "GN"  # trainable-from-scratch norm
    return cfg


def test_train_steps_and_eval_loop():
    cfg = tiny_rcnn_cfg()
    ds = SyntheticDataset(n=8, num_classes=3)
    model = build_model(cfg)

    train_iter = build_dataloader(cfg, ds, training=True, seed=0)
    first = next(train_iter)
    first = {k: jnp.asarray(v) for k, v in first.items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), first)
    step = build_train_step(cfg, model, state.params)

    losses = []
    batch = first
    for i in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
        batch = {k: jnp.asarray(v) for k, v in next(train_iter).items()}
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.step) == 6
    # The optimizer must make progress: the average of the last two losses
    # is below the first loss (per-step noise makes strict monotonicity too
    # brittle for 6 steps on synthetic data).
    assert np.mean(losses[-2:]) < losses[0], losses

    # Eval loop end-to-end (metrics exist; random weights give ~0 AP).
    variables = {"params": state.params, **state.model_state}
    eval_iter = build_dataloader(cfg, ds, training=False, seed=0)
    eval_iter = ({k: jnp.asarray(v) for k, v in b.items()} for b in eval_iter)
    metrics = evaluate(cfg, model, variables, ds, eval_iter)
    assert "bbox/AP" in metrics and "segm/AP" in metrics
    assert np.isfinite(metrics["bbox/AP"])
